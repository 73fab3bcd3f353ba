"""ThreadSanitizer stress of the native loader's thread pool.

The production binding loads ``native/libdirloader.so`` into an
uninstrumented Python process, where TSAN cannot observe it — so this test
builds ``native/stress_main.cc`` + ``native/loader.cc`` as one fully
TSAN-instrumented executable and drives 32 decode threads over a generated
JPEG corpus, asserting (a) no data races reported and (b) byte-identical
output to the single-threaded run. Skips when the toolchain, libtsan, or
libjpeg headers are unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


@pytest.fixture(scope="module")
def tsan_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    out = str(tmp_path_factory.mktemp("tsan") / "stress")
    build = subprocess.run(
        ["g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
         os.path.join(NATIVE, "stress_main.cc"), os.path.join(NATIVE, "loader.cc"),
         "-o", out, "-ljpeg", "-lpthread"],
        capture_output=True, text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"TSAN build unavailable: {build.stderr[-500:]}")
    return out


@pytest.mark.slow
def test_threadpool_race_free_under_tsan(tsan_binary, tmp_path):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(96):  # mixed sizes exercise the DCT prescale branches
        h, w = rng.integers(40, 400, 2)
        img = rng.integers(0, 255, (int(h), int(w), 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(img).save(p, quality=80)
        paths.append(str(p))
    pathlist = tmp_path / "paths.txt"
    pathlist.write_text("\n".join(paths) + "\n")

    env = dict(os.environ)
    # fail fast and loudly on the first report; distinct exit code
    env["TSAN_OPTIONS"] = "halt_on_error=1 exitcode=66"
    proc = subprocess.run(
        [tsan_binary, str(pathlist), "64", "3"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout: {proc.stdout[-1000:]}\n"
        f"stderr: {proc.stderr[-3000:]}"
    )
    assert "stress OK" in proc.stdout

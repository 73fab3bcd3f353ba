"""Native C++ batch JPEG loader: build, decode correctness, fallbacks."""

import numpy as np
import pytest
from PIL import Image

from imbalanced_regression_tpu.data.native_loader import (
    _pil_decode,
    decode_resize_batch,
    get_lib,
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, size in enumerate([(300, 400), (224, 224), (600, 450), (50, 60)]):
        # structured content (gradients + low-frequency waves), photo-like —
        # iid noise would make any resize-kernel comparison meaningless
        yy, xx = np.mgrid[0 : size[0], 0 : size[1]].astype(np.float32)
        arr = np.stack([
            127 + 80 * np.sin(xx / 17 + i) + 40 * (yy / size[0]),
            127 + 80 * np.cos(yy / 23) - 40 * (xx / size[1]),
            127 + 60 * np.sin((xx + yy) / 31),
        ], axis=-1)
        arr = (arr + rng.normal(0, 4, arr.shape)).clip(0, 255).astype(np.uint8)
        p = str(tmp / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    # grayscale jpeg
    g = str(tmp / "gray.jpg")
    Image.fromarray((yy % 251).astype(np.uint8), mode="L").save(g)
    paths.append(g)
    # png → native rejects, PIL fallback
    png = str(tmp / "x.png")
    Image.fromarray((rng.random((80, 80, 3)) * 255).astype(np.uint8)).save(png)
    paths.append(png)
    return paths


def test_native_builds():
    assert get_lib() is not None, "native loader should build on this image (g++ + libjpeg)"


def test_decode_batch_close_to_pil(jpegs):
    out = decode_resize_batch(jpegs, 128)
    assert out.shape == (len(jpegs), 128, 128, 3) and out.dtype == np.uint8
    pil = np.stack([_pil_decode(p, 128) for p in jpegs])
    # decode-prescale + plain bilinear vs PIL's antialiased resize: images must
    # be structurally close (correlation), not bit-equal
    for a, b in zip(out, pil):
        af, bf = a.astype(np.float64).ravel(), b.astype(np.float64).ravel()
        corr = np.corrcoef(af, bf)[0, 1]
        assert corr > 0.8, corr


def test_empty_batch():
    assert decode_resize_batch([], 64).shape == (0, 64, 64, 3)


def test_threadpool_concurrency_deterministic(jpegs):
    """Exercise the native loader's thread pool well past the host's core
    count (VERDICT.md weak #6: only ever run on 1 core): 512 decodes across
    32 threads must produce byte-identical output to the single-threaded
    path, across repeated runs (work-stealing order must not leak into
    results)."""
    if get_lib() is None:
        pytest.skip("native loader unavailable")
    many = (jpegs * 100)[:512]
    ref = decode_resize_batch(many, 64, threads=1)
    for _ in range(3):
        out = decode_resize_batch(many, 64, threads=32)
        np.testing.assert_array_equal(out, ref)


def test_upscale_small_image(jpegs):
    small = [p for p in jpegs if p.endswith("3.jpg")]
    out = decode_resize_batch(small, 224)
    assert out.shape == (1, 224, 224, 3)
    assert out.std() > 0  # actually decoded, not zeroed

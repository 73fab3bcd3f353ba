"""Persistent compilation cache helper (utils/runtime.py)."""

import os
import subprocess
import sys

import pytest

from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_disabled_without_config(monkeypatch):
    monkeypatch.delenv("DIR_TPU_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache() is None


def test_cache_populates_and_is_reused(tmp_path):
    """Two fresh processes compile the same program; the second must hit the
    on-disk cache (observable via jax's cache logging)."""
    cache = str(tmp_path / "jc")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache\n"
        f"assert enable_compilation_cache({cache!r}) == {cache!r}\n"
        "import jax.numpy as jnp\n"
        "import logging; logging.basicConfig(level=logging.DEBUG)\n"
        "logging.getLogger('jax._src.compilation_cache').setLevel(logging.DEBUG)\n"
        "f = jax.jit(lambda x: jnp.tanh(x) @ x.T + 3)\n"
        "f(jnp.ones((32, 32))).block_until_ready()\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    for i in range(2):
        r = subprocess.run([sys.executable, "-c", code], env=env, cwd=_ROOT,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    entries = [e for e in os.listdir(cache) if not e.startswith(".")]
    assert entries, "cache directory should hold compiled executables"
    # second process logged a cache read (hit) rather than only writes
    assert "cache" in r.stderr.lower()


def test_host_memory_gb_reports_positive_rss():
    from imbalanced_regression_tpu.utils.logging_tools import host_memory_gb

    cur, peak = host_memory_gb()
    # a live python process holds tens of MB at minimum; peak >= current
    assert 0.005 < cur < 200
    assert peak >= cur * 0.5  # HWM can lag slightly across /proc reads
    assert peak < 200

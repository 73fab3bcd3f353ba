"""Bounded-memory input-path tests (data/streaming.py).

Covers the three image representations (ram / mmap / stream) for index
equality, the decoded-cache lifecycle, prefetch ordering + error propagation,
and — the VERDICT.md #3 deliverable — an end-to-end training run over a
20k-file JPEG corpus in a subprocess whose peak RSS is asserted to stay far
below the materialized corpus size (the reference instead streams through a
32-worker DataLoader, imdb-wiki-dir/train.py:128-133)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from imbalanced_regression_tpu.data.native_loader import decode_resize_batch
from imbalanced_regression_tpu.data.streaming import (
    LazyImageArray,
    build_mmap_cache,
    choose_data_mode,
    corpus_signature,
    prefetch_batches,
)


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(24):
        img = rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        p = str(root / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_lazy_matches_eager(small_corpus):
    lazy = LazyImageArray(small_corpus, img_size=16, threads=2)
    eager = decode_resize_batch(small_corpus, 16, threads=2)
    assert lazy.shape == eager.shape and len(lazy) == 24
    np.testing.assert_array_equal(lazy[3], eager[3])
    np.testing.assert_array_equal(lazy[4:9], eager[4:9])
    idx = np.array([7, 0, 23, 7])
    np.testing.assert_array_equal(lazy[idx], eager[idx])
    with pytest.raises(TypeError):
        np.asarray(lazy)  # whole-corpus materialization is refused


def test_mmap_cache_roundtrip_and_invalidation(small_corpus, tmp_path):
    cache = str(tmp_path / "cache")
    m = build_mmap_cache(small_corpus, 16, cache, threads=2, chunk=7)
    assert isinstance(m, np.memmap) and m.shape == (24, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(m), decode_resize_batch(small_corpus, 16, threads=2))
    # reuse: second call maps the same file without redecoding
    sig = corpus_signature(small_corpus, 16)
    npy = os.path.join(cache, f"images_{sig}.npy")
    mtime = os.path.getmtime(npy)
    m2 = build_mmap_cache(small_corpus, 16, cache, threads=2)
    assert os.path.getmtime(npy) == mtime
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m))
    # different img_size or file list -> different cache entry
    assert corpus_signature(small_corpus, 32) != sig
    assert corpus_signature(small_corpus[:-1], 16) != sig
    # a half-built cache (no .ok marker) is rebuilt
    os.remove(npy + ".ok")
    build_mmap_cache(small_corpus, 16, cache, threads=2)
    assert os.path.exists(npy + ".ok")


def test_prefetch_preserves_order_and_values():
    batches = [{"x": np.full((2,), i)} for i in range(20)]
    out = list(prefetch_batches(iter(batches), depth=3))
    assert [int(b["x"][0]) for b in out] == list(range(20))
    # transform runs on the producer thread
    out = list(prefetch_batches(iter(batches), transform=lambda b: {"x": b["x"] + 1}))
    assert [int(b["x"][0]) for b in out] == list(range(1, 21))


def test_prefetch_propagates_producer_exception():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("decode failed")

    it = prefetch_batches(gen())
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_prefetch_early_close_unblocks_producer():
    done = []

    def gen():
        for i in range(100):
            yield {"x": np.zeros(1)}
        done.append(True)

    it = prefetch_batches(gen(), depth=1)
    next(it)
    it.close()  # consumer abandons mid-stream; producer must not deadlock
    assert not done


def test_choose_data_mode_thresholds():
    assert choose_data_mode(100, 224, "auto", ram_budget_gb=8.0) == "ram"
    assert choose_data_mode(200_000, 224, "auto", ram_budget_gb=8.0) == "mmap"
    assert choose_data_mode(200_000, 224, "stream") == "stream"
    assert choose_data_mode(10, 224, "mmap") == "mmap"


@pytest.fixture(scope="module")
def age_corpus(tmp_path_factory):
    """Small real-file age corpus for mode-equivalence e2e runs."""
    root = tmp_path_factory.mktemp("agedb_stream")
    (root / "imgs").mkdir()
    rng = np.random.default_rng(1)
    rows = []
    for i in range(60):
        a = int(rng.integers(0, 100))
        img = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        path = f"imgs/{i}.jpg"
        Image.fromarray(img).save(root / path, quality=90)
        rows.append({"age": a, "path": path,
                     "split": "train" if i % 3 else ("val" if i % 6 else "test")})
    pd.DataFrame(rows).to_csv(root / "agedb.csv", index=False)
    return str(root)


@pytest.mark.parametrize("mode", ["mmap", "stream"])
def test_load_age_datasets_modes_match_ram(age_corpus, mode, tmp_path):
    from imbalanced_regression_tpu.data.age import load_age_datasets
    from imbalanced_regression_tpu.utils.config import ExperimentConfig

    base = ExperimentConfig(dataset="agedb", data_dir=age_corpus, img_size=16,
                            workers=2, data_mode="ram")
    other = ExperimentConfig(dataset="agedb", data_dir=age_corpus, img_size=16,
                             workers=2, data_mode=mode, cache_dir=str(tmp_path / "c"))
    train_a, val_a, _, labels_a = load_age_datasets(base)
    train_b, val_b, _, labels_b = load_age_datasets(other)
    np.testing.assert_array_equal(labels_a, labels_b)
    np.testing.assert_array_equal(train_a["weight"], train_b["weight"])
    idx = np.array([0, 5, 3])
    np.testing.assert_array_equal(train_a["input"][idx], train_b["input"][idx])
    np.testing.assert_array_equal(val_a["input"][0:4], val_b["input"][0:4])


_RSS_SCRIPT = r"""
import json, os, resource, sys
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS
import numpy as np
import jax.numpy as jnp
import imbalanced_regression_tpu.tasks.age as age
import imbalanced_regression_tpu.models.resnet as resnet_mod
from imbalanced_regression_tpu.utils.config import ExperimentConfig

age.resnet50_backbone = lambda dtype=jnp.float32: resnet_mod.ResNetBasicBackbone(
    stage_sizes=(1,), width=4, dtype=jnp.float32)
import_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
cfg = ExperimentConfig(
    dataset="agedb", data_dir=sys.argv[1], img_size=128, batch_size=128,
    epoch=1, lr=1e-3, loss="mse", store_root=os.path.join(sys.argv[1], "ckpt"),
    num_devices=1, workers=2, data_mode="stream",
)
result = age.run(cfg)
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({"peak_mb": peak_kb / 1024, "import_mb": import_mb,
                  "mse": result["test"]["mse"]}))
"""


def _make_age_corpus(root, n, rng):
    """n-file JPEG corpus from 64 shared prototypes (hardlinks keep it fast;
    the loader sees n real paths)."""
    (root / "imgs").mkdir()
    protos = []
    for j in range(64):
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = root / "imgs" / f"proto_{j}.jpg"
        Image.fromarray(img).save(p, quality=85)
        protos.append(p)
    rows = []
    ages = rng.integers(0, 100, n)
    for i in range(n):
        path = f"imgs/{i}.jpg"
        os.link(protos[i % 64], root / path)
        rows.append({"age": int(ages[i]), "path": path,
                     "split": "train" if i % 50 else ("val" if i % 100 else "test")})
    pd.DataFrame(rows).to_csv(root / "agedb.csv", index=False)


def _run_rss_subprocess(root):
    script = root / "run_stream.py"
    script.write_text(_RSS_SCRIPT)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["DIR_TPU_TENSORBOARD"] = "0"  # the TB backend alone costs ~850 MB RSS
    proc = subprocess.run(
        [sys.executable, str(script), str(root)],
        capture_output=True, text=True, env=env, timeout=3000,
        cwd=repo_root,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_stream_mode_bounds_rss_on_20k_corpus(tmp_path_factory):
    """Train one epoch over 20,000 JPEG files decoded at 128x128 (983 MB if
    materialized, ~29 GB at IMDB-WIKI scale) and assert peak RSS does not
    grow with corpus size.

    The bound is DIFFERENTIAL against a 512-file run of the identical
    subprocess executed back-to-back: the baseline captures the process's
    fixed footprint (Python + jax + XLA:CPU conv scratch at batch 128) under
    whatever host load/allocator conditions prevail *right now*, so
    full-suite memory-pressure variance cancels instead of tripping an
    absolute threshold (round-2 flake: 5.7 GB absolute peak under suite load,
    900 MB in isolation — both runs inflate equally). A ram-mode regression
    still fails loudly: materializing the 19.6k-row train split costs +964 MB
    over the 512-row baseline's +25 MB, far above the 400 MB delta bound."""
    rng = np.random.default_rng(2)
    small_root = tmp_path_factory.mktemp("smallcorpus")
    _make_age_corpus(small_root, 512, rng)
    big_root = tmp_path_factory.mktemp("bigcorpus")
    _make_age_corpus(big_root, 20_000, rng)

    base = _run_rss_subprocess(small_root)
    stats = _run_rss_subprocess(big_root)
    assert np.isfinite(stats["mse"]) and np.isfinite(base["mse"])
    delta = stats["peak_mb"] - base["peak_mb"]
    assert delta < 400, (
        f"peak RSS grew {delta:.0f} MB with corpus size "
        f"(512 files: {base['peak_mb']:.0f} MB after {base['import_mb']:.0f} at import; "
        f"20k files: {stats['peak_mb']:.0f} MB after {stats['import_mb']:.0f} at import)")

"""Pallas kernels vs the jnp reference paths (interpret mode on CPU;
the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.fds import FDSConfig, fds_init, fds_smooth
from imbalanced_regression_tpu.ops.calibrate import calibrate_gathered
from imbalanced_regression_tpu.ops.pallas_kernels import pallas_calibrate, pallas_moments


@pytest.mark.parametrize("n,d,b", [(64, 32, 10), (100, 130, 21), (7, 8, 3), (300, 512, 100)])
def test_pallas_moments_matches_onehot(rng, n, d, b):
    feats = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, b, size=n).astype(np.int32)
    idx[:2] = -1  # masked-out samples

    count, total, total_sq = pallas_moments(jnp.asarray(feats), jnp.asarray(idx), b)

    onehot = np.zeros((n, b), np.float32)
    valid = idx >= 0
    onehot[np.arange(n)[valid], idx[valid]] = 1.0
    np.testing.assert_allclose(np.asarray(count), onehot.sum(0), rtol=0)
    np.testing.assert_allclose(np.asarray(total), onehot.T @ feats, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(total_sq), onehot.T @ (feats**2), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,clips", [("nonzero", (0.1, 10.0)), ("positive", (0.5, 2.0))])
def test_pallas_calibrate_matches_gathered(rng, mode, clips):
    n, d, b = 50, 40, 12
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, b, size=n).astype(np.int32)
    ok = rng.random(n) > 0.2
    m1 = rng.normal(size=(b, d)).astype(np.float32)
    v1 = rng.uniform(0.01, 3.0, size=(b, d)).astype(np.float32)
    m2 = rng.normal(size=(b, d)).astype(np.float32)
    v2 = rng.uniform(0.01, 3.0, size=(b, d)).astype(np.float32)
    v1[2, :] = 0.0  # all-zero v1 row → identity for bucket 2
    v1[5, 3] = 0.0  # single zero column
    v2[6, 1] = -1.0  # negative v2 (positive-mode column guard)

    got = np.asarray(pallas_calibrate(
        jnp.asarray(x), jnp.asarray(idx), jnp.asarray(ok),
        tuple(map(jnp.asarray, (m1, v1, m2, v2))), jnp.asarray(v1.sum(1)),
        clips[0], clips[1], mode,
    ))
    want = np.asarray(calibrate_gathered(
        jnp.asarray(x), jnp.asarray(m1[idx]), jnp.asarray(v1[idx]),
        jnp.asarray(m2[idx]), jnp.asarray(v2[idx]), jnp.asarray(ok),
        clips[0], clips[1], mode,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_calibrate_grad(rng):
    n, d, b = 16, 24, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, b, size=n).astype(np.int32)
    ok = np.ones(n, bool)
    stats = tuple(jnp.asarray(rng.uniform(0.1, 2.0, size=(b, d)).astype(np.float32)) for _ in range(4))
    v1sum = jnp.sum(stats[1], axis=1)

    def f_pallas(x):
        return jnp.sum(pallas_calibrate(x, jnp.asarray(idx), jnp.asarray(ok),
                                        stats, v1sum, 0.1, 10.0, "nonzero") ** 2)

    def f_ref(x):
        m1, v1, m2, v2 = stats
        return jnp.sum(calibrate_gathered(x, m1[idx], v1[idx], m2[idx], v2[idx],
                                          jnp.asarray(ok), 0.1, 10.0, "nonzero") ** 2)

    g_pallas = jax.grad(f_pallas)(jnp.asarray(x))
    g_ref = jax.grad(f_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_fds_smooth_pallas_path_matches(rng):
    cfg = FDSConfig(feature_dim=32, bucket_num=20, bucket_start=2, grouping="age")
    state = fds_init(cfg)
    # give the stats real values
    state = state.replace(
        running_mean_last_epoch=jnp.asarray(rng.normal(size=(18, 32)).astype(np.float32)),
        running_var_last_epoch=jnp.asarray(rng.uniform(0.1, 2, size=(18, 32)).astype(np.float32)),
        smoothed_mean_last_epoch=jnp.asarray(rng.normal(size=(18, 32)).astype(np.float32)),
        smoothed_var_last_epoch=jnp.asarray(rng.uniform(0.1, 2, size=(18, 32)).astype(np.float32)),
    )
    feats = rng.normal(size=(40, 32)).astype(np.float32)
    labels = rng.integers(0, 24, size=40).astype(np.float32)
    a = np.asarray(fds_smooth(cfg, state, feats, labels, 1, use_pallas=False))
    b = np.asarray(fds_smooth(cfg, state, feats, labels, 1, use_pallas=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_pallas_kernels_accept_bf16(rng):
    """bf16 feature inputs are upcast inside the kernels (f32 accumulation)."""
    n, d, b = 32, 16, 6
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, b, size=n).astype(np.int32))
    count, total, total_sq = pallas_moments(feats, idx, b)
    assert total.dtype == jnp.float32
    np.testing.assert_allclose(float(count.sum()), n)

    stats = tuple(jnp.asarray(rng.uniform(0.1, 2.0, size=(b, d)).astype(np.float32)) for _ in range(4))
    out = pallas_calibrate(feats, idx, jnp.ones((n,), bool), stats,
                           jnp.sum(stats[1], axis=1), 0.1, 10.0, "nonzero")
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_bucket_moments_pallas_path_matches(rng):
    from imbalanced_regression_tpu.fds import fds_bucket_moments

    cfg = FDSConfig(feature_dim=16, bucket_num=30, grouping="age")
    feats = rng.normal(size=(64, 16)).astype(np.float32)
    labels = rng.integers(0, 35, size=64).astype(np.float32)
    ref = fds_bucket_moments(cfg, feats, labels, use_pallas=False)
    pal = fds_bucket_moments(cfg, feats, labels, use_pallas=True)
    np.testing.assert_allclose(np.asarray(ref.count), np.asarray(pal.count))
    np.testing.assert_allclose(np.asarray(ref.total), np.asarray(pal.total), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.total_sq), np.asarray(pal.total_sq), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,d,b", [(64, 32, 10), (100, 130, 21), (300, 512, 100)])
def test_pallas_moments_v2_matches_onehot(rng, n, d, b):
    """The split-precision variant must match the f32 oracle to near-f32
    accuracy (the 3-term bf16 mantissa split is exact to ~2^-24 relative)."""
    from imbalanced_regression_tpu.ops.pallas_kernels import pallas_moments_v2

    feats = (rng.normal(size=(n, d)) * rng.uniform(0.1, 30.0, size=(1, d))).astype(np.float32)
    idx = rng.integers(0, b, size=n).astype(np.int32)
    idx[:2] = -1  # masked-out samples

    count, total, total_sq = pallas_moments_v2(jnp.asarray(feats), jnp.asarray(idx), b)

    onehot = np.zeros((n, b), np.float32)
    valid = idx >= 0
    onehot[np.arange(n)[valid], idx[valid]] = 1.0
    np.testing.assert_allclose(np.asarray(count), onehot.sum(0), rtol=0)
    np.testing.assert_allclose(np.asarray(total), onehot.T @ feats, rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(total_sq), onehot.T @ (feats**2), rtol=2e-6, atol=1e-5)


def test_bucket_moments_v2_selector(rng):
    from imbalanced_regression_tpu.ops.moments import bucket_moments

    n, d, b = 48, 24, 9
    feats = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, b, size=n).astype(np.int32))
    ref = bucket_moments(feats, idx, b, use_pallas=False)
    v2 = bucket_moments(feats, idx, b, use_pallas="v2")
    np.testing.assert_allclose(np.asarray(v2.count), np.asarray(ref.count), rtol=0)
    np.testing.assert_allclose(np.asarray(v2.total), np.asarray(ref.total), rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2.total_sq), np.asarray(ref.total_sq), rtol=2e-6, atol=1e-5)

"""Golden tests for the FDS state machine against the sequential oracle
(tests/oracle.py), covering all three groupings, edge pooling/gating, the
factor=0 first epoch, count-based momentum fallback, empty-bucket imputation,
and the start_smooth threshold."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbalanced_regression_tpu.fds import (
    FDSConfig,
    fds_apply_moments,
    fds_bucket_moments,
    fds_init,
    fds_reset,
    fds_smooth,
    fds_update_last_epoch_stats,
    fds_update_running_stats,
)
from imbalanced_regression_tpu.ops.binning import bin_index_hist_np
from tests.oracle import FDSOracle


def _oracle_for(cfg: FDSConfig) -> FDSOracle:
    return FDSOracle(
        feature_dim=cfg.feature_dim, bucket_num=cfg.bucket_num, bucket_start=cfg.bucket_start,
        start_update=cfg.start_update, start_smooth=cfg.start_smooth, momentum=cfg.momentum,
        window=cfg.window, grouping=cfg.grouping, clip_min=cfg.clip_min, clip_max=cfg.clip_max,
        guard_mode=cfg.guard_mode, impute_empty=cfg.impute_empty,
    )


def _assert_state_close(state, oracle, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(np.asarray(state.running_mean), oracle.running_mean, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(state.running_var), oracle.running_var, rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(state.num_samples_tracked), oracle.num_samples_tracked, rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(state.smoothed_mean_last_epoch), oracle.smoothed_mean_last_epoch, rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(state.smoothed_var_last_epoch), oracle.smoothed_var_last_epoch, rtol=rtol, atol=atol
    )


def _age_batch(rng, n, bucket_num=20, include_edges=True):
    labels = rng.integers(0, bucket_num + 4, size=n).astype(np.float32)  # some > bucket_num-1
    if include_edges:
        labels[0] = 0.0
        labels[1] = bucket_num - 1
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    return feats, labels


@pytest.mark.parametrize("momentum", [0.9, None])
@pytest.mark.parametrize("bucket_start", [0, 3])
def test_age_update_and_smooth_multi_epoch(rng, momentum, bucket_start):
    cfg = FDSConfig(feature_dim=6, bucket_num=20, bucket_start=bucket_start,
                    momentum=momentum, grouping="age", ks=5, sigma=2.0)
    state = fds_init(cfg)
    oracle = _oracle_for(cfg)

    for epoch in range(3):
        state = fds_update_last_epoch_stats(cfg, state, epoch)
        oracle.update_last_epoch_stats(epoch)

        feats, labels = _age_batch(rng, 64, cfg.bucket_num)
        # smooth must match before stats change
        got = np.asarray(fds_smooth(cfg, state, feats, labels, epoch))
        want = oracle.smooth(feats, labels, epoch)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        state = fds_update_running_stats(cfg, state, feats, labels, epoch)
        oracle.update_running_stats(feats, labels, epoch)
        _assert_state_close(state, oracle)


def test_age_edge_gating(rng):
    """Edge buckets only update/smooth when the exact edge label is present
    (imdb-wiki-dir/fds.py:91-99)."""
    cfg = FDSConfig(feature_dim=4, bucket_num=10, bucket_start=2, grouping="age")
    state = fds_init(cfg)
    oracle = _oracle_for(cfg)

    # batch with labels BELOW bucket_start but without the edge label itself,
    # and labels ABOVE bucket_num-1 without the top edge label
    labels = np.array([0.0, 1.0, 5.0, 5.0, 12.0, 13.0], dtype=np.float32)
    feats = rng.normal(size=(6, 4)).astype(np.float32)
    state = fds_update_running_stats(cfg, state, feats, labels, 0)
    oracle.update_running_stats(feats, labels, 0)
    _assert_state_close(state, oracle)
    # neither edge bucket tracked anything
    assert np.asarray(state.num_samples_tracked)[0] == 0
    assert np.asarray(state.num_samples_tracked)[-1] == 0

    # now include the edge labels → pooled samples join
    labels2 = np.array([0.0, 2.0, 5.0, 9.0, 12.0], dtype=np.float32)
    state = fds_update_running_stats(cfg, state, feats[:5], labels2, 0)
    oracle.update_running_stats(feats[:5], labels2, 0)
    _assert_state_close(state, oracle)
    assert np.asarray(state.num_samples_tracked)[0] == 2  # labels 0.0 and 2.0
    assert np.asarray(state.num_samples_tracked)[-1] == 2  # labels 9.0 and 12.0

    # smooth gating: pooled-only batch (no exact edge label) is left unchanged
    state = fds_update_last_epoch_stats(cfg, state, 1)
    oracle.update_last_epoch_stats(1)
    pool_labels = np.array([0.0, 1.0, 12.0], dtype=np.float32)
    pool_feats = rng.normal(size=(3, 4)).astype(np.float32)
    got = np.asarray(fds_smooth(cfg, state, pool_feats, pool_labels, 1))
    want = oracle.smooth(pool_feats, pool_labels, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got, pool_feats)  # gated out → identity


def test_smooth_identity_before_start_smooth(rng):
    cfg = FDSConfig(feature_dim=6, bucket_num=10, start_smooth=2, grouping="age")
    state = fds_init(cfg)
    feats, labels = _age_batch(rng, 16, 10)
    got = np.asarray(fds_smooth(cfg, state, feats, labels, epoch=1))
    np.testing.assert_array_equal(got, feats)


def test_update_skipped_for_stale_epoch(rng):
    cfg = FDSConfig(feature_dim=6, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    state = fds_update_last_epoch_stats(cfg, state, 1)  # state.epoch -> 1
    feats, labels = _age_batch(rng, 16, 10)
    before = np.asarray(state.running_mean).copy()
    state2 = fds_update_running_stats(cfg, state, feats, labels, epoch=0)
    np.testing.assert_array_equal(np.asarray(state2.running_mean), before)


def test_factor_zero_on_start_update_epoch(rng):
    cfg = FDSConfig(feature_dim=4, bucket_num=10, start_update=0, momentum=0.9, grouping="age")
    state = fds_init(cfg)
    feats = rng.normal(size=(8, 4)).astype(np.float32) + 5.0
    labels = np.full(8, 4.0, dtype=np.float32)
    state = fds_update_running_stats(cfg, state, feats, labels, epoch=0)
    # factor=0 → running stats forced to current batch stats
    np.testing.assert_allclose(np.asarray(state.running_mean)[4], feats.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.running_var)[4], feats.var(0, ddof=1), rtol=1e-5)


def test_single_sample_bucket_biased_var(rng):
    cfg = FDSConfig(feature_dim=4, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    feats = rng.normal(size=(1, 4)).astype(np.float32)
    labels = np.array([5.0], dtype=np.float32)
    state = fds_update_running_stats(cfg, state, feats, labels, epoch=0)
    np.testing.assert_allclose(np.asarray(state.running_var)[5], 0.0, atol=1e-5)


def test_hist_grouping_with_imputation(rng):
    cfg = FDSConfig.for_sts(feature_dim=6, bucket_num=20)
    state = fds_init(cfg)
    oracle = _oracle_for(cfg)
    for epoch in range(2):
        state = fds_update_last_epoch_stats(cfg, state, epoch)
        oracle.update_last_epoch_stats(epoch)
        labels = rng.uniform(0, 5, size=48).astype(np.float32)
        labels[:3] = [0.0, 5.0, 2.6]
        feats = rng.normal(size=(48, 6)).astype(np.float32)
        bidx = bin_index_hist_np(labels, cfg.bucket_num, cfg.bucket_start)

        got = np.asarray(fds_smooth(cfg, state, feats, labels, epoch, bucket_idx=bidx))
        want = oracle.smooth(feats, labels, epoch, bucket_idx=bidx)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        state = fds_update_running_stats(cfg, state, feats, labels, epoch, bucket_idx=bidx)
        oracle.update_running_stats(feats, labels, epoch, bucket_idx=bidx)
        _assert_state_close(state, oracle)


def test_depth_grouping(rng):
    cfg = FDSConfig.for_depth(feature_dim=5, bucket_num=30, bucket_start=4)
    state = fds_init(cfg)
    oracle = _oracle_for(cfg)
    for epoch in range(2):
        state = fds_update_last_epoch_stats(cfg, state, epoch)
        oracle.update_last_epoch_stats(epoch)
        depths = rng.uniform(0, 3.2, size=100).astype(np.float32)
        feats = rng.normal(size=(100, 5)).astype(np.float32)
        bidx = np.clip((depths * np.float32(10)).astype(int), cfg.bucket_start, cfg.bucket_num - 1)

        got = np.asarray(fds_smooth(cfg, state, feats, depths, epoch))
        want = oracle.smooth(feats, depths, epoch, bucket_idx=bidx)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        state = fds_update_running_stats(cfg, state, feats, depths, epoch)
        oracle.update_running_stats(feats, depths, epoch, bucket_idx=bidx)
        _assert_state_close(state, oracle)


def test_streaming_moments_equal_single_shot(rng):
    """Accumulated per-batch moments == one big batch (the epoch-pass design)."""
    cfg = FDSConfig(feature_dim=6, bucket_num=20, grouping="age")
    feats, labels = _age_batch(rng, 120, 20)
    whole = fds_bucket_moments(cfg, feats, labels)
    parts = fds_bucket_moments(cfg, feats[:40], labels[:40]) \
        + fds_bucket_moments(cfg, feats[40:90], labels[40:90]) \
        + fds_bucket_moments(cfg, feats[90:], labels[90:])
    np.testing.assert_allclose(np.asarray(whole.count), np.asarray(parts.count))
    np.testing.assert_allclose(np.asarray(whole.total), np.asarray(parts.total), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(whole.total_sq), np.asarray(parts.total_sq), rtol=1e-5, atol=1e-6)

    s1 = fds_apply_moments(cfg, fds_init(cfg), whole, 0)
    s2 = fds_apply_moments(cfg, fds_init(cfg), parts, 0)
    np.testing.assert_allclose(np.asarray(s1.running_mean), np.asarray(s2.running_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.running_var), np.asarray(s2.running_var), rtol=1e-4, atol=1e-5)


def test_update_last_epoch_only_on_next_epoch():
    cfg = FDSConfig(feature_dim=4, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    assert int(state.epoch) == 0
    state = fds_update_last_epoch_stats(cfg, state, 5)  # not epoch+1 → no-op
    assert int(state.epoch) == 0
    state = fds_update_last_epoch_stats(cfg, state, 1)
    assert int(state.epoch) == 1


def test_reset():
    cfg = FDSConfig(feature_dim=4, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    state = state.replace(running_mean=state.running_mean + 3.0,
                          num_samples_tracked=state.num_samples_tracked + 7.0)
    state = fds_reset(state)
    np.testing.assert_array_equal(np.asarray(state.running_mean), 0.0)
    np.testing.assert_array_equal(np.asarray(state.running_var), 1.0)
    np.testing.assert_array_equal(np.asarray(state.num_samples_tracked), 0.0)


def test_smooth_label_shapes(rng):
    cfg = FDSConfig(feature_dim=4, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    feats = rng.normal(size=(8, 4)).astype(np.float32)
    labels = rng.integers(1, 9, size=8).astype(np.float32)
    a = np.asarray(fds_smooth(cfg, state, feats, labels, 1))
    b = np.asarray(fds_smooth(cfg, state, feats, labels[:, None], 1))
    np.testing.assert_array_equal(a, b)


def test_jit_compatible(rng):
    import jax

    cfg = FDSConfig(feature_dim=4, bucket_num=10, grouping="age")
    state = fds_init(cfg)
    feats = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=8).astype(np.float32))

    smooth_j = jax.jit(lambda s, f, l, e: fds_smooth(cfg, s, f, l, e))
    upd_j = jax.jit(lambda s, f, l, e: fds_update_running_stats(cfg, s, f, l, e))
    last_j = jax.jit(lambda s, e: fds_update_last_epoch_stats(cfg, s, e))

    out = smooth_j(state, feats, labels, 1)
    assert out.shape == feats.shape
    state = upd_j(state, feats, labels, 0)
    state = last_j(state, 1)
    assert int(state.epoch) == 1

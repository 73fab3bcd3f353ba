"""Direct parity tests against the actual reference implementation.

These import the PyTorch reference modules from /root/reference (read-only,
with ``.cuda()`` stubbed for CPU execution) and assert that our functional
TPU implementation produces the same numbers on identical inputs — the
SURVEY.md §4.4 parity tier, stronger than formula-level oracles.

Skipped wholesale when the reference checkout is absent."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

# CPU-execution stubs for reference code that hardcodes .cuda()
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self


def _load_ref_module(suite: str, name: str):
    """Import a reference module under a unique alias (suites shadow each
    other's module names)."""
    import importlib.util

    path = os.path.join(REF, suite, f"{name}.py")
    # reference modules do absolute sibling imports (utils, util) — expose the
    # suite dir on sys.path during load
    sys.path.insert(0, os.path.join(REF, suite))
    try:
        spec = importlib.util.spec_from_file_location(f"ref_{suite.replace('-', '_')}_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)
        for leftover in ("utils", "util", "fds", "loss"):
            sys.modules.pop(leftover, None)


@pytest.fixture(scope="module")
def ref_fds_age():
    return _load_ref_module("imdb-wiki-dir", "fds").FDS


@pytest.fixture(scope="module")
def ref_fds_sts():
    return _load_ref_module("sts-b-dir", "fds").FDS


def _drive_pair(ref_fds_cls, cfg, labels_fn, bucket_idx_fn=None, epochs=3, n=48, rng_seed=0):
    """Run the reference module and our state machine side by side."""
    from imbalanced_regression_tpu.fds import (
        fds_init, fds_smooth, fds_update_last_epoch_stats, fds_update_running_stats,
    )

    rng = np.random.default_rng(rng_seed)
    ref = ref_fds_cls(feature_dim=cfg.feature_dim, bucket_num=cfg.bucket_num,
                      bucket_start=cfg.bucket_start, start_update=cfg.start_update,
                      start_smooth=cfg.start_smooth, kernel=cfg.kernel, ks=cfg.ks,
                      sigma=cfg.sigma, momentum=cfg.momentum)
    state = fds_init(cfg)

    for epoch in range(epochs):
        feats = rng.normal(size=(n, cfg.feature_dim)).astype(np.float32)
        labels = labels_fn(rng, n)
        bidx = bucket_idx_fn(labels) if bucket_idx_fn else None

        ref.update_last_epoch_stats(epoch)
        state = fds_update_last_epoch_stats(cfg, state, epoch)

        # smooth parity (reference mutates in place → pass a copy)
        ref_sm = ref.smooth(torch.tensor(feats.copy()),
                            torch.tensor(labels)[:, None], epoch).numpy()
        got_sm = np.asarray(fds_smooth(cfg, state, feats, labels, epoch, bucket_idx=bidx))
        np.testing.assert_allclose(got_sm, ref_sm, rtol=2e-4, atol=2e-5)

        ref.update_running_stats(torch.tensor(feats), torch.tensor(labels), epoch)
        state = fds_update_running_stats(cfg, state, feats, labels, epoch, bucket_idx=bidx)

        np.testing.assert_allclose(np.asarray(state.running_mean),
                                   ref.running_mean.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.running_var),
                                   ref.running_var.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.num_samples_tracked),
                                   ref.num_samples_tracked.numpy())
        np.testing.assert_allclose(np.asarray(state.smoothed_mean_last_epoch),
                                   ref.smoothed_mean_last_epoch.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(state.smoothed_var_last_epoch),
                                   ref.smoothed_var_last_epoch.numpy(), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bucket_start,momentum", [(0, 0.9), (3, 0.9), (0, None)])
def test_fds_age_parity(ref_fds_age, bucket_start, momentum):
    from imbalanced_regression_tpu.fds import FDSConfig

    cfg = FDSConfig(feature_dim=8, bucket_num=15, bucket_start=bucket_start,
                    momentum=momentum, grouping="age", ks=5, sigma=2.0)
    # integer age labels incl. out-of-range and exact edge values
    labels_fn = lambda rng, n: rng.integers(0, 19, size=n).astype(np.float32)
    _drive_pair(ref_fds_age, cfg, labels_fn)


def test_fds_sts_parity(ref_fds_sts):
    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.ops.binning import bin_index_hist_np

    cfg = FDSConfig.for_sts(feature_dim=6, bucket_num=20, ks=5, sigma=2.0)
    labels_fn = lambda rng, n: np.round(rng.uniform(0, 5, size=n) * 5) / 5.0
    labels_fn_f32 = lambda rng, n: labels_fn(rng, n).astype(np.float32)
    bidx_fn = lambda labels: bin_index_hist_np(labels, cfg.bucket_num, cfg.bucket_start)
    _drive_pair(ref_fds_sts, cfg, labels_fn_f32, bucket_idx_fn=bidx_fn)


def test_loss_parity():
    ref_loss = _load_ref_module("imdb-wiki-dir", "loss")
    from imbalanced_regression_tpu.ops import losses as ours

    rng = np.random.default_rng(0)
    inputs = rng.normal(size=(32, 1)).astype(np.float32) * 8
    targets = rng.normal(size=(32, 1)).astype(np.float32) * 8
    weights = rng.uniform(0.2, 2.0, size=(32, 1)).astype(np.float32)
    ti, tt, tw = map(torch.tensor, (inputs, targets, weights))

    pairs = [
        (ours.weighted_mse_loss(inputs, targets, weights), ref_loss.weighted_mse_loss(ti, tt, tw)),
        (ours.weighted_l1_loss(inputs, targets, weights), ref_loss.weighted_l1_loss(ti, tt, tw)),
        (ours.weighted_focal_mse_loss(inputs, targets, weights),
         ref_loss.weighted_focal_mse_loss(ti, tt, tw)),
        (ours.weighted_focal_l1_loss(inputs, targets, weights, activate="tanh"),
         ref_loss.weighted_focal_l1_loss(ti, tt, tw, activate="tanh")),
        (ours.weighted_huber_loss(inputs, targets, weights, beta=0.3),
         ref_loss.weighted_huber_loss(ti, tt, tw, beta=0.3)),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_lds_weight_parity_age():
    """Full _prepare_weights parity via the reference datasets module."""
    import types

    if "torchvision" not in sys.modules:  # reference imports it; not installed
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    ref_ds = _load_ref_module("imdb-wiki-dir", "datasets")
    import pandas as pd

    from imbalanced_regression_tpu.ops.lds import prepare_weights_age

    rng = np.random.default_rng(3)
    ages = np.concatenate([rng.integers(18, 45, 400), rng.integers(0, 121, 80)]).astype(np.float32)
    df = pd.DataFrame({"age": ages, "path": ["x.jpg"] * len(ages)})
    ds = ref_ds.IMDBWIKI.__new__(ref_ds.IMDBWIKI)
    ds.df = df
    for reweight, lds in (("sqrt_inv", True), ("inverse", True), ("sqrt_inv", False)):
        want = ds._prepare_weights(reweight=reweight, lds=lds, lds_kernel="gaussian",
                                   lds_ks=5, lds_sigma=2)
        got = prepare_weights_age(ages, reweight, lds=lds, lds_kernel="gaussian",
                                  lds_ks=5, lds_sigma=2)
        np.testing.assert_allclose(got, np.asarray(want, dtype=np.float64), rtol=1e-6)


def test_calibrate_parity():
    ref_utils = _load_ref_module("imdb-wiki-dir", "utils")
    from imbalanced_regression_tpu.ops import calibrate_mean_var

    rng = np.random.default_rng(4)
    x = rng.normal(size=(12, 10)).astype(np.float32)
    m1 = rng.normal(size=10).astype(np.float32)
    v1 = rng.uniform(0, 3, size=10).astype(np.float32)
    v1[0] = 0.0
    m2 = rng.normal(size=10).astype(np.float32)
    v2 = rng.uniform(0, 3, size=10).astype(np.float32)
    want = ref_utils.calibrate_mean_var(torch.tensor(x.copy()), torch.tensor(m1),
                                        torch.tensor(v1), torch.tensor(m2),
                                        torch.tensor(v2)).numpy()
    got = np.asarray(calibrate_mean_var(x, m1, v1, m2, v2, 0.1, 10.0, "nonzero"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

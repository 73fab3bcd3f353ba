"""Golden tests for calibrate_mean_var against the torch oracle, covering
both guard modes, all three clip ranges, and zero-variance branches."""

import numpy as np
import pytest
import torch

from imbalanced_regression_tpu.ops import calibrate_mean_var
from imbalanced_regression_tpu.ops.calibrate import calibrate_gathered
from tests.oracle import torch_calibrate_mean_var

CLIPS = [(0.1, 10.0, "nonzero"), (0.5, 2.0, "positive"), (0.2, 5.0, "positive")]


def _rand_stats(rng, d, zero_cols=(), neg_v2_cols=()):
    m1 = rng.normal(size=d).astype(np.float32)
    v1 = rng.uniform(0.01, 4.0, size=d).astype(np.float32)
    m2 = rng.normal(size=d).astype(np.float32)
    v2 = rng.uniform(0.01, 4.0, size=d).astype(np.float32)
    v1[list(zero_cols)] = 0.0
    v2[list(neg_v2_cols)] = -0.5
    return m1, v1, m2, v2


@pytest.mark.parametrize("clip_min,clip_max,mode", CLIPS)
@pytest.mark.parametrize("zero_cols", [(), (0, 5)])
def test_calibrate_matches_torch(rng, clip_min, clip_max, mode, zero_cols):
    d = 16
    x = rng.normal(size=(10, d)).astype(np.float32)
    m1, v1, m2, v2 = _rand_stats(rng, d, zero_cols=zero_cols)
    got = np.asarray(calibrate_mean_var(x, m1, v1, m2, v2, clip_min, clip_max, mode))
    want = torch_calibrate_mean_var(
        torch.tensor(x), torch.tensor(m1), torch.tensor(v1), torch.tensor(m2), torch.tensor(v2),
        clip_min, clip_max, mode,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_calibrate_positive_mode_negative_v2(rng):
    d = 8
    x = rng.normal(size=(6, d)).astype(np.float32)
    m1, v1, m2, v2 = _rand_stats(rng, d, neg_v2_cols=(2,))
    got = np.asarray(calibrate_mean_var(x, m1, v1, m2, v2, 0.5, 2.0, "positive"))
    want = torch_calibrate_mean_var(
        torch.tensor(x), torch.tensor(m1), torch.tensor(v1), torch.tensor(m2), torch.tensor(v2),
        0.5, 2.0, "positive",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # the negative-v2 column must pass through unchanged
    np.testing.assert_array_equal(got[:, 2], x[:, 2])


def test_calibrate_all_zero_v1_is_identity(rng):
    d = 8
    x = rng.normal(size=(6, d)).astype(np.float32)
    m1 = rng.normal(size=d).astype(np.float32)
    v1 = np.zeros(d, dtype=np.float32)
    m2 = rng.normal(size=d).astype(np.float32)
    v2 = rng.uniform(0.1, 2.0, size=d).astype(np.float32)
    got = np.asarray(calibrate_mean_var(x, m1, v1, m2, v2))
    np.testing.assert_array_equal(got, x)


def test_calibrate_gathered_matches_rowwise(rng):
    d, n, b = 8, 20, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = rng.integers(0, b, size=n)
    stats = [rng.uniform(0.1, 2.0, size=(b, d)).astype(np.float32) for _ in range(4)]
    m1s, v1s, m2s, v2s = stats
    ok = rng.random(n) > 0.3

    got = np.asarray(
        calibrate_gathered(x, m1s[idx], v1s[idx], m2s[idx], v2s[idx], ok, 0.1, 10.0, "nonzero")
    )
    want = x.copy()
    for j in range(b):
        mask = (idx == j) & ok
        if mask.any():
            want[mask] = np.asarray(
                calibrate_mean_var(x[mask], m1s[j], v1s[j], m2s[j], v2s[j], 0.1, 10.0, "nonzero")
            )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

"""Bucket-axis smoothing conv vs torch F.conv1d reflect-pad oracle
(imdb-wiki-dir/fds.py:54-67)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imbalanced_regression_tpu.ops import get_fds_kernel_window, smooth_bucket_stats


def _torch_smooth(stats, window):
    half = (len(window) - 1) // 2
    t = torch.tensor(stats, dtype=torch.float32)
    w = torch.tensor(np.asarray(window), dtype=torch.float32)
    out = F.conv1d(
        input=F.pad(t.unsqueeze(1).permute(2, 1, 0), pad=(half, half), mode="reflect"),
        weight=w.view(1, 1, -1), padding=0,
    ).permute(2, 1, 0).squeeze(1)
    return out.numpy()


@pytest.mark.parametrize("kernel,ks,sigma", [("gaussian", 5, 2.0), ("triang", 9, 2.0), ("laplace", 7, 1.5)])
@pytest.mark.parametrize("b,d", [(100, 32), (50, 16), (93, 8)])
def test_smooth_matches_torch_conv1d(rng, kernel, ks, sigma, b, d):
    stats = rng.normal(size=(b, d)).astype(np.float32)
    window = get_fds_kernel_window(kernel, ks, sigma)
    got = np.asarray(smooth_bucket_stats(stats, window))
    np.testing.assert_allclose(got, _torch_smooth(stats, window), rtol=1e-5, atol=1e-6)


def test_smooth_asymmetric_window(rng):
    # guard against accidental correlation/convolution flip
    stats = rng.normal(size=(20, 4)).astype(np.float32)
    window = np.array([0.7, 0.2, 0.1], dtype=np.float32)
    got = np.asarray(smooth_bucket_stats(stats, window))
    np.testing.assert_allclose(got, _torch_smooth(stats, window), rtol=1e-5, atol=1e-6)

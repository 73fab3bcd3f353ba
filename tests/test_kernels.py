"""Golden tests for LDS/FDS kernel windows — bit-comparable with the
reference's scipy recipes (imdb-wiki-dir/utils.py:110-122, fds.py:37-52)."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d
from scipy.signal.windows import triang

from imbalanced_regression_tpu.ops import get_fds_kernel_window, get_lds_kernel_window

KS_SIGMA = [(5, 2.0), (5, 1.0), (9, 2.0), (9, 1.0), (7, 3.0), (1, 2.0), (3, 0.5)]


@pytest.mark.parametrize("ks,sigma", KS_SIGMA)
def test_lds_gaussian(ks, sigma):
    half = (ks - 1) // 2
    base = [0.0] * half + [1.0] + [0.0] * half
    expected = gaussian_filter1d(base, sigma=sigma) / max(gaussian_filter1d(base, sigma=sigma))
    np.testing.assert_array_equal(get_lds_kernel_window("gaussian", ks, sigma), expected)


@pytest.mark.parametrize("ks,sigma", KS_SIGMA)
def test_lds_triang(ks, sigma):
    np.testing.assert_array_equal(get_lds_kernel_window("triang", ks, sigma), triang(ks))


@pytest.mark.parametrize("ks,sigma", KS_SIGMA)
def test_lds_laplace(ks, sigma):
    half = (ks - 1) // 2
    lap = lambda x: np.exp(-abs(x) / sigma) / (2.0 * sigma)
    vals = list(map(lap, np.arange(-half, half + 1)))
    expected = vals / max(vals)
    np.testing.assert_allclose(get_lds_kernel_window("laplace", ks, sigma), expected, rtol=0, atol=0)


@pytest.mark.parametrize("ks,sigma", KS_SIGMA)
def test_fds_gaussian(ks, sigma):
    half = (ks - 1) // 2
    base = np.array([0.0] * half + [1.0] + [0.0] * half, dtype=np.float32)
    expected = gaussian_filter1d(base, sigma=sigma) / sum(gaussian_filter1d(base, sigma=sigma))
    np.testing.assert_array_equal(get_fds_kernel_window("gaussian", ks, sigma), expected)


@pytest.mark.parametrize("ks,sigma", KS_SIGMA)
def test_fds_triang_laplace(ks, sigma):
    np.testing.assert_array_equal(get_fds_kernel_window("triang", ks, sigma), triang(ks) / sum(triang(ks)))
    half = (ks - 1) // 2
    lap = lambda x: np.exp(-abs(x) / sigma) / (2.0 * sigma)
    vals = list(map(lap, np.arange(-half, half + 1)))
    np.testing.assert_allclose(get_fds_kernel_window("laplace", ks, sigma), vals / sum(vals))


def test_normalization_contract():
    # LDS windows peak at 1; FDS windows sum to 1 (SURVEY.md §2 deltas)
    for kernel in ("gaussian", "triang", "laplace"):
        assert np.isclose(max(get_lds_kernel_window(kernel, 9, 2)), 1.0)
        assert np.isclose(sum(get_fds_kernel_window(kernel, 9, 2)), 1.0)


def test_invalid_args():
    with pytest.raises(ValueError):
        get_lds_kernel_window("box", 5, 2)
    with pytest.raises(ValueError):
        get_lds_kernel_window("gaussian", 4, 2)

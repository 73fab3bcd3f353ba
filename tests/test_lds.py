"""Golden tests for LDS effective-density sample weights against sequential
oracles following the reference algorithms (datasets.py:55-83, tasks.py:44-73,
loaddata.py:29-53)."""

import numpy as np
import pytest
from scipy.ndimage import convolve1d

from imbalanced_regression_tpu.ops import (
    bin_index_hist_np,
    get_lds_kernel_window,
    prepare_weights_age,
    prepare_weights_depth,
    prepare_weights_hist,
)


def _age_oracle(labels, reweight, max_target, lds, kernel, ks, sigma):
    value_dict = {x: 0 for x in range(max_target)}
    for label in labels:
        value_dict[min(max_target - 1, int(label))] += 1
    if reweight == "sqrt_inv":
        value_dict = {k: np.sqrt(v) for k, v in value_dict.items()}
    elif reweight == "inverse":
        value_dict = {k: np.clip(v, 5, 1000) for k, v in value_dict.items()}
    num_per_label = [value_dict[min(max_target - 1, int(label))] for label in labels]
    if not len(num_per_label) or reweight == "none":
        return None
    if lds:
        window = get_lds_kernel_window(kernel, ks, sigma)
        smoothed = convolve1d(np.asarray([v for _, v in value_dict.items()]), weights=window, mode="constant")
        num_per_label = [smoothed[min(max_target - 1, int(label))] for label in labels]
    weights = [np.float32(1 / x) for x in num_per_label]
    scaling = len(weights) / np.sum(weights)
    return np.asarray([scaling * x for x in weights])


@pytest.mark.parametrize("reweight", ["sqrt_inv", "inverse"])
@pytest.mark.parametrize("lds", [False, True])
def test_age_weights(rng, reweight, lds):
    # imbalanced synthetic ages incl. out-of-range 130 (clipped to max-1)
    labels = np.concatenate([
        rng.integers(20, 40, size=500), rng.integers(0, 121, size=100), [130.0, 0.0, 120.0]
    ]).astype(np.float32)
    got = prepare_weights_age(labels, reweight, 121, lds, "gaussian", 5, 2)
    want = _age_oracle(labels, reweight, 121, lds, "gaussian", 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert np.isclose(np.mean(got), 1.0, rtol=1e-5)  # mean-1 rescale


def test_age_weights_none():
    assert prepare_weights_age([1, 2, 3], "none") is None
    with pytest.raises(ValueError):
        prepare_weights_age([1, 2], "none", lds=True)
    with pytest.raises(ValueError):
        prepare_weights_age([1, 2], "bogus")


def _hist_oracle(targs, reweight, bins, lds, kernel, ks, sigma):
    value_lst, bins_edges = np.histogram(targs, bins=bins, range=(0.0, 5.0))

    def get_bin_idx(label):
        if label == 5.0:
            return bins - 1
        return np.where(bins_edges > label)[0][0] - 1

    if reweight == "sqrt_inv":
        value_lst = [np.sqrt(x) for x in value_lst]
    num_per_label = [value_lst[get_bin_idx(label)] for label in targs]
    if lds:
        window = get_lds_kernel_window(kernel, ks, sigma)
        smoothed = convolve1d(value_lst, weights=window, mode="constant")
        num_per_label = [smoothed[get_bin_idx(label)] for label in targs]
    weights = [np.float32(1 / x) for x in num_per_label]
    scaling = len(weights) / np.sum(weights)
    return np.asarray([scaling * x for x in weights])


@pytest.mark.parametrize("reweight", ["sqrt_inv", "inverse"])
@pytest.mark.parametrize("lds", [False, True])
def test_hist_weights(rng, reweight, lds):
    targs = np.concatenate([
        rng.uniform(0, 5, size=400).astype(np.float32),
        np.array([0.0, 5.0, 2.6, 0.3, 4.999], dtype=np.float32),
        rng.choice(np.arange(0, 5.01, 0.2), size=200).astype(np.float32),
    ])
    got = prepare_weights_hist(targs, reweight, 50, (0.0, 5.0), lds, "gaussian", 5, 2)
    want = _hist_oracle(list(targs), reweight, 50, lds, "gaussian", 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hist_bin_boundaries():
    # float32-edge semantics: float32(2.6) == float32 edge 2.6 (not >) → bin 26
    assert bin_index_hist_np([np.float32(2.6)], 50)[0] == 26
    assert bin_index_hist_np([5.0], 50)[0] == 49
    assert bin_index_hist_np([0.0], 50)[0] == 0
    # float32(0.1) == float32 edge 0.1 → falls in bin 1 (edge not strictly >)
    assert bin_index_hist_np([np.float32(0.1)], 50)[0] == 1
    assert bin_index_hist_np([np.float32(4.999)], 50)[0] == 49
    # bucket_start floor
    assert bin_index_hist_np([0.0], 50, bucket_start=3)[0] == 3


def _depth_oracle(bucket_counts, args_reweight, args_lds, bucket_start, bucket_num, kernel, ks, sigma):
    TRAIN_BUCKET_NUM = list(bucket_counts)
    if args_lds:
        value_lst = TRAIN_BUCKET_NUM[bucket_start:]
        window = get_lds_kernel_window(kernel, ks, sigma)
        if args_reweight == "sqrt_inv":
            value_lst = np.sqrt(value_lst)
        smoothed_value = convolve1d(np.asarray(value_lst), weights=window, mode="reflect")
        smoothed_value = [smoothed_value[0]] * bucket_start + list(smoothed_value)
        scaling = np.sum(TRAIN_BUCKET_NUM) / np.sum(np.array(TRAIN_BUCKET_NUM) / np.array(smoothed_value))
        return np.asarray([np.float32(scaling / smoothed_value[b]) for b in range(bucket_num)])
    value_lst = [TRAIN_BUCKET_NUM[bucket_start]] * bucket_start + TRAIN_BUCKET_NUM[bucket_start:]
    if args_reweight == "sqrt_inv":
        value_lst = np.sqrt(value_lst)
    scaling = np.sum(TRAIN_BUCKET_NUM) / np.sum(np.array(TRAIN_BUCKET_NUM) / np.array(value_lst))
    return np.asarray([np.float32(scaling / value_lst[b]) for b in range(bucket_num)])


@pytest.mark.parametrize("reweight", ["sqrt_inv", "inverse"])
@pytest.mark.parametrize("lds", [False, True])
def test_depth_weights(rng, reweight, lds):
    # plain python int list, like the reference's hardcoded TRAIN_BUCKET_NUM
    counts = [0] * 7 + [int(x) for x in rng.integers(1e4, 1e8, size=93)]
    got = prepare_weights_depth(counts, reweight, 100, 7, lds, "gaussian", 5, 2)
    want = _depth_oracle(counts, reweight, lds, 7, 100, "gaussian", 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)

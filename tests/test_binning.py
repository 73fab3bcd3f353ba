"""Boundary-exact binning tests (SURVEY.md §7 'exact binning at boundaries')."""

import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.ops import bin_index_age, bin_index_depth, bin_index_hist_np


def test_hist_matches_reference_formula(rng):
    bins = 50
    _, edges = np.histogram(np.array([], dtype=np.float32), bins=bins, range=(0.0, 5.0))

    def ref(label):
        label = np.float32(label)
        if label == 5.0:
            return bins - 1
        return max(np.where(edges > label)[0][0] - 1, 0)

    labels = np.concatenate([
        rng.uniform(0, 5, 500).astype(np.float32),
        np.arange(0, 5.0001, 0.1, dtype=np.float32),
        np.array([5.0, 0.0, 2.6, 2.5999999, 4.9999995], dtype=np.float32),
    ])
    got = bin_index_hist_np(labels, bins)
    want = np.array([ref(l) for l in labels])
    np.testing.assert_array_equal(got, want)


def test_depth_truncation():
    # min(int(x * float32(10)), 99) semantics (nyud2-dir/util.py:85-86)
    x = np.array([0.0, 0.09, 0.71, 9.99, 10.0, 25.0], dtype=np.float32)
    want = [min(int(v * np.float32(10)), 99) for v in x]
    np.testing.assert_array_equal(bin_index_depth(x, 100, 0), want)
    # jnp path identical
    np.testing.assert_array_equal(np.asarray(bin_index_depth(jnp.asarray(x), 100, 0)), want)
    # FDS lower clamp at bucket_start=7
    np.testing.assert_array_equal(np.asarray(bin_index_depth(jnp.asarray(x), 100, 7)),
                                  np.maximum(want, 7))


def test_age_truncation():
    x = np.array([0.0, 45.0, 120.0, 130.0, 45.7], dtype=np.float32)
    np.testing.assert_array_equal(bin_index_age(x, 121), [0, 45, 120, 120, 45])

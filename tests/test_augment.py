"""On-device augmentation semantics vs the torchvision reference transforms
(imdb-wiki-dir/datasets.py:38-53)."""

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.augment import (
    normalize_only,
    random_crop_flip_normalize,
    to_unit_float,
)


def test_normalize_only_matches_torchvision(rng):
    x = rng.random((4, 8, 8, 3)).astype(np.float32)
    got = np.asarray(normalize_only(jnp.asarray(x)))
    np.testing.assert_allclose(got, (x - 0.5) / 0.5, rtol=1e-6)


def test_uint8_path():
    x = np.full((2, 4, 4, 3), 255, np.uint8)
    np.testing.assert_allclose(np.asarray(normalize_only(jnp.asarray(x))), 1.0)
    np.testing.assert_allclose(np.asarray(to_unit_float(jnp.asarray(x))), 1.0)


def test_crop_shape_and_range(rng):
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    out = np.asarray(random_crop_flip_normalize(jax.random.key(0), jnp.asarray(x), padding=4))
    assert out.shape == x.shape
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_crop_is_shift_of_padded(rng):
    """Each output must be a crop of the zero-padded input (possibly flipped)."""
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    pad = 2
    out = np.asarray(random_crop_flip_normalize(jax.random.key(3), jnp.asarray(x), padding=pad))
    out = out * 0.5 + 0.5  # undo normalize
    padded = np.pad(x[0], ((pad, pad), (pad, pad), (0, 0)))
    candidates = []
    for oy in range(2 * pad + 1):
        for ox in range(2 * pad + 1):
            crop = padded[oy : oy + 8, ox : ox + 8]
            candidates.append(crop)
            candidates.append(crop[:, ::-1])
    assert any(np.allclose(out[0], c, atol=1e-6) for c in candidates)


def test_augment_randomness_per_sample(rng):
    x = np.tile(rng.random((1, 16, 16, 3)).astype(np.float32), (16, 1, 1, 1))
    out = np.asarray(random_crop_flip_normalize(jax.random.key(0), jnp.asarray(x)))
    # identical inputs, per-sample random crops → outputs differ across batch
    assert not all(np.allclose(out[0], out[i]) for i in range(1, 16))

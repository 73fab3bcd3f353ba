"""On-device image augmentation (TPU-native input pipeline).

The reference augments on 32 CPU worker processes via torchvision
(``imdb-wiki-dir/datasets.py:38-53``: Resize → RandomCrop(pad 16) →
RandomHorizontalFlip → Normalize(.5, .5)). Host-side per-sample Python
augmentation is the classic input-bound trap on TPU; here the random crop /
flip / normalize run *inside the jit train step* on the device (resize happens
once at load time). All ops are static-shape: pad + dynamic_slice + where.

Inputs are float32 [N, H, W, C] in [0, 1] (the ToTensor convention); output
is normalized to [-1, 1] like Normalize([.5,.5,.5], [.5,.5,.5])."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_unit_float(images: jax.Array) -> jax.Array:
    """uint8 [0,255] → float32 [0,1] on device (ship bytes over PCIe, cast on
    chip — 4x less host→device traffic than float32 upload)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


def random_crop_flip_normalize(rng: jax.Array, images: jax.Array, padding: int = 16) -> jax.Array:
    """Per-sample random crop from zero-padded images + horizontal flip +
    (-0.5)/0.5 normalization, vectorized over the batch.

    Implementation notes (both measured on v5e): a fancy-indexed batched
    gather lowers to a scatter/gather that costs ~137 ms/step at batch 128 —
    vmap'd dynamic_slice plus one whole-batch reverse+select is ~10x
    cheaper."""
    images = to_unit_float(images)
    n, h, w, c = images.shape
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    padded = jnp.pad(images, pad)  # zeros, like torchvision RandomCrop default

    rng_y, rng_x, rng_f = jax.random.split(rng, 3)
    offs_y = jax.random.randint(rng_y, (n,), 0, 2 * padding + 1)
    offs_x = jax.random.randint(rng_x, (n,), 0, 2 * padding + 1)
    flips = jax.random.bernoulli(rng_f, 0.5, (n,))

    crop = lambda img, oy, ox: jax.lax.dynamic_slice(img, (oy, ox, 0), (h, w, c))
    cropped = jax.vmap(crop)(padded, offs_y, offs_x)
    out = jnp.where(flips[:, None, None, None], cropped[:, :, ::-1, :], cropped)
    return (out - 0.5) / 0.5


def normalize_only(images: jax.Array) -> jax.Array:
    """Eval-path transform: Normalize([.5]*3, [.5]*3) only."""
    return (to_unit_float(images) - 0.5) / 0.5

"""NYUD2-DIR data pipeline: paired image/depth transforms, per-pixel LDS
weights, FDS subset, synthetic stand-in.

Reference: ``nyud2-dir/loaddata.py`` + ``nyu_transform.py``. Host side keeps
the *geometric* paired augmentation (scale-240 with nearest-neighbor depth,
flip, ±5° rotation, center crop 304x228 with depth at 152x114); the
*photometric* augmentation (PCA lighting, color jitter) and ImageNet
normalization run on device inside the jit step
(:func:`nyud2_train_photometric`) — same distributions, TPU-side execution.
Per-pixel LDS weights are evaluated on device from the per-bucket table
(:func:`ops.lds.prepare_weights_depth`) instead of shipping a [N, H, W]
weight array from the host.

``TRAIN_BUCKET_NUM`` is the reference's precomputed global pixel histogram
over the full NYUD2 train set (``loaddata.py:11-19``) — a data artifact
reproduced verbatim for parity.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from imbalanced_regression_tpu.data.augment import to_unit_float

logger = logging.getLogger(__name__)

# Global per-bucket pixel counts of the NYUD2 train split (loaddata.py:11-19).
TRAIN_BUCKET_NUM = [
    0, 0, 0, 0, 0, 0, 0, 25848691, 24732940, 53324326, 69112955, 54455432,
    95637682, 71403954, 117244217, 84813007, 126524456, 84486706, 133130272,
    95464874, 146051415, 146133612, 96561379, 138366677, 89680276, 127689043,
    81608990, 119121178, 74360607, 106839384, 97595765, 66718296, 90661239,
    53103021, 83340912, 51365604, 71262770, 42243737, 65860580, 38415940,
    53647559, 54038467, 28335524, 41485143, 32106001, 35936734, 23966211,
    32018765, 19297203, 31503743, 21681574, 16363187, 25743420, 12769509,
    17675327, 13147819, 15798560, 9547180, 14933200, 9663019, 12887283,
    11803562, 7656609, 11515700, 7756306, 9046228, 5114894, 8653419, 6859433,
    8001904, 6430700, 3305839, 6318461, 3486268, 5621065, 4030498, 3839488,
    3220208, 4483027, 2555777, 4685983, 3145082, 2951048, 2762369, 2367581,
    2546089, 2343867, 2481579, 1722140, 3018892, 2325197, 1952354, 2047038,
    1858707, 2052729, 1348558, 2487278, 1314198, 3338550, 1132666,
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
PCA_EIGVEC = np.array(
    [[-0.5675, 0.7192, 0.4009],
     [-0.5808, -0.0045, -0.8140],
     [-0.5836, -0.6948, 0.4203]], np.float32)


# ---------------------------------------------------------------------------
# device-side photometric augmentation
# ---------------------------------------------------------------------------


def imagenet_normalize(images):
    x = to_unit_float(images)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def nyud2_train_photometric(rng, images, lighting_std: float = 0.1, jitter: float = 0.4):
    """PCA lighting + brightness/contrast/saturation jitter + normalize,
    per sample, on device (host equivalents: nyu_transform.py:203-347)."""
    x = to_unit_float(images)
    n = x.shape[0]
    r_light, r_b, r_c, r_s = jax.random.split(rng, 4)

    alpha = jax.random.normal(r_light, (n, 3)) * lighting_std
    rgb = (alpha * PCA_EIGVAL) @ PCA_EIGVEC.T  # [N, 3]
    x = x + rgb[:, None, None, :]

    lum_w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

    b = jax.random.uniform(r_b, (n, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
    x = x * b
    c = jax.random.uniform(r_c, (n, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
    mean_lum = jnp.mean(jnp.tensordot(x, lum_w, axes=[[-1], [0]]), axis=(1, 2),
                        keepdims=True)[..., None]
    x = x * c + mean_lum * (1 - c)
    s = jax.random.uniform(r_s, (n, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
    gray = jnp.tensordot(x, lum_w, axes=[[-1], [0]])[..., None]
    x = x * s + gray * (1 - s)

    return (x - IMAGENET_MEAN) / IMAGENET_STD


def make_pixel_weight_fn(bucket_weights):
    """Device-side per-pixel weight lookup from the per-bucket LDS table
    (replaces host ``_get_weights``, loaddata.py:58-67). Returns None when
    re-weighting is off (uniform weights)."""
    if bucket_weights is None:
        return None
    table = jnp.asarray(bucket_weights, jnp.float32)

    def weight_fn(batch):
        from imbalanced_regression_tpu.ops.binning import bin_index_depth

        idx = bin_index_depth(batch["target"], table.shape[0], 0)
        return table[idx]

    return weight_fn


# ---------------------------------------------------------------------------
# host-side paired geometric pipeline (real data)
# ---------------------------------------------------------------------------


def _paired_train_sample(image, depth, rng, img_hw=(228, 304), depth_hw=(114, 152)):
    """PIL-based geometry matching nyu_transform.py: scale-240 (nearest for
    depth), random hflip, ±5° rotation, center crop, half-res depth."""
    from PIL import Image
    from scipy import ndimage

    image = _scale_short_side(image, 240, Image.BILINEAR)
    depth = _scale_short_side(depth, 240, Image.NEAREST)
    if rng.random() < 0.5:
        image = image.transpose(Image.FLIP_LEFT_RIGHT)
        depth = depth.transpose(Image.FLIP_LEFT_RIGHT)
    angle = rng.uniform(-5.0, 5.0)
    image = Image.fromarray(ndimage.rotate(np.asarray(image), angle, reshape=False, order=2))
    depth = Image.fromarray(ndimage.rotate(np.asarray(depth), angle, reshape=False, order=2))
    image = _center_crop(image, (img_hw[1], img_hw[0]))
    depth = _center_crop(depth, (img_hw[1], img_hw[0])).resize((depth_hw[1], depth_hw[0]))
    img = np.asarray(image, np.uint8)
    dep = np.asarray(depth, np.float32) / 255.0 * 10.0  # 8-bit train depth → meters
    return img, dep


def _scale_short_side(img, size, interpolation):
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, int(size * h / w)), interpolation)
    return img.resize((int(size * w / h), size), interpolation)


def _center_crop(img, size_wh):
    w, h = img.size
    tw, th = size_wh
    x1 = int(round((w - tw) / 2.0))
    y1 = int(round((h - th) / 2.0))
    return img.crop((x1, y1, tw + x1, th + y1))


def load_nyud2_split(data_dir: str, csv_name: str, train: bool, seed: int = 0,
                     mask_file: str | None = None, limit: int | None = None) -> dict:
    """Load a NYUD2 CSV split into arrays (images uint8 NHWC, depth f32 NHW1)."""
    import pandas as pd
    from PIL import Image

    frame = pd.read_csv(os.path.join(data_dir, csv_name), header=None)
    if limit:
        frame = frame.iloc[:limit]
    rng = np.random.default_rng(seed)
    images, depths = [], []
    for _, row in frame.iterrows():
        img_path = os.path.join(data_dir, "/".join(str(row[0]).split("/")[1:]))
        dep_path = os.path.join(data_dir, "/".join(str(row[1]).split("/")[1:]))
        with Image.open(img_path) as im, Image.open(dep_path) as dp:
            if train:
                img, dep = _paired_train_sample(im, dp, rng)
            else:
                im2 = _center_crop(_scale_short_side(im, 240, Image.BILINEAR), (304, 228))
                dp2 = _center_crop(_scale_short_side(dp, 240, Image.NEAREST), (304, 228))
                img = np.asarray(im2, np.uint8)
                dep = np.asarray(dp2, np.float32) / 1000.0  # 16-bit test depth
        images.append(img)
        depths.append(dep)
    out = {"input": np.stack(images), "target": np.stack(depths)[..., None]}
    if mask_file:
        out["mask"] = np.load(os.path.join(data_dir, mask_file))
    return out


# ---------------------------------------------------------------------------
# synthetic stand-in
# ---------------------------------------------------------------------------


def synthetic_depth_dataset(n: int, img_hw=(64, 96), depth_hw=(32, 48), seed: int = 0) -> dict:
    """Images with depth-correlated gradients; depths in [0.7, 10] m with an
    imbalanced (exponential-ish) distribution like real indoor scenes."""
    rng = np.random.default_rng(seed)
    h, w = depth_hw
    base = rng.uniform(0.7, 4.0, size=(n, 1, 1)).astype(np.float32)
    slope = rng.uniform(0.0, 6.0, size=(n, 1, 1)).astype(np.float32)
    yy = np.linspace(0, 1, h, dtype=np.float32)[None, :, None]
    depth = np.clip(base + slope * yy + 0.1 * rng.normal(size=(n, h, w)).astype(np.float32),
                    0.7, 10.0)
    ih, iw = img_hw
    img_small = (depth - 0.7) / 9.3
    img = np.repeat(np.repeat(img_small, ih // h, axis=1), iw // w, axis=2)
    img = np.stack([img, 1 - img, img**2], axis=-1)
    img = (img * 255 + rng.normal(0, 8, size=img.shape)).clip(0, 255).astype(np.uint8)
    return {"input": img, "target": depth[..., None].astype(np.float32)}

"""Age-suite (IMDB-WIKI-DIR / AgeDB-DIR) data pipeline.

CSV-driven like the reference (``imdb-wiki-dir/datasets.py:14-53``): a meta
file with ``age,path,split`` columns points at face images. Differences from
the reference pipeline, by design:

- images are decoded/resized once on the host and cached as **uint8** NHWC
  arrays; per-step augmentation (random crop / flip / normalize) runs on
  device inside the jit step (``data/augment.py``) instead of on 32 CPU
  worker processes;
- host→device transfer ships uint8 (4x less PCIe traffic).

LDS/re-weighting enters here as per-sample weights
(:func:`ops.lds.prepare_weights_age`), exactly the reference's
``_prepare_weights`` semantics."""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from imbalanced_regression_tpu.ops.lds import prepare_weights_age

logger = logging.getLogger(__name__)


def load_split(df: pd.DataFrame, data_dir: str, img_size: int, workers: int = 8) -> dict:
    """Decode and resize one split's images into a uint8 [N,H,W,3] array via
    the native multithreaded libjpeg loader (PIL fallback per image)."""
    from imbalanced_regression_tpu.data.native_loader import decode_resize_batch

    paths = [os.path.join(data_dir, p) for p in df["path"]]
    return {
        "input": decode_resize_batch(paths, img_size, threads=workers),
        "target": df["age"].to_numpy(dtype=np.float32)[:, None],
    }


def load_age_datasets(config) -> tuple[dict, dict, dict, np.ndarray]:
    """Returns (train, val, test) dict datasets + raw train labels.

    ``train['weight']`` carries the LDS / re-weighting per-sample weights
    (ones when ``reweight == 'none'``, like the reference's weight fallback,
    ``datasets.py:34``)."""
    csv_path = os.path.join(config.data_dir, f"{config.dataset}.csv")
    if not os.path.exists(csv_path):
        raise FileNotFoundError(
            f"Meta CSV {csv_path!r} not found. Build it with tools/create_age_meta.py "
            f"+ tools/make_balanced_splits.py, or pass --synthetic_size N for a "
            f"synthetic stand-in."
        )
    df = pd.read_csv(csv_path)
    splits = {s: df[df["split"] == s] for s in ("train", "val", "test")}
    logger.info("Loaded %s: train=%d val=%d test=%d", csv_path,
                *(len(splits[s]) for s in ("train", "val", "test")))

    datasets = {
        s: load_split(splits[s], config.data_dir, config.img_size, config.workers)
        for s in ("train", "val", "test")
    }
    train_labels = splits["train"]["age"].to_numpy()

    weights = prepare_weights_age(
        train_labels, config.reweight, max_target=config.max_target,
        lds=config.lds, lds_kernel=config.lds_kernel, lds_ks=config.lds_ks, lds_sigma=config.lds_sigma,
    )
    n = len(train_labels)
    datasets["train"]["weight"] = (
        weights[:, None].astype(np.float32) if weights is not None else np.ones((n, 1), np.float32)
    )
    return datasets["train"], datasets["val"], datasets["test"], train_labels

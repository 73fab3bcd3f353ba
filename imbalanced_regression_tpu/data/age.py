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

import numpy as np
import pandas as pd

from imbalanced_regression_tpu.ops.lds import prepare_weights_age

logger = logging.getLogger(__name__)


def load_split(df: pd.DataFrame, data_dir: str, img_size: int, workers: int = 8,
               mode: str = "ram", cache_dir: str | None = None) -> dict:
    """One split as ``{'input', 'target'}``. ``mode`` picks the image
    representation (``data/streaming.py``): ``ram`` decodes everything now
    (round-1 behavior), ``mmap`` decodes once into an on-disk uint8 cache and
    memory-maps it, ``stream`` returns a decode-on-access
    :class:`LazyImageArray` — all three index identically downstream."""
    from imbalanced_regression_tpu.data.native_loader import decode_resize_batch
    from imbalanced_regression_tpu.data.streaming import LazyImageArray, build_mmap_cache

    paths = [os.path.join(data_dir, p) for p in df["path"]]
    if mode == "stream":
        images = LazyImageArray(paths, img_size, threads=workers)
    elif mode == "mmap":
        images = build_mmap_cache(paths, img_size, cache_dir or os.path.join(data_dir, "_cache"),
                                  threads=workers)
    else:
        images = decode_resize_batch(paths, img_size, threads=workers)
    return {
        "input": images,
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

    from imbalanced_regression_tpu.data.streaming import choose_data_mode

    mode = choose_data_mode(
        sum(len(splits[s]) for s in splits), config.img_size,
        getattr(config, "data_mode", "auto"), getattr(config, "ram_budget_gb", 8.0),
    )
    if mode != "ram":
        logger.info("Bounded-memory image mode: %s", mode)
    datasets = {
        s: load_split(splits[s], config.data_dir, config.img_size, config.workers,
                      mode=mode, cache_dir=getattr(config, "cache_dir", "") or None)
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

"""Static-shape batching for jit-friendly training.

XLA compiles one program per shape, so every batch must be identical:
training shuffles and drops the remainder (the reference trains with
``drop_last=False`` but varying shapes would retrigger TPU compilation every
final batch — dropping <1 batch/epoch is the TPU-native trade);
evaluation pads the final batch and carries a ``count`` so metrics ignore the
padding."""

from __future__ import annotations

from typing import Iterator

import numpy as np


def batch_iterator(
    data: dict,
    batch_size: int,
    *,
    shuffle: bool = True,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Yield dict batches from a dict of equal-length arrays."""
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield {k: v[sel] for k, v in data.items()}


def eval_batches(data: dict, batch_size: int) -> Iterator[dict]:
    """Fixed-shape eval batches: the final batch is padded by repeating its
    first row and annotated with the true ``count``."""
    n = len(next(iter(data.values())))
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        batch = {k: v[start:stop] for k, v in data.items()}
        count = stop - start
        if count < batch_size:
            pad = batch_size - count
            batch = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)]) for k, v in batch.items()}
        batch["count"] = count
        yield batch

"""Static-shape batching for jit-friendly training.

XLA compiles one program per shape, so every batch must be identical:
training shuffles and drops the remainder (the reference trains with
``drop_last=False`` but varying shapes would retrigger TPU compilation every
final batch — dropping <1 batch/epoch is the TPU-native trade);
evaluation pads the final batch and carries a ``count`` so metrics ignore the
padding. Batch dicts may be nested (e.g. STS-B's token/mask pairs) — all
leaves are indexed along their leading axis."""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np


def _num_examples(data: dict) -> int:
    return len(jax.tree.leaves(data)[0])


def _take(data: dict, sel) -> dict:
    return jax.tree.map(lambda v: v[sel], data)


def index_iterator(
    n: int,
    batch_size: int,
    *,
    shuffle: bool = True,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Yield index batches over ``n`` rows — the single source of batch
    order, shared by the gathering and index-only iterators so both see the
    identical shuffle stream from the same rng."""
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        yield idx[start : start + batch_size]


def batch_iterator(
    data: dict,
    batch_size: int,
    *,
    shuffle: bool = True,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Yield dict batches from a (possibly nested) dict of equal-length arrays."""
    n = _num_examples(data)
    for idx in index_iterator(n, batch_size, shuffle=shuffle, rng=rng,
                              drop_last=drop_last):
        yield _take(data, idx)


def infinite_index_batches(
    n: int, batch_size: int, seed: int, start_batches: int = 0
) -> Iterator[tuple[np.ndarray, int]]:
    """Endless reshuffled epochs of INDEX batches. Yields (idx, epoch_index).

    Index twin of :func:`infinite_batches` — identical shuffle stream (same
    ``(seed, epoch)`` rng draws, same drop-remainder batching), but yields
    the row indices instead of gathered rows, so callers with
    device-resident data can ship one tiny [batch] int32 vector per step
    instead of one host→device transfer per batch array."""
    # n < batch_size: drop-last would emit ZERO batches per epoch and the
    # generator would spin forever yielding nothing — fall back to one short
    # (size n, still static-shape) batch per epoch instead
    drop_last = n >= batch_size
    n_batches = max(n // batch_size, 1)
    epoch = start_batches // n_batches
    skip = start_batches % n_batches
    while True:
        rng = np.random.default_rng((seed, epoch))
        for i, idx in enumerate(index_iterator(n, batch_size, shuffle=True, rng=rng,
                                               drop_last=drop_last)):
            if i >= skip:
                yield idx, epoch
        skip = 0
        epoch += 1


def infinite_batches(
    data: dict, batch_size: int, seed: int, start_batches: int = 0
) -> Iterator[dict]:
    """Endless reshuffled epochs (the STS-B trainer's generator semantics,
    ``sts-b-dir/trainer.py:83``). Yields (batch, epoch_index).

    Each epoch's shuffle derives from ``(seed, epoch)``, so a generator
    restarted with ``start_batches=k`` reproduces the uninterrupted stream
    from batch k exactly. The reference's resume fast-forward
    (``sts-b-dir/trainer.py:393-396``) is best-effort — it replays a fresh
    shuffle — so resumed reference runs see a different stream; here resume
    is bit-exact."""
    n = _num_examples(data)
    for idx, epoch in infinite_index_batches(n, batch_size, seed, start_batches):
        yield _take(data, idx), epoch


def eval_batches(data: dict, batch_size: int) -> Iterator[dict]:
    """Fixed-shape eval batches: the final batch is padded by repeating its
    first row and annotated with the true ``count``."""
    n = _num_examples(data)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        batch = _take(data, slice(start, stop))
        count = stop - start
        if count < batch_size:
            pad = batch_size - count
            batch = jax.tree.map(
                lambda v: np.concatenate([v, np.repeat(v[:1], pad, axis=0)]), batch
            )
        batch["count"] = count
        yield batch

"""Serving export: freeze a trained model into a portable StableHLO artifact.

The reference has no serving story (inference happens inside the training
scripts via ``--evaluate``, e.g. ``imdb-wiki-dir/train.py:103-110``). For
production deployment this module bakes a trained ``TrainState`` into a
self-contained compiled predictor:

- :func:`export_predictor` — close the eval step over the trained weights
  (params + BN stats; FDS never runs at inference, matching the reference's
  eval path), jit it for fixed batch/image shapes, and serialize with
  ``jax.export`` (StableHLO + embedded constants). Multi-platform lowering
  (``platforms=("cpu", "tpu")``) yields one artifact servable on either.
- :func:`load_predictor` — deserialize and return a callable; no framework
  state, no Python model code, no checkpoint directory needed at serving
  time.

CLI: ``python -m tools.export_model <checkpoint dir> <out.stablehlo> ...``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def make_infer_fn(trainer, state) -> Callable:
    """A pure ``batch_input -> predictions`` function with weights baked in.

    Applies the trainer's eval transform (e.g. ImageNet normalization) and
    the backbone+head in eval mode — identical math to
    ``Trainer.predict_batch`` minus host padding bookkeeping."""
    params = state.params
    batch_stats = state.batch_stats

    def infer(x):
        if trainer.eval_transform is not None:
            x = trainer.eval_transform(x)
        vars_in = {"params": params["backbone"], "batch_stats": batch_stats}
        encoding = trainer.backbone.apply(vars_in, x, train=False)
        return trainer.head.apply({"params": params["head"]}, encoding)

    return infer


def export_predictor(
    trainer,
    state,
    sample_input,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> bytes:
    """Serialize the frozen predictor for the given input shape/dtype.

    ``sample_input`` fixes the serving signature — an array (batch, H, W, C)
    for the image tasks or a pytree of arrays (STS-B's token/mask dict). XLA
    serves one compiled program per shape, the same static-shape rule the
    training stack follows."""
    import jax
    from jax import export as jexport

    infer = make_infer_fn(trainer, state)
    spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        sample_input,
    )
    exp = jexport.export(jax.jit(infer), platforms=tuple(platforms))(spec)
    return exp.serialize()


def load_predictor(blob: bytes) -> Callable[[np.ndarray], np.ndarray]:
    """Deserialize an exported predictor into ``input -> predictions``."""
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(blob))

    def predict(x):
        return np.asarray(exp.call(x))

    predict.in_shape = tuple(exp.in_avals[0].shape)  # type: ignore[attr-defined]
    predict.in_avals = exp.in_avals  # type: ignore[attr-defined]
    predict.platforms = exp.platforms  # type: ignore[attr-defined]
    return predict


def save_predictor(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_predictor_file(path: str) -> Callable[[np.ndarray], np.ndarray]:
    with open(path, "rb") as f:
        return load_predictor(f.read())

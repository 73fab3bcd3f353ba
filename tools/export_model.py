"""Export a trained checkpoint as a self-contained serving artifact.

Builds the task's model, restores the checkpoint, and writes a StableHLO
predictor (``imbalanced_regression_tpu/serving.py``) that serves without any
framework code or checkpoint directory. See the reference's in-script-only
eval (``imdb-wiki-dir/train.py:103-110``) for the behavior being packaged.

Usage::

    python -m tools.export_model <checkpoint dir> <out.stablehlo> \
        [--task age|nyud2] [--batch 8] [--img_size 224] [--which best] \
        [--platforms cpu tpu]

Smoke-load the artifact::

    python -m tools.export_model --load <out.stablehlo> --batch 8
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_task(task: str, config_overrides: dict):
    import jax

    from imbalanced_regression_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(1)
    if task == "age":
        from imbalanced_regression_tpu.tasks.age import build_trainer
        from imbalanced_regression_tpu.utils.config import ExperimentConfig

        config = ExperimentConfig(**config_overrides)
        trainer = build_trainer(config, mesh)
        sample = np.zeros((2, config.img_size, config.img_size, 3), np.float32)
    elif task == "nyud2":
        from imbalanced_regression_tpu.tasks.nyud2 import NYUDConfig, build_nyud_trainer

        config = NYUDConfig(**config_overrides)
        trainer = build_nyud_trainer(config, mesh)
        sample = np.zeros((2, 228, 304, 3), np.float32)
    else:
        raise ValueError(f"unsupported task {task!r}")
    state = trainer.init_state(jax.random.key(0), sample[:2])
    return trainer, state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint", nargs="?", help="checkpoint dir (Orbax latest/best)")
    p.add_argument("out", nargs="?", help="output artifact path")
    p.add_argument("--task", default="age", choices=["age", "nyud2"])
    p.add_argument("--which", default="best", choices=["best", "latest"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--platforms", nargs="*", default=["cpu", "tpu"])
    p.add_argument("--input_dtype", default=None, choices=["uint8", "float32"],
                   help="serving input dtype. uint8 (age default) bakes the "
                   "cast+normalize into the graph — the training pipeline's "
                   "device-side math (data/augment.py) — and cuts the "
                   "host->device transfer 4x vs float32")
    p.add_argument("--load", default="", help="smoke-load an artifact instead")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (the TPU admits ONE process; "
                   "don't attach for a smoke-load while training holds it)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    input_dtype = np.dtype(args.input_dtype or
                           ("uint8" if args.task == "age" else "float32"))

    if args.load:
        from imbalanced_regression_tpu.serving import load_predictor_file

        predict = load_predictor_file(args.load)
        aval = predict.data_avals[0]
        x = np.zeros((args.batch,) + tuple(aval.shape[1:]), aval.dtype)
        y = predict(x)
        print(f"loaded {args.load}: platforms={predict.platforms} "
              f"in={predict.in_shape} dtype={aval.dtype} out={y.shape}")
        return

    if not (args.checkpoint and args.out):
        p.error("checkpoint and out are required unless --load is given")

    from imbalanced_regression_tpu.serving import export_predictor, save_predictor
    from imbalanced_regression_tpu.utils.checkpoint import restore_checkpoint

    trainer, state = build_task(args.task, {"img_size": args.img_size}
                                if args.task == "age" else {})
    state, epoch, best = restore_checkpoint(args.checkpoint, state, which=args.which)
    sample = np.zeros((args.batch, args.img_size, args.img_size, 3), input_dtype) \
        if args.task == "age" else np.zeros((args.batch, 228, 304, 3), input_dtype)
    blob = export_predictor(trainer, state, sample, platforms=args.platforms)
    save_predictor(args.out, blob)
    print(f"exported {args.task} (epoch {epoch}, best {best}) for "
          f"{tuple(sample.shape)} on {args.platforms}: {len(blob):,} bytes -> {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])

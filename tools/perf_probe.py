"""Consolidated TPU performance probe for the flagship ResNet-50 train step.

Measures steady-state step time for a configuration matrix (batch size x
augmentation x FDS) plus the FDS kernel microbenchmarks, and prints one JSON
report. Run on a quiet TPU (single process!); each configuration pays one
compile. Used to choose bench.py's configuration and to track perf across
rounds.

Usage: python -m tools.perf_probe [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def time_train_step(batch_size, use_augment, use_fds, steps=10, warmup=3, remat=None):
    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.data.augment import random_crop_flip_normalize
    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.models.resnet import RegressionHead, resnet50_backbone
    from imbalanced_regression_tpu.parallel.mesh import create_mesh, shard_batch
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    mesh = create_mesh()
    trainer = Trainer(
        resnet50_backbone(dtype=jnp.bfloat16, remat=remat), RegressionHead(),
        TrainerConfig(loss="l1"),
        fds_config=FDSConfig.for_age(2048, start_smooth=0) if use_fds else None,
        mesh=mesh,
        train_augment=random_crop_flip_normalize if use_augment else None,
    )
    rng = np.random.default_rng(0)
    batch = {
        "input": (rng.random((batch_size, 224, 224, 3)) * 255).astype(np.uint8)
        if use_augment else rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32),
        "target": rng.integers(0, 100, size=(batch_size, 1)).astype(np.float32),
        "weight": np.ones((batch_size, 1), np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2].astype(np.float32))
    trainer._jit()
    sharded = shard_batch(mesh, batch)

    t0 = time.perf_counter()
    state, loss, _ = trainer._train_step(state, sharded, 1, 1e-3)
    float(loss)  # value fetch = the only reliable sync on this platform
    compile_s = time.perf_counter() - t0

    for _ in range(warmup):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-3)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-3)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return {"batch": batch_size, "augment": use_augment, "fds": use_fds,
            "remat": remat, "compile_s": round(compile_s, 1),
            "ms_per_step": round(dt * 1e3, 1),
            "img_per_sec_per_chip": round(batch_size / dt, 0)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="fewer configs")
    parser.add_argument("--remat", choices=["none", "conv_outs", "block"],
                        default="none",
                        help="backbone remat mode for the whole matrix "
                             "(A/B against the default by running twice)")
    args = parser.parse_args()
    remat = None if args.remat == "none" else args.remat

    configs = [(128, True, True), (128, False, True)]
    if not args.quick:
        configs += [(256, True, True), (128, True, False)]

    results = []
    for batch, aug, fds in configs:
        r = time_train_step(batch, aug, fds, remat=remat)
        print(json.dumps(r))
        results.append(r)
    best = max(results, key=lambda r: r["img_per_sec_per_chip"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()

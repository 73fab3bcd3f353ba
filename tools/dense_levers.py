"""Dense-path (NYUD2) throughput lever experiments.

The round-3 trace attribution (RESULTS.md) diagnosed the dense train step as
MXU-efficiency-bound: 90% of device time is convolutions, and the
decoder/MFF convs at high spatial resolution with narrow channel counts
(64/16 vs the 128-wide MXU lane dimension) cannot tile the systolic array
efficiently. This tool *measures* the levers that diagnosis names:

- ``mff32``: MFF per-scale channels 16 → 32 (concat 64 → 128 lanes);
- ``dmin128``: decoder channel floor 128 (the narrow 64-channel tail stages
  pad to a full MXU lane tile);
- ``both``: the two combined;
- ``batch64``: doubled batch (more implicit-GEMM rows per conv);
- ``hw256x320``: input padded from the reference's 228x304 center crop to
  256x320 so every feature-map extent stays a multiple of 8 sublanes
  (228/2 = 114 = 14.25 x 8 tiles ragged all the way down).

All except ``batch64`` change the *program*, and all except ``batch64`` /
``hw256x320`` change parameter shapes — these are throughput experiments
against the reference topology (``nyud2-dir/models/modules.py:6-174``), not
parity configurations. Per-image cost is normalized to the reference protocol
(img/s at the measured batch).

Run on a quiet TPU: ``python -m tools.dense_levers [--steps 10]``.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def time_dense_step(batch_size=32, hw=(228, 304), mff_features=16,
                    decoder_min_features=0, steps=10, warmup=3):
    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.data.nyud2 import (
        TRAIN_BUCKET_NUM,
        imagenet_normalize,
        make_pixel_weight_fn,
        nyud2_train_photometric,
    )
    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.models.depth_encdec import (
        DepthEncoderDecoder,
        DepthHead,
        depth_feature_dim,
    )
    from imbalanced_regression_tpu.ops.lds import prepare_weights_depth
    from imbalanced_regression_tpu.parallel.mesh import create_mesh, shard_batch
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    mesh = create_mesh()
    feat_dim = depth_feature_dim(2048, mff_features, decoder_min_features)
    bucket_weights = prepare_weights_depth(
        TRAIN_BUCKET_NUM, "inverse", bucket_num=100, bucket_start=7,
        lds=True, lds_kernel="gaussian", lds_ks=5, lds_sigma=2.0)
    trainer = Trainer(
        DepthEncoderDecoder(mff_features=mff_features,
                            decoder_min_features=decoder_min_features,
                            dtype=jnp.bfloat16),
        DepthHead(),
        TrainerConfig(loss="mse", lr=1e-4, adam_weight_decay=1e-4, schedule=()),
        fds_config=FDSConfig.for_depth(feature_dim=feat_dim, bucket_num=100,
                                       bucket_start=7, start_update=0,
                                       start_smooth=0),
        mesh=mesh,
        train_augment=nyud2_train_photometric,
        eval_transform=imagenet_normalize,
        weight_fn=make_pixel_weight_fn(bucket_weights),
    )
    rng = np.random.default_rng(0)
    h, w = hw
    batch = {
        "input": rng.normal(size=(batch_size, h, w, 3)).astype(np.float32),
        "target": (rng.random((batch_size, h // 2, w // 2, 1)) * 10).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2])
    trainer._jit()
    sharded = shard_batch(mesh, batch)

    t0 = time.perf_counter()
    state, loss, _ = trainer._train_step(state, sharded, 1, 1e-4)
    float(loss)  # value fetch = the only reliable sync on this platform
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-4)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-4)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return {"batch": batch_size, "hw": list(hw), "mff": mff_features,
            "dmin": decoder_min_features, "feat_dim": feat_dim,
            "compile_s": round(compile_s, 1), "ms_per_step": round(dt * 1e3, 1),
            "img_per_sec_per_chip": round(batch_size / dt, 1)}


VARIANTS = {
    "baseline": {},
    "mff32": {"mff_features": 32},
    "dmin128": {"decoder_min_features": 128},
    "both": {"mff_features": 32, "decoder_min_features": 128},
    "batch64": {"batch_size": 64},
    "hw256x320": {"hw": (256, 320)},
    # round-5 batch-scaling follow-ups to the round-4 batch64 positive: the
    # backward weight-grad convs contract over batch*spatial rows, so larger
    # batches deepen that reduction — measure whether efficiency keeps
    # climbing (batch128) and whether the 8-sublane-aligned input compounds
    # with it (batch64 @ 256x320)
    "batch128": {"batch_size": 128},
    "batch64_hw256x320": {"batch_size": 64, "hw": (256, 320)},
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", nargs="*", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--json", default="", help="append JSONL records here")
    args = p.parse_args(argv)
    out = []
    for name in args.variants:
        try:
            r = {"variant": name, **time_dense_step(steps=args.steps, **VARIANTS[name])}
        except Exception as e:  # e.g. HBM OOM at large batch — a result, not a crash
            r = {"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)
        out.append(r)
        if args.json:
            with open(args.json, "a") as fh:
                fh.write(json.dumps(r) + "\n")
    base = next((r for r in out if r.get("variant") == "baseline"
                 and "img_per_sec_per_chip" in r), None)
    if base:
        for r in out:
            if "img_per_sec_per_chip" in r:
                r["vs_baseline"] = round(r["img_per_sec_per_chip"]
                                         / base["img_per_sec_per_chip"], 3)
        print(json.dumps({"summary": {r["variant"]: r.get("vs_baseline", "error")
                                      for r in out}}))


if __name__ == "__main__":
    main()

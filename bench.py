"""Benchmark: flagship AgeDB/IMDB-WIKI configuration — ResNet-50 age regressor
with FDS feature calibration inside the jit train step (LDS weights enter as
per-sample weights) — images/sec/chip on the local TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline anchor: the PyTorch reference publishes no throughput numbers
(BASELINE.md); it trains ResNet-50 at batch 256 with torch DataParallel over
4 GPUs. REF_IMG_PER_SEC_PER_GPU below is the well-established per-V100
ResNet-50 training throughput (~350 img/s at 224x224, mixed precision off,
as the reference runs it) used as the denominator until the reference can be
profiled on identical hardware. vs_baseline = our img/s/chip ÷ that.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_IMG_PER_SEC_PER_GPU = 350.0  # documented estimate, see module docstring

# backbone remat mode override (None | 'conv_outs' | 'block'); measured on
# this chip and set to the fastest — see RESULTS.md remat A/B
REMAT = os.environ.get("DIR_TPU_REMAT") or None

BATCH = 128
IMG = 224
WARMUP = 5
STEPS = 20

_T0 = time.monotonic()


def hb(msg: str) -> None:
    """Heartbeat on STDERR (stdout carries only the final JSON line).

    The first device op after a previous TPU process exits can hang 5-10 min
    on remote re-attach (CLAUDE.md gotcha) — round 4's official bench timed
    out silently in exactly that window. Progress lines let the driver (and a
    human) distinguish 're-attaching, be patient' from 'dead'."""
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    # persistent compile cache: babysit/sweep runs populate it; a cold bench
    # process then deserializes the train-step executable instead of paying
    # the 20-60 s compile on top of the re-attach wait
    os.environ.setdefault(
        "DIR_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "runs", "jaxcache"),
    )
    from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache

    cache = enable_compilation_cache()
    hb(f"compilation cache: {cache}")

    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.models.resnet import RegressionHead, resnet50_backbone
    from imbalanced_regression_tpu.parallel.mesh import create_mesh
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    from imbalanced_regression_tpu.data.augment import random_crop_flip_normalize

    # touch the device FIRST with a trivial op so the (possibly multi-minute)
    # remote re-attach happens here, bracketed by heartbeats, not silently
    # inside the first real compile
    hb(f"attaching to {jax.default_backend()} device (may take minutes after "
       f"a previous TPU process exit)...")
    float(jnp.zeros(()))
    hb("device attached")

    mesh = create_mesh()
    num_chips = len(mesh.devices.reshape(-1))

    trainer = Trainer(
        resnet50_backbone(dtype=jnp.bfloat16, remat=REMAT),
        RegressionHead(),
        TrainerConfig(loss="l1", optimizer="adam", lr=1e-3),
        fds_config=FDSConfig.for_age(feature_dim=2048, bucket_num=100, start_smooth=0),
        mesh=mesh,
        train_augment=random_crop_flip_normalize,  # full production pipeline
    )

    rng = np.random.default_rng(0)
    batch = {
        # uint8 transport like the real pipeline (cast + augment on device)
        "input": (rng.random((BATCH, IMG, IMG, 3)) * 255).astype(np.uint8),
        "target": rng.integers(0, 100, size=(BATCH, 1)).astype(np.float32),
        "weight": rng.uniform(0.5, 2.0, size=(BATCH, 1)).astype(np.float32),
    }

    hb("initializing model state...")
    state = trainer.init_state(jax.random.key(0), batch["input"][:2].astype(np.float32))
    trainer._jit()
    from imbalanced_regression_tpu.parallel.mesh import shard_batch

    sharded = shard_batch(mesh, batch)

    # warmup (compile + first steps); sync via value fetch — on the tunneled
    # axon platform block_until_ready alone does not force a remote flush
    hb("compiling + warming up train step...")
    for i in range(WARMUP):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-3)
        if i == 0:
            float(loss)
            hb("train step compiled (first step done)")
    float(loss)
    hb(f"warmup done; timing {STEPS} steps...")

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss, _ = trainer._train_step(state, sharded, 1, 1e-3)
    float(loss)
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * STEPS / dt
    per_chip = img_per_sec / num_chips
    out = {
        "metric": "resnet50_fds_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / REF_IMG_PER_SEC_PER_GPU, 3),
        # the reference publishes no throughput; the denominator is the
        # literature per-V100 ResNet-50 fp32 estimate (module docstring)
        "baseline_anchor": "literature estimate: 350 img/s per V100, fp32",
    }
    # measured same-host software-stack anchor (tools/ref_bench.py): the
    # actual torch reference loop vs our XLA step on this host's CPU. It is
    # hardware-class-unequal to the TPU number above by construction — on CPU
    # silicon torch's MKLDNN conv kernels beat XLA:CPU; the TPU number is what
    # the framework is designed for.
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "runs", "ref_bench.json")
    if os.path.exists(ref_path):
        with open(ref_path) as fh:
            rb = json.load(fh)
        out["vs_reference_same_host"] = round(rb["ratio_same_host"], 3)
        out["reference_cpu_img_per_s_measured"] = round(rb["reference_img_per_s"], 2)
    hb("done")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Same-host throughput anchor: the actual PyTorch reference train loop vs
this framework's jit train step, both on THIS host's CPU.

BASELINE.md's ≥5x images/sec/chip target needs a *measured* denominator; the
reference publishes no throughput numbers, and its hardware class (V100) is
not available here. This tool pins both software stacks to the same silicon:

- **Reference side**: the reference's own ``resnet50`` module and
  ``weighted_l1_loss`` (imported from ``/root/reference/imdb-wiki-dir/``),
  driven exactly like the hot loop in ``imdb-wiki-dir/train.py:234-283``
  (forward → weighted loss → ``zero_grad``/``backward``/``step`` with Adam,
  ``train.py:165,260-262``), on pre-materialized synthetic tensors (both
  sides exclude data loading).
- **Our side**: the framework's jitted train step (same Trainer the TPU bench
  uses) on the CPU platform, float32 to match torch's default dtype.

The resulting ratio is a *software-stack* comparison on shared silicon and is
clearly NOT the TPU-vs-V100 headline (hardware-class-unequal); bench.py
reports it as ``vs_reference_same_host`` next to the literature anchor.

Usage::

    python -m tools.ref_bench [--batch 8 --steps 3 --out runs/ref_bench.json]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REF = "/root/reference"


def _load_ref_module(suite: str, name: str):
    path = os.path.join(REF, suite, f"{name}.py")
    sys.path.insert(0, os.path.join(REF, suite))
    try:
        spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)
        for leftover in ("utils", "util", "fds", "loss"):
            sys.modules.pop(leftover, None)


def bench_reference(batch: int, steps: int, img: int = 224) -> dict:
    import torch

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    resnet = _load_ref_module("imdb-wiki-dir", "resnet")
    loss_mod = _load_ref_module("imdb-wiki-dir", "loss")
    # train.py:140-142 builds resnet50 with the FDS args always passed
    # (fds=False just disables the module); mirror its call signature
    model = resnet.resnet50(
        fds=False, bucket_num=100, bucket_start=0, start_update=0,
        start_smooth=1, kernel="gaussian", ks=5, sigma=1, momentum=0.9)
    model.train()
    # Adam, lr 1e-3 (train.py:163-166)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch, 3, img, img)
    t = torch.rand(batch, 1) * 100
    w = torch.ones(batch, 1)

    def step():
        out = model(x)  # hot loop, train.py:246-262
        loss = loss_mod.weighted_l1_loss(out, t, weights=w)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return {"sec_per_step": dt, "img_per_s": batch / dt}


def bench_ours(batch: int, steps: int, img: int = 224) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS
    import jax.numpy as jnp
    import numpy as np

    from imbalanced_regression_tpu.models.resnet import RegressionHead, resnet50_backbone
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    trainer = Trainer(
        resnet50_backbone(dtype=jnp.float32),  # f32 to match torch's default
        RegressionHead(),
        TrainerConfig(loss="l1", optimizer="adam", lr=1e-3),
    )
    rng = np.random.default_rng(0)
    data = {
        "input": rng.normal(size=(batch, img, img, 3)).astype(np.float32),
        "target": (rng.random((batch, 1)) * 100).astype(np.float32),
        "weight": np.ones((batch, 1), np.float32),
    }
    state = trainer.init_state(jax.random.key(0), data["input"][:2])
    state, loss, _ = trainer.train_step(state, data, epoch=0)  # warmup + compile
    float(loss)  # value fetch: block_until_ready does not flush on this platform
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = trainer.train_step(state, data, epoch=0)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return {"sec_per_step": dt, "img_per_s": batch / dt}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--out", default="runs/ref_bench.json")
    args = p.parse_args(argv)

    # torch first (its thread pool must not inherit a jax-warmed process)
    ref = bench_reference(args.batch, args.steps, args.img)
    print(f"reference (torch CPU): {ref['sec_per_step']:.2f} s/step, "
          f"{ref['img_per_s']:.2f} img/s", flush=True)
    ours = bench_ours(args.batch, args.steps, args.img)
    print(f"ours (XLA CPU):        {ours['sec_per_step']:.2f} s/step, "
          f"{ours['img_per_s']:.2f} img/s", flush=True)
    result = {
        "host": "cpu-shared-silicon", "batch": args.batch, "steps": args.steps,
        "img": args.img, "threads": os.cpu_count(),
        "reference_img_per_s": ref["img_per_s"],
        "ours_cpu_img_per_s": ours["img_per_s"],
        "ratio_same_host": ours["img_per_s"] / ref["img_per_s"],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main(sys.argv[1:])

"""Profiler-trace attribution for the flagship train step.

Captures a ``jax.profiler`` trace of the bench configuration (ResNet-50 +
FDS, batch 128, bf16 — the exact step ``bench.py`` times) and parses the
xplane protobuf directly (TF's ``tsl`` proto stubs; the
tensorboard_plugin_profile converters don't match the installed TF), then
prints where the device time goes: an HLO-category rollup and the top ops by
self time, each with FLOPs, bytes accessed, and the Python source line XLA
attributes it to. This is the trace-guided analysis VERDICT.md round-1 asked
for instead of guessing at the ~50 ms step.

Usage::

    python -m tools.trace_analysis [--steps 10] [--out /tmp/dir_trace]
    python -m tools.trace_analysis --xplane <trace>.xplane.pb   # re-analyze
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

# the shipped proto stubs predate protoc 3.19; the C++ protobuf backend
# refuses them. Must be set before any google.protobuf import.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture_trace(out_dir: str, steps: int = 10, batch: int = 128, img: int = 224):
    """Run the bench step under the profiler; returns the trace directory."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imbalanced_regression_tpu.data.augment import random_crop_flip_normalize
    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.models.resnet import RegressionHead, resnet50_backbone
    from imbalanced_regression_tpu.parallel.mesh import create_mesh, shard_batch
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig
    from imbalanced_regression_tpu.utils.logging_tools import profile_trace

    mesh = create_mesh()
    trainer = Trainer(
        resnet50_backbone(dtype=jnp.bfloat16), RegressionHead(),
        TrainerConfig(loss="l1", optimizer="adam", lr=1e-3),
        fds_config=FDSConfig.for_age(feature_dim=2048, bucket_num=100, start_smooth=0),
        mesh=mesh, train_augment=random_crop_flip_normalize,
    )
    rng = np.random.default_rng(0)
    hb = {
        "input": (rng.random((batch, img, img, 3)) * 255).astype(np.uint8),
        "target": rng.integers(0, 100, size=(batch, 1)).astype(np.float32),
        "weight": rng.uniform(0.5, 2.0, size=(batch, 1)).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), hb["input"][:2].astype(np.float32))
    trainer._jit()
    b = shard_batch(mesh, hb)
    for _ in range(5):  # compile + warm
        state, loss, _ = trainer._train_step(state, b, 1, 1e-3)
    float(loss)

    with profile_trace(out_dir):
        for _ in range(steps):
            state, loss, _ = trainer._train_step(state, b, 1, 1e-3)
        float(loss)  # sync inside the trace so device work is captured
    return out_dir


def capture_trace_nyud2(out_dir: str, steps: int = 10, batch: int = 32):
    """Trace the NYUD2 dense train step exactly as ``tasks/nyud2.py`` builds
    it (228x304 input, 114x152 depth, per-pixel LDS weights + per-pixel FDS
    calibration — the reference's ``nyud2-dir/train.py:188-204`` hot loop)."""
    import jax

    from imbalanced_regression_tpu.data.nyud2 import synthetic_depth_dataset
    from imbalanced_regression_tpu.parallel.mesh import create_mesh, shard_batch
    from imbalanced_regression_tpu.tasks.nyud2 import NYUDConfig, build_nyud_trainer
    from imbalanced_regression_tpu.utils.logging_tools import profile_trace

    mesh = create_mesh()
    cfg = NYUDConfig(data_dir="", fds=True, lds=True, reweight="inverse",
                     batch_size=batch, start_update=0, start_smooth=0)
    trainer = build_nyud_trainer(cfg, mesh)
    data = synthetic_depth_dataset(batch, img_hw=(228, 304), depth_hw=(114, 152), seed=0)
    state = trainer.init_state(jax.random.key(0), data["input"][:2].astype("float32"))
    trainer._jit()
    b = shard_batch(mesh, {"input": data["input"], "target": data["target"]})
    for _ in range(5):  # compile + warm
        state, loss, _ = trainer._train_step(state, b, 1, cfg.lr)
    float(loss)

    with profile_trace(out_dir):
        for _ in range(steps):
            state, loss, _ = trainer._train_step(state, b, 1, cfg.lr)
        float(loss)  # sync inside the trace so device work is captured
    return out_dir


def find_xplane(out_dir: str) -> str:
    hits = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
                  key=os.path.getmtime)
    if not hits:
        raise FileNotFoundError(f"no xplane.pb under {out_dir}")
    return hits[-1]


def _stat(holder, stat_metadata, name):
    for s in holder.stats:
        if stat_metadata[s.metadata_id].name == name:
            if s.str_value:
                return s.str_value
            if s.ref_value:
                return stat_metadata[s.ref_value].name
            return s.int64_value or s.uint64_value or s.double_value
    return None


def op_rows(xplane_path: str, device_substr: str = "/device:TPU"):
    """Aggregate the device plane's 'XLA Ops' line into per-op rows."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if device_substr in p.name and
              any(l.name == "XLA Ops" and l.events for l in p.lines)]
    if not planes:
        avail = [p.name for p in xs.planes]
        raise ValueError(f"no device plane with XLA Ops in {avail}")

    agg: dict[tuple, dict] = {}
    n_steps = 0
    for plane in planes:
        md, sm = plane.event_metadata, plane.stat_metadata
        for line in plane.lines:
            if line.name == "Steps":
                n_steps = max(n_steps, len(line.events))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = md[ev.metadata_id]
                key = (plane.name, ev.metadata_id)
                if key not in agg:
                    agg[key] = {
                        "name": m.display_name or m.name.split(" = ")[0],
                        "category": _stat(m, sm, "hlo_category") or "?",
                        "source": _stat(m, sm, "source") or "",
                        "flops": float(_stat(m, sm, "flops") or 0),
                        "bytes": float(_stat(m, sm, "bytes_accessed") or 0),
                        "us": 0.0,
                        "count": 0,
                    }
                agg[key]["us"] += ev.duration_ps / 1e6
                agg[key]["count"] += 1
    return list(agg.values()), max(n_steps, 1)


def summarize(rows, n_steps, top_k: int = 15):
    total = sum(r["us"] for r in rows) or 1.0
    by_cat: dict[str, float] = defaultdict(float)
    for r in rows:
        by_cat[r["category"]] += r["us"]
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    tops = sorted(rows, key=lambda r: -r["us"])[:top_k]

    print(f"device busy time: {total / 1e3:.2f} ms total, "
          f"{total / 1e3 / n_steps:.2f} ms/step over {n_steps} steps")
    print("\n== by HLO category ==")
    for cat, us in cats:
        print(f"{us / total * 100:6.2f}%  {us / 1e3 / n_steps:8.3f} ms/step  {cat}")
    print(f"\n== top {top_k} ops by device time ==")
    for r in tops:
        # flops/bytes are per-execution; count spans all steps, so
        # flops*count over the summed time IS the average rate
        gflops_s = r["flops"] * r["count"] / (r["us"] * 1e-6) / 1e9 if r["us"] else 0
        gbytes_s = r["bytes"] * r["count"] / (r["us"] * 1e-6) / 1e9 if r["us"] else 0
        src = os.path.basename(str(r["source"])) if r["source"] else ""
        print(f"{r['us'] / total * 100:6.2f}%  {r['us'] / 1e3 / n_steps:8.3f} ms/step  "
              f"x{r['count'] // n_steps:3d}  [{r['category']}] {r['name'][:48]:48s} "
              f"{gflops_s:8.0f} GF/s {gbytes_s:7.1f} GB/s  {src}")
    return total, cats, tops


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default="/tmp/dir_trace")
    p.add_argument("--xplane", default="", help="analyze an existing trace instead")
    p.add_argument("--top_k", type=int, default=15)
    p.add_argument("--device", default="/device:TPU")
    p.add_argument("--task", default="age", choices=["age", "nyud2"])
    p.add_argument("--batch", type=int, default=None,
                   help="batch size override (default: 128 age / 32 nyud2)")
    args = p.parse_args(argv)

    capture = capture_trace if args.task == "age" else capture_trace_nyud2
    kw = {"batch": args.batch} if args.batch else {}
    xplane = args.xplane or find_xplane(capture(args.out, steps=args.steps, **kw))
    print(f"# trace: {xplane}", file=sys.stderr)
    rows, n_steps = op_rows(xplane, args.device)
    summarize(rows, n_steps, args.top_k)


if __name__ == "__main__":
    main(sys.argv[1:])

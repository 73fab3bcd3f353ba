"""Serving benchmark: latency/throughput of the frozen StableHLO predictor.

The reference has no serving story (inference only inside the training
scripts, ``imdb-wiki-dir/train.py:103-110``); the rebuild exports trained
models as self-contained StableHLO artifacts (``serving.py``). This tool
measures the end-to-end serving path — host uint8→f32 input, ``exp.call``
on the accelerator, prediction fetched back to host — per batch size, the
numbers a deployment needs for capacity planning.

One JSON line per batch size::

    {"batch": 128, "ms_per_batch": ..., "img_per_sec": ..., "p50_ms": ..., "p99_ms": ...}

Usage::

    python -m tools.serve_bench [--task age] [--model resnet50] \
        [--img_size 224] [--batches 1 8 32 128] [--checkpoint <dir>] [--cpu]

Without ``--checkpoint`` the model serves freshly initialized weights — the
compute cost is identical, so throughput numbers stand; quality obviously
does not.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_batch(predict, x, warmup: int = 3, iters: int = 20) -> dict:
    for _ in range(warmup):
        y = predict(x)
    float(np.asarray(y).sum())  # value fetch: block_until_ready alone does not
    # flush remote execution on the tunneled axon platform (CLAUDE.md)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        y = predict(x)
        float(np.asarray(y).sum())
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "batch": int(x.shape[0]),
        "ms_per_batch": round(float(times.mean()) * 1e3, 3),
        "img_per_sec": round(x.shape[0] / float(times.mean()), 1),
        "p50_ms": round(float(np.percentile(times, 50)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(times, 99)) * 1e3, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--task", default="age", choices=["age", "nyud2"])
    p.add_argument("--model", default="resnet50")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--batches", nargs="*", type=int, default=[1, 8, 32, 128])
    p.add_argument("--checkpoint", default="", help="Orbax dir (optional)")
    p.add_argument("--which", default="best", choices=["best", "latest"])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")
    p.add_argument("--embed_weights", type=int, default=None,
                   help="1: bake weights as module constants; 0: weights-as-"
                        "arguments package (default: 0 for nyud2, whose "
                        "embedded module exceeds the remote-compile request "
                        "limit; 1 otherwise)")
    p.add_argument("--input_dtype", default=None, choices=["uint8", "float32"],
                   help="serving input dtype (default: uint8 for age — the "
                   "training pipeline's transport dtype, cast+normalized "
                   "in-graph, 4x less host->device bytes; float32 for nyud2)")
    args = p.parse_args(argv)
    input_dtype = np.dtype(args.input_dtype or
                           ("uint8" if args.task == "age" else "float32"))
    embed = (args.task != "nyud2") if args.embed_weights is None \
        else bool(args.embed_weights)

    if args.cpu:
        import jax

        # the axon TPU plugin ignores JAX_PLATFORMS; this is the working recipe
        jax.config.update("jax_platforms", "cpu")

    from imbalanced_regression_tpu.serving import export_predictor, load_predictor
    from imbalanced_regression_tpu.utils.runtime import enable_compilation_cache
    from tools.export_model import build_task

    enable_compilation_cache()
    trainer, state = build_task(
        args.task,
        {"img_size": args.img_size, "model": args.model} if args.task == "age" else {},
    )
    if args.checkpoint:
        from imbalanced_regression_tpu.utils.checkpoint import restore_checkpoint

        state, _, _ = restore_checkpoint(args.checkpoint, state, which=args.which)

    import jax

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    results = []
    for batch in args.batches:
        if args.task == "age":
            # pixel-valued input: uint8 serves raw bytes (in-graph /255 +
            # normalize via to_unit_float); float32 serves the [0,1]
            # ToTensor convention
            x = (rng.random((batch, args.img_size, args.img_size, 3)) * 255)
            x = x.astype(input_dtype) if input_dtype == np.uint8 \
                else (x / 255.0).astype(np.float32)
        else:
            x = rng.random((batch, 228, 304, 3)).astype(input_dtype)
        predict = load_predictor(export_predictor(trainer, state, x,
                                                  platforms=(platform,),
                                                  embed_weights=embed))
        r = bench_batch(predict, x, iters=args.iters)
        r["platform"] = platform
        r["input_dtype"] = str(x.dtype)
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])

"""Per-bucket moments micro-benchmark: XLA one-hot einsum vs Pallas kernels.

Times the three implementations of the FDS segment-moments op at NYUD2 dense
scale (the reference's per-unique-label torch loop in
``imdb-wiki-dir/fds.py:91-111`` has no dense equivalent to time). Used to
pick the ``bucket_moments`` default — round-2 measured XLA 1.5 ms vs Pallas
v1 2.8 ms on v5e at [110k x 128, B=100]; v2 halves the MXU passes via a
3-term bf16 mantissa split.

Usage::

    python -m tools.moments_bench [--n 110592] [--d 128] [--b 100]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=110_592)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--b", type=int, default=100)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imbalanced_regression_tpu.ops.moments import bucket_moments
    from imbalanced_regression_tpu.ops.pallas_kernels import pallas_moments, pallas_moments_v2

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(args.n, args.d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, args.b, size=args.n).astype(np.int32))

    def time_fn(name, fn):
        out = fn()  # compile
        jax.block_until_ready(out)
        float(jax.tree.leaves(out)[0].sum())  # full flush (remote platform)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn()
        float(jax.tree.leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{name:22s} {dt * 1e3:8.3f} ms/call")
        return dt * 1e3, out

    xla_jit = jax.jit(lambda: bucket_moments(feats, idx, args.b, use_pallas=False))
    t_xla, ref = time_fn("xla one-hot einsum", xla_jit)
    t_v1, o1 = time_fn("pallas_moments (v1)", lambda: pallas_moments(feats, idx, args.b))
    t_v2, o2 = time_fn("pallas_moments_v2", lambda: pallas_moments_v2(feats, idx, args.b))

    for name, out in (("v1", o1), ("v2", o2)):
        err = float(jnp.max(jnp.abs(out[1] - ref.total)) / (jnp.max(jnp.abs(ref.total)) + 1e-9))
        errq = float(jnp.max(jnp.abs(out[2] - ref.total_sq)) / (jnp.max(jnp.abs(ref.total_sq)) + 1e-9))
        print(f"{name} max rel err vs XLA-HIGHEST: sums {err:.2e}  sumsq {errq:.2e}")
    print(json.dumps({"n": args.n, "d": args.d, "b": args.b,
                      "xla_ms": t_xla, "pallas_v1_ms": t_v1, "pallas_v2_ms": t_v2}))


if __name__ == "__main__":
    main()

"""A/B benchmark of the STS-B train step: flax BiLSTM vs FusedBiLSTM.

At the reference width (d_hid=1500, ``sts-b-dir/train.py:54``) the BiLSTM
dominates the STS step; this measures both implementations' jitted train-step
time at the production configuration (batch 128, seq 40, bf16, grad clip,
target/5 scaling) so the faster one can be chosen with evidence.

Usage: python -m tools.stsb_step_bench [--d_hid 1500] [--impls fused flax]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def time_step(impl: str, d_hid: int, batch_size: int = 128, seq_len: int = 40,
              vocab: int = 30000, steps: int = 10, warmup: int = 3,
              fds: bool = False):
    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.fds import FDSConfig
    from imbalanced_regression_tpu.models.bilstm_pair import PairBiLSTMEncoder
    from imbalanced_regression_tpu.models.resnet import RegressionHead
    from imbalanced_regression_tpu.ops.binning import bin_index_hist_np
    from imbalanced_regression_tpu.parallel.mesh import create_mesh, shard_batch
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    mesh = create_mesh()
    enc = PairBiLSTMEncoder(
        vocab_size=vocab, d_word=300, d_hid=d_hid, n_layers=2, n_highway=0,
        dropout=0.2, dropout_embs=0.2, train_words=True, lstm_impl=impl,
        dtype=jnp.bfloat16)
    trainer = Trainer(
        enc, RegressionHead(),
        TrainerConfig(loss="mse", lr=1e-4, clip_grad_norm=5.0,
                      target_scale=5.0, schedule=()),
        fds_config=FDSConfig.for_sts(feature_dim=2 * d_hid * 4, bucket_num=50,
                                     start_update=0, start_smooth=0) if fds else None,
        mesh=mesh)
    r = np.random.default_rng(0)
    lens = r.integers(5, seq_len + 1, size=(batch_size,))
    mask = (np.arange(seq_len)[None, :] < lens[:, None]).astype(np.float32)
    targets = (r.random((batch_size, 1)) * 5).astype(np.float32)
    batch = {
        "input": {
            "tokens1": r.integers(1, vocab, size=(batch_size, seq_len)).astype(np.int32),
            "mask1": mask,
            "tokens2": r.integers(1, vocab, size=(batch_size, seq_len)).astype(np.int32),
            "mask2": mask,
        },
        "target": targets,
        "weight": np.ones((batch_size, 1), np.float32),
    }
    if fds:
        batch["bucket_idx"] = bin_index_hist_np(targets.reshape(-1), 50, 0)
    state = trainer.init_state(jax.random.key(0),
                               jax.tree.map(lambda v: v[:2], batch["input"]))
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
    return {"impl": impl, "d_hid": d_hid, "batch": batch_size, "fds": fds,
            "compile_s": round(compile_s, 1), "ms_per_step": round(dt * 1e3, 1),
            "iters_per_sec": round(1.0 / dt, 2),
            "loss_finite": bool(np.isfinite(float(loss)))}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--d_hid", type=int, default=1500)
    p.add_argument("--impls", nargs="*", default=["fused", "flax"])
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--fds", action="store_true")
    args = p.parse_args(argv)
    out = []
    for impl in args.impls:
        r = time_step(impl, args.d_hid, steps=args.steps, fds=args.fds)
        print(json.dumps(r), flush=True)
        out.append(r)
    if len(out) == 2:
        print(json.dumps({"speedup": round(out[1]["ms_per_step"] / out[0]["ms_per_step"], 2),
                          "faster": min(out, key=lambda r: r["ms_per_step"])["impl"]}))


if __name__ == "__main__":
    main()

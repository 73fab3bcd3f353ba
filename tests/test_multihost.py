"""2-process jax.distributed test for ``initialize_multihost``.

VERDICT.md weak #5: the multi-host bring-up path had never executed. This
spawns two coordinator-connected CPU processes (no multi-chip hardware
needed), asserts the global mesh spans both, runs one real DP train step, and
checks the result against a single-process run of the identical step —
the DCN-scale analogue of tests/test_parallel.py's ICI equality tests."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]
    except OSError:
        pytest.skip("platform forbids local sockets")


@pytest.mark.slow
def test_two_process_distributed_step_matches_single_process():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, addr, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=_ROOT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 2
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["param_sum"] == pytest.approx(outs[1]["param_sum"], rel=1e-6)

    # single-process reference: same batch, same seed, 1-device mesh
    import jax

    from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
    from imbalanced_regression_tpu.parallel.mesh import create_mesh
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    trainer = Trainer(
        ResNetBasicBackbone(stage_sizes=(1,), width=4, dtype=np.float32),
        RegressionHead(), TrainerConfig(loss="l1", lr=1e-2), mesh=create_mesh(1),
    )
    rng = np.random.default_rng(0)
    batch = {
        "input": rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32),
        "target": rng.normal(50, 10, (8, 1)).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2])
    state, loss, _ = trainer.train_step(state, batch, epoch=0)
    param_sum = sum(float(np.abs(np.asarray(x)).sum())
                    for x in jax.tree.leaves(state.params))
    assert outs[0]["loss"] == pytest.approx(float(loss), rel=1e-4)
    assert outs[0]["param_sum"] == pytest.approx(param_sum, rel=1e-4)

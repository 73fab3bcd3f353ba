"""Worker process for the 2-process jax.distributed multihost test.

Usage: python tests/_multihost_worker.py <coordinator_addr> <num_procs> <pid>

Each process brings up the distributed runtime via
``parallel.mesh.initialize_multihost`` (SURVEY.md §5.8), builds the global
data-parallel mesh spanning both processes, runs ONE real train step of the
tiny ResNet trainer on a deterministic batch, and prints a JSON line with the
loss and a post-step parameter checksum. The parent test asserts both
processes agree with each other and with a single-process run of the same
step."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any computation (CLAUDE.md)


def main():
    addr, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from imbalanced_regression_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator_address=addr, num_processes=num_procs,
                         process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == num_procs  # 1 CPU device per process

    import numpy as np

    from imbalanced_regression_tpu.parallel.mesh import create_mesh, replicate
    from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    mesh = create_mesh()  # global: both processes' devices
    assert mesh.devices.size == num_procs

    trainer = Trainer(
        ResNetBasicBackbone(stage_sizes=(1,), width=4, dtype=np.float32),
        RegressionHead(), TrainerConfig(loss="l1", lr=1e-2), mesh=mesh,
    )
    rng = np.random.default_rng(0)
    batch = {
        "input": rng.normal(0, 1, (4 * num_procs, 16, 16, 3)).astype(np.float32),
        "target": rng.normal(50, 10, (4 * num_procs, 1)).astype(np.float32),
    }
    state = trainer.init_state(jax.random.key(0), batch["input"][:2])
    # init ran on the process-local device; re-home the state as a global
    # replicated array (every process holds identical values by construction)
    state = replicate(mesh, jax.device_get(state))

    state, loss, _ = trainer.train_step(state, batch, epoch=0)
    param_sum = sum(
        float(jnp_sum) for jnp_sum in
        (np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(state.params))
    )
    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "loss": float(loss),
        "param_sum": param_sum,
    }), flush=True)


if __name__ == "__main__":
    main()

"""Mesh + sharding utilities for data-parallel training over ICI.

Design (SURVEY.md §2.26, §5.8): a 1-D ``data`` mesh over all local devices
(v5e-8 ICI; multi-host later adds a DCN axis via ``jax.distributed``). The
train step is a single ``jax.jit`` with sharded batch inputs and replicated
state — GSPMD turns the mean-loss gradient and the FDS bucket-moment
contractions into ``psum``s over the mesh automatically, which is exactly the
count-weighted reduction the gathered single-device computation performs
(verified in tests/test_parallel.py)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime for multi-host training.

    After this, :func:`create_mesh` sees every chip across hosts and the same
    GSPMD data-parallel program spans ICI within a slice and DCN across
    slices (reductions ride the fastest available fabric). On single-host
    (the common case for this framework's model sizes) this is unnecessary.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def create_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over (the first ``num_devices``) local devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding: NamedSharding):
    """Ship one host value to a (possibly multi-process) sharding.

    Single-controller: plain ``device_put``. Multi-process (after
    :func:`initialize_multihost`): ``device_put`` cannot address remote
    devices, so build the global array from a callback — every process passes
    the same full global value and JAX takes each process's local shards."""
    if isinstance(x, jax.Array) and getattr(x, "sharding", None) == sharding:
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys can't round-trip through numpy; ship the key data
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
        return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a host batch pytree with its leading axis sharded over the
    mesh. Batch sizes must divide the mesh size (drop-last batching upstream).
    Under multi-host, every process must pass the identical global batch."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Re-home a host/local pytree as a globally replicated array tree (e.g.
    a freshly initialized TrainState before the first multi-host step; every
    process holds identical values by construction — same seed)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, sharding), tree)

"""Device mesh helpers: data-parallel training over a TPU slice.

The reference's multi-GPU story is single-process `torch.nn.DataParallel`
(`tools/train_siammask.py:152`) with NCCL gather/scatter. The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over all local (or distributed)
devices with the batch sharded on the ``data`` axis; XLA inserts the psum
gradient all-reduce over ICI when the jitted loss averages across the global
batch. Multi-host extends the same mesh over DCN via `jax.distributed`.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Initialize multi-host JAX (the DCN leg of a multi-slice mesh).

    The reference's only multi-node touchpoint is rank-aware logging via
    SLURM_PROCID (`utils/log_helper.py:42-51`); here the same environment drives
    a real `jax.distributed.initialize`, after which `data_parallel_mesh()` spans
    every process's devices and per-host input sharding feeds the global batch.
    Returns this process's index."""
    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, sharded on axis 0."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

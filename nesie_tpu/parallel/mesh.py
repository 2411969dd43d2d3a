"""Device-mesh data parallelism.

The reference's entire distributed surface is NCCL data parallelism +
sync-BN (SURVEY.md section 2.7/2.8). The TPU-native mapping: a 1-D ``dp``
mesh over all chips (ICI within a pod, DCN across hosts handled by
jax.distributed), batches sharded on their leading axis, state replicated.
Gradient all-reduce is implicit in jit's SPMD partitioning, and because
batch statistics are computed with single-program semantics, BatchNorm is
cross-replica-synced by construction (the reference's opt-in
NaiveSyncBatchNorm behavior, mmdet3d/ops/norm.py, is the default here).

For multi-host runs call ``jax.distributed.initialize()`` before
``make_mesh()`` (reference: mmcv init_dist, train.py:131-139).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Shard every array leaf on its leading (batch) axis."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_host_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Assemble a global device batch from per-process host data.

    Each process passes the rows of the global batch that belong to its
    addressable devices (all rows in single-process runs); the result is a
    global jax.Array sharded on the leading axis. This is the TPU-native
    equivalent of DDP's per-rank DataLoader shards (reference
    train.py:131-139 + samples_per_gpu semantics).
    """
    sh = data_sharding(mesh, axis)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, batch)


def process_local_rows(total_rows: int) -> tuple[int, int]:
    """[lo, hi) slice of a global batch owned by this process."""
    n_proc = jax.process_count()
    if total_rows % n_proc:
        raise ValueError(
            f"global batch {total_rows} not divisible by {n_proc} processes"
        )
    per = total_rows // n_proc
    pid = jax.process_index()
    return pid * per, (pid + 1) * per

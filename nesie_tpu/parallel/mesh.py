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

"""Device mesh and sharding for data-parallel training (SURVEY §2.6).

The reference stacks three DP mechanisms (threaded DataParallel with dummy-
batch padding models/models.py:79-117, apex DDP models/models.py:41-43, and
DistributedSampler); on TPU all three collapse into ONE 1-D `jax.sharding.Mesh`
axis over ICI: the global batch is sharded over 'data', gradients and batch-
norm statistics become global automatically under GSPMD (XLA inserts the
psum/all-gather collectives), and each host feeds its local shard.  Multi-slice
scaling over DCN is the same axis with a larger mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in the batch pytree with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

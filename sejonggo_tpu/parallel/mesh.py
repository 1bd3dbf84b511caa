"""Device mesh / sharding helpers.

Replaces the reference's entire cluster layer — master/slave BaseManager
RPC (master_coordinator.py:160-174, slave_coordinator.py:89-125), scp
file shipping (scpy.py:19-107) and dbm shared state
(distribution_config.py) — with a jax device mesh:

- self-play games are a leading batch axis sharded over 'dp' (the
  TPU-native form of N_GAME_PROCESS x hosts, conf.py:30,57-76);
- the learner's batch is sharded over 'dp' and gradients are
  all-reduced by XLA over ICI (the form of keras multi_gpu_model,
  train.py:96-99);
- weights are replicated — "shipping the model" is a broadcast, not scp.

Multi-host pods: call jax.distributed.initialize() per host before
building the mesh; jax.devices() then spans the slice and the same
shardings drive ICI/DCN collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over `dp` devices (0 = all visible)."""
    devices = jax.devices()
    if dp <= 0:
        dp = len(devices)
    return Mesh(np.asarray(devices[:dp]).reshape(dp), (axis_name,))


def shard_batch(arr, mesh: Mesh, axis_name: str = "dp"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. network variables) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

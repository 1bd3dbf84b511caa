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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, axis_name: str = "dp", local: bool = False) -> Mesh:
    """1-D data-parallel mesh over `dp` devices (0 = all visible).

    local=True restricts to this process's devices — used for the
    self-play phase on multi-host pods, where games are embarrassingly
    parallel and each host harvests its own records (the reference's
    independent self-play servers, main_selfplay.py); the learner's
    global mesh spans every host."""
    devices = jax.local_devices() if local else jax.devices()
    if dp <= 0:
        dp = len(devices)
    if not local and jax.process_count() > 1 and dp < len(devices):
        # a partial GLOBAL mesh must take devices evenly from every
        # process (devices[:dp] would select only the first hosts'
        # chips, leaving other processes without addressable devices)
        per = max(dp // jax.process_count(), 1)
        by_proc: dict = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        devices = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
    return Mesh(np.asarray(devices[:dp]).reshape(dp), (axis_name,))


def shard_batch(arr, mesh: Mesh, axis_name: str = "dp"):
    """Place an array with its leading axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. network variables) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_actor_state(state, mesh: Mesh, axis_name: str = "dp"):
    """Place an actor-state pytree (boards, trees, flags — every leaf has
    the game batch as its leading axis) with that axis sharded over the
    mesh.  jit then propagates the shardings through the whole move step,
    so search/env/inference all run batch-parallel across devices."""

    def place(x):
        if x is None:
            return None
        x = jnp.asarray(x) if not hasattr(x, "ndim") else x
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, state)


def host_local_batch(arr, mesh: Mesh, axis_name: str = "dp"):
    """Build the global dp-sharded batch from this host's local shard.

    Single-process: a plain sharded device_put.  Multi-host (pod slice):
    each process contributes its local rows and the result is one global
    jax.Array — the TPU-native replacement for the reference's per-game
    scp shipping to the training server (scpy.py:68-107)."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, arr)
    return jax.device_put(arr, sharding)

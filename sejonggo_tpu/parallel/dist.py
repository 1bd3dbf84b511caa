"""Multi-host bootstrap.

Replaces the reference's cluster control plane — BaseManager TCP RPC
with a shared authkey (master_coordinator.py:160-174,
slave_coordinator.py:23-29), pexpect-driven scp model/data shipping
(scpy.py) and dbm phase flags (distribution_config.py) — with the jax
distributed runtime: one process per host joins the pod slice, after
which jax.devices() spans every chip, the data-parallel mesh covers the
slice, and weights/gradients/data move as XLA collectives over ICI/DCN.
There is nothing left to scp: "sending the model to the self-play
servers" (scpy.py:47-55) is parameter replication inside jit.

Single-controller operation (this repo's pipeline) then works
unchanged: build the mesh with parallel.make_mesh() and shard the game
batch / train batch over it.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join the jax distributed runtime (multi-host pod slice).

    With no arguments, reads the standard JAX env/cloud auto-detection;
    on a single host this is a no-op.  Returns the process index.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index()


def local_game_slice(total_games: int) -> range:
    """Which self-play games this host owns (the reference's
    master-assigned game-number ranges, master_coordinator.py:120-157,
    become a deterministic split — no job server needed)."""
    n = jax.process_count()
    i = jax.process_index()
    per = (total_games + n - 1) // n
    return range(i * per, min((i + 1) * per, total_games))

"""sejonggo-tpu: a TPU-native AlphaGo-Zero framework.

A from-scratch rebuild of the capabilities of drsagitn/sejonggo
(reference layout surveyed in SURVEY.md) designed TPU-first:

- ``goenv``    — fully vectorized, functional Go engine (jit/vmap, masked
                 dilation flood fills instead of the reference's recursive
                 numpy code, cf. reference play.py:160-217).
- ``nets``     — flax AlphaZero residual policy/value network
                 (cf. reference model.py:55-95) with D4 symmetry tables.
- ``search``   — array-backed batched MCTS replicating the reference's
                 frontier-batched search semantics (self_play.py:28-120)
                 with thousands of trees advancing per device step.
- ``actor``    — jitted batched self-play (replaces the reference's
                 process zoo: selfplay_worker.py, predicting_queue_worker.py).
- ``learn``    — replay window, pjit train step, evaluator gating,
                 checkpointing (cf. train.py, evaluator.py).
- ``parallel`` — device mesh / sharding helpers (replaces
                 master_coordinator.py / slave_coordinator.py / scpy.py).
- ``io``       — GTP frontend, SGF import/export, HDF5 data compat, KGS
                 supervised pipeline (cf. sejonggo.py, sgfsave.py,
                 kgs_data_generator.py).
"""

__version__ = "0.1.0"

from .utils.platform import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache

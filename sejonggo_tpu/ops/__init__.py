from sejonggo_tpu.ops.flood import flood_fixpoint_pallas, enable_pallas_flood
from sejonggo_tpu.ops.gostep import step_legal_pallas, enable_pallas_gostep


def enable_tpu_kernels(enable: bool = True) -> None:
    """Production TPU kernel set: the fused step+legality kernel
    (ops.gostep — the search round's leaf stepping, mcts.simulate_round)
    plus the flood fixpoint (ops.flood) for the remaining scoring /
    root-legality paths.  A/B on v5e (scripts/ab_gostep.py, round 3):
    9x9 headline 643-644k env-steps/s with both on, vs 613-637k
    flood-only and 626-647k pure-XLA across repeats — both-on is the
    consistent best; the 19x19 reference point is network-bound and
    insensitive (~10.4k env-steps/s under every config).  No-op choice
    on CPU backends (callers gate on jax.default_backend())."""
    enable_pallas_flood(enable)
    enable_pallas_gostep(enable)

"""Self-play throughput benchmark (driver-run on real TPU hardware).

Headline metric: self-play env-steps/s on 9x9 — each MCTS simulation
expands one leaf = one vectorized env step, evaluated by the real
policy/value network; a recorded game move costs `simulations` env
steps.  Baseline: the reference publishes no numbers (BASELINE.md), so
vs_baseline is measured against the self-defined 100k env-steps/s/chip
north star from BASELINE.json.

Prints ONE JSON line to stdout.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.actor.selfplay import _make_move_step
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
    from sejonggo_tpu.search import new_tree_batch

    # fused Pallas flood-fill for the env's capture/legality fixpoints
    # (ops/flood.py; neutral-to-slightly-positive vs the XLA fixpoint
    # under honest execution-verified timing)
    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_pallas_flood

        enable_pallas_flood(True)

    size = 9
    # B=2048 is the single-chip v5e sweet spot (B=4096 exceeds the
    # compiler's memory budget for this program).  max_nodes=82 keeps a
    # full decision's expansions + a small reuse window; the default
    # capacity (2*sims) doubles tree-array HBM traffic for rarely-used
    # reuse budget (measured 115k -> 148k env-steps/s from this alone)
    game_batch = 2048
    search = SearchConfig(simulations=64, batch_size=16, use_symmetry=True,
                          max_nodes=82)
    net = AZNet.from_config(
        size, NetConfig(blocks=4, filters=64, value_hidden=64,
                        compute_dtype="bfloat16"))
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)

    move_step = _make_move_step(predict, None, search, size, True)

    from sejonggo_tpu.goenv import engine

    b = game_batch
    boards = jnp.stack([engine.init_board(size)] * b)
    dummy_policy = jnp.zeros((b, size * size + 1), jnp.float32)
    trees = new_tree_batch(dummy_policy, boards, search.capacity())
    state = (boards, trees, jnp.zeros((b,), bool), None, None,
             jnp.zeros((b,), bool), jnp.zeros((b,), bool),
             jnp.ones((b,), bool))
    greedy = jnp.zeros((b,), bool)
    thresholds = jnp.full((b,), jnp.nan, jnp.float32)
    rng = jax.random.PRNGKey(0)

    import numpy as np

    # warmup (compile) + execution check: on the axon tunnel
    # block_until_ready can return for programs that silently failed
    # (see utils/platform.py), so sync via a real device->host fetch
    # and verify the values are finite — a bench of a program that
    # never ran is worthless.
    rng, sub = jax.random.split(rng)
    state, record, _ = move_step(state, sub, greedy, thresholds, variables, None)
    warm = np.asarray(record["values"])
    assert np.isfinite(warm).all(), "move_step produced non-finite values"

    # several timed windows, best wins: the device is reached over a
    # shared tunnel with high run-to-run latency variance
    n_moves = 4
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_moves):
            rng, sub = jax.random.split(rng)
            state, record, _ = move_step(state, sub, greedy, thresholds,
                                         variables, None)
        # sync through a fetch that depends on the final state's search
        # (child_N row), so the full window's work is inside the timing
        sync = np.asarray(state[1].child_N[0]).sum()
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert sync >= 0

    env_steps = game_batch * search.simulations * n_moves
    value = env_steps / best_dt
    baseline = 100_000.0  # BASELINE.json north star, env-steps/s/chip
    print(json.dumps({
        "metric": "selfplay_env_steps_per_s_9x9",
        "value": round(value, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(value / baseline, 4),
    }))


if __name__ == "__main__":
    main()

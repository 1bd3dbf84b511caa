"""Self-play throughput benchmark (driver-run on real TPU hardware).

Headline metric: self-play env-steps/s on 9x9 — each MCTS simulation
expands one leaf = one vectorized env step, evaluated by the real
policy/value network; a recorded game move costs `simulations` env
steps.  Baseline: the reference publishes no numbers (BASELINE.md), so
vs_baseline is measured against the self-defined 100k env-steps/s/chip
north star from BASELINE.json.

Extras (BASELINE.md "MCTS sims/s per chip (9x9 and 19x19) tracked"):
- sims_per_s_9x9: identical to env-steps/s by construction (1 sim = 1
  leaf expansion = 1 env step) — reported explicitly for the promise;
- moves_per_s_9x9_e2e: END-TO-END continuous-actor throughput incl.
  host harvest + replay ingestion (the pipeline's real selfplay rate);
- tree_fresh_rate_9x9: fraction of moves that rebuilt the search tree
  (reuse telemetry, reference self_play.py:224-238);
- env_steps_per_s_19x19: the reference operating point — 19x19 board,
  20 res-blocks x 256 filters, 1600 sims/move, 100-leaf NN batches
  (reference conf.py:23,29,33,36).

Prints ONE JSON line to stdout.
"""
from __future__ import annotations

import contextlib
import json
import signal
import sys
import time


def _log(msg: str) -> None:
    """Progress to stderr (stdout carries only the one JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


@contextlib.contextmanager
def _deadline(seconds: int, what: str):
    """Hard wall-clock budget for an optional bench section: a section
    that stalls (tunnel hiccup, pathological compile) must not eat the
    driver's whole bench timeout — the headline JSON line must print."""

    def handler(signum, frame):
        raise TimeoutError(f"{what} exceeded {seconds}s budget")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _timed_move_steps(move_step, state, variables, rng, n_moves, repeats=3):
    """Best-of-N timed windows of n_moves move steps; returns (dt, state).
    Syncs through a device->host fetch that depends on the final search
    state so the whole window's work is inside the timing."""
    import jax
    import numpy as np

    best_dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_moves):
            rng, sub = jax.random.split(rng)
            state = move_step(state, sub, variables)
        sync = np.asarray(state[1].child_N[0]).sum()
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert sync >= 0
    return best_dt, state, rng


def _bench_search(size, net_cfg, search, game_batch, n_moves, repeats=3,
                  warm_moves=0):
    """Raw jitted move-step throughput at a given operating point.
    Returns env-steps/s (game_batch * simulations * n_moves / window).

    warm_moves: extra un-timed moves after the compile step, so the
    timed window measures mid-game steady state (reused trees at their
    equilibrium depth) instead of the opening — at 19x19 the opening
    window read ~2.5% slower than the continuous actor's steady state,
    which made e2e_fraction_19x19 > 1.0 (VERDICT r3 Weak #4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sejonggo_tpu.actor.selfplay import _make_move_step
    from sejonggo_tpu.goenv import engine
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
    from sejonggo_tpu.search import new_tree_batch

    net = AZNet.from_config(size, net_cfg)
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)
    move_step = _make_move_step(predict, None, search, size, True)

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

    def step(state, sub, variables):
        state, record, _ = move_step(state, sub, greedy, thresholds,
                                     variables, None)
        return state

    # warmup (compile) + execution check: on the axon tunnel
    # block_until_ready can return for programs that silently failed
    # (see utils/platform.py), so sync via a real device->host fetch
    # and verify the values are finite — a bench of a program that
    # never ran is worthless.
    rng, sub = jax.random.split(rng)
    state2, record, _ = move_step(state, sub, greedy, thresholds, variables,
                                  None)
    warm = np.asarray(record["values"])
    assert np.isfinite(warm).all(), "move_step produced non-finite values"

    for _ in range(warm_moves):
        rng, sub = jax.random.split(rng)
        state2 = step(state2, sub, variables)
    # drain the async warm dispatches so EVERY timed repeat starts
    # clean (ADVICE r4: without this the first repeat absorbs the
    # un-awaited warm moves and the measurement rests on one window)
    jax.block_until_ready(state2)

    dt, _, _ = _timed_move_steps(step, state2, variables, rng, n_moves,
                                 repeats)
    env_steps = b * search.simulations * n_moves
    return env_steps / dt


def _bench_e2e_continuous(size, net_cfg, search, game_batch, num_games):
    """End-to-end continuous self-play: device step + host harvest +
    replay ingestion (the pipeline selfplay phase's real rate).
    Returns (moves_per_s, env_steps_per_s, tree_fresh_rate)."""
    import jax

    from sejonggo_tpu.actor.continuous import ContinuousSelfPlay
    from sejonggo_tpu.learn import ReplayBuffer
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn

    net = AZNet.from_config(size, net_cfg)
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)
    actor = ContinuousSelfPlay(
        predict, variables, size=size, komi=5.5, search=search,
        game_batch=game_batch, stop_exploration=8,
        rng=jax.random.PRNGKey(0))
    replay = ReplayBuffer(200_000, size)
    # warm up (compile) with one game's worth of steps
    actor.run(num_games=1, on_game=replay.add_game)
    m0, t0 = actor.moves_recorded, time.perf_counter()
    actor.run(num_games=num_games, on_game=replay.add_game)
    dt = time.perf_counter() - t0
    moves = actor.moves_recorded - m0
    return (moves / dt, moves * search.simulations / dt,
            actor.tree_fresh_rate)


def main():
    import jax

    from sejonggo_tpu.config import NetConfig, SearchConfig

    # production TPU kernel set: fused Pallas step+legality on the
    # search leaf path + flood fixpoint for scoring/root legality
    # (A/B-measured best config, scripts/ab_gostep.py)
    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    on_cpu = jax.default_backend() == "cpu"

    # ---- 9x9 headline: B=3072 is the single-chip v5e sweet spot after
    # the compact-tree + MXU-gather rework (r1's B=2048 memory ceiling
    # is gone; sweep in scripts/sweep_batch_9x9.py: 2048 -> 730k,
    # 3072 -> 759k, 4096 -> 758k).  max_nodes=82 keeps a full decision's
    # expansions + a small reuse window (measured 115k -> 148k
    # env-steps/s vs the 2*sims default from HBM traffic).
    #
    # Leaf batch k=32 (2 rounds/move at 64 sims): after the r4
    # closure/squaring rework the per-round fixed overhead dominates the
    # non-network time, so fewer/fatter rounds win — A/B at B=3072:
    # k=16 979k, k=32 1.18M, k=64 1.27M env-steps/s.  k=32 is the
    # chosen point: it keeps within-move sequential deepening (2 PUCT
    # re-selections) and its 32/82 = 39% of the action space per round
    # is the same batching regime as the reference's MCTS_BATCH_SIZE
    # 100/362 = 28% (conf.py:36,33); k=64 (one round, pure root
    # breadth) would abandon in-move sequentiality for +8%.
    size9 = 9
    b9 = 64 if on_cpu else 3072
    search9 = SearchConfig(simulations=64, batch_size=32, use_symmetry=True,
                           max_nodes=82)
    net9 = NetConfig(blocks=4, filters=64, value_hidden=64,
                     compute_dtype="float32" if on_cpu else "bfloat16")
    _log(f"9x9 headline: B={b9} sims=64 ...")
    # n_moves=8: a ~1.8 s window keeps the fixed per-dispatch tunnel
    # latency (~25 ms) under ~1.5% of the measurement instead of ~3%
    value = _bench_search(size9, net9, search9, b9, n_moves=4 if on_cpu else 8)
    _log(f"9x9 headline: {value:,.0f} env-steps/s")

    extras = {"sims_per_s_9x9": round(value, 1)}

    # continuity point: the r1-r3 headline ran k=16 (4 rounds/move);
    # keep measuring it so the series BENCH_r01..r03 stays comparable
    if not on_cpu:
        try:
            search9_k16 = SearchConfig(simulations=64, batch_size=16,
                                       use_symmetry=True, max_nodes=82)
            with _deadline(600, "9x9 k16 continuity bench"):
                v16 = _bench_search(size9, net9, search9_k16, b9, n_moves=8)
            _log(f"9x9 k=16 continuity: {v16:,.0f} env-steps/s")
            extras["env_steps_per_s_9x9_k16"] = round(v16, 1)
        except Exception as e:  # noqa: BLE001
            _log(f"k16 continuity bench failed: {e}")
            extras["bench_k16_error"] = str(e)[:200]

    # ---- end-to-end continuous actor at the same operating point
    try:
        _log("9x9 end-to-end continuous actor ...")
        with _deadline(1200, "e2e bench"):
            e2e_moves, e2e_steps, fresh = _bench_e2e_continuous(
                size9, net9, search9, b9, num_games=max(b9 // 16, 4))
        _log(f"9x9 e2e: {e2e_moves:,.0f} moves/s, fresh={fresh:.3f}")
        extras["moves_per_s_9x9_e2e"] = round(e2e_moves, 2)
        extras["env_steps_per_s_9x9_e2e"] = round(e2e_steps, 1)
        extras["e2e_fraction_of_raw"] = round(e2e_steps / value, 4)
        extras["tree_fresh_rate_9x9"] = round(fresh, 4)
    except Exception as e:  # noqa: BLE001 — report, keep headline
        _log(f"e2e bench failed: {e}")
        extras["e2e_error"] = str(e)[:200]

    # ---- 19x19 reference operating point (conf.py:23,29,33,36):
    # 20 blocks x 256 filters, 1600 sims/move in 100-leaf NN batches.
    # max_nodes = sims + 618 reuse budget: the chosen child's subtree
    # (typically 40-70% of 1600 sims) survives re-rooting mostly intact
    # instead of being truncated to 18 stats-only slots — real tree
    # reuse at the reference point (VERDICT r2 item 4); the re-root
    # survivor mask uses the O(C log C) pointer-doubling path at this
    # capacity (search.mcts._keep_subtree_doubling).
    try:
        size19 = 19
        b19 = 2 if on_cpu else 16
        sims19 = 100 if on_cpu else 1600
        search19 = SearchConfig(simulations=sims19, batch_size=100,
                                use_symmetry=True,
                                max_nodes=sims19 + (18 if on_cpu else 618))
        net19 = NetConfig(blocks=2 if on_cpu else 20,
                          filters=32 if on_cpu else 256,
                          value_hidden=32 if on_cpu else 256,
                          compute_dtype="float32" if on_cpu else "bfloat16")
        _log(f"19x19 reference point: B={b19} sims={sims19} ...")
        # n_moves=4: at ~2.5 s/move the 2-move window under-measured raw
        # throughput by the per-dispatch tunnel latency, which made
        # e2e_fraction_19x19 read > 1.0 (VERDICT r3 Weak #4)
        with _deadline(1200, "19x19 bench"):
            v19 = _bench_search(size19, net19, search19, b19,
                                n_moves=1 if on_cpu else 4,
                                repeats=2,
                                warm_moves=0 if on_cpu else 24)
        _log(f"19x19: {v19:,.0f} env-steps/s")
        extras["env_steps_per_s_19x19"] = round(v19, 1)
        extras["sims_per_s_19x19"] = round(v19, 1)
        extras["moves_per_s_19x19"] = round(v19 / sims19, 3)
        # MFU at the reference point: conv FLOPs of one 19x19 inference
        # x leaf evals/s vs the chip's bf16 peak.  fwd conv FLOPs =
        # 2*H*W*Cin*Cout*k^2 (stem 17->F, 2 convs/block F->F, two
        # 1x1 head convs); the backward pass doesn't run here.
        hw = size19 * size19
        f = net19.filters
        conv_flops = 2 * hw * 9 * f * (17 + 2 * net19.blocks * f) \
            + 2 * hw * f * (net19.policy_filters + net19.value_filters)
        peak_bf16 = 197e12  # TPU v5e peak, bf16
        if not on_cpu:
            extras["model_gflops_per_eval_19x19"] = round(conv_flops / 1e9, 2)
            extras["mfu_19x19"] = round(v19 * conv_flops / peak_bf16, 4)

        # end-to-end continuous actor at 19x19 over a fixed step window
        # (whole games are minutes long here): device step + host
        # harvest + replay, plus reuse telemetry — surviving nodes per
        # re-root and the fresh-tree rate (VERDICT r2 item 4)
        if not on_cpu:
            import jax.numpy as jnp
            import numpy as np

            from sejonggo_tpu.actor.continuous import ContinuousSelfPlay
            from sejonggo_tpu.learn import ReplayBuffer
            from sejonggo_tpu.nets import (AZNet, init_variables,
                                           make_predict_fn)

            _log("19x19 end-to-end continuous window ...")
            with _deadline(1200, "19x19 e2e bench"):
                net = AZNet.from_config(size19, net19)
                variables = init_variables(net, jax.random.PRNGKey(0))
                actor = ContinuousSelfPlay(
                    make_predict_fn(net), variables, size=size19, komi=6.5,
                    search=search19, game_batch=b19, stop_exploration=30,
                    rng=jax.random.PRNGKey(0))
                replay = ReplayBuffer(50_000, size19)
                actor.run(num_games=b19 + 1, max_steps=8,
                          on_game=replay.add_game)  # compile + warm
                # >=150 continuous steps (or a 420s budget): the r3
                # 20-step window was too short for the fresh-rate /
                # reuse statistics to settle (VERDICT r3 Weak #4) —
                # chunks of 25 steps until the step target or budget
                m0, f0 = actor.moves_recorded, actor.fresh_trees
                steps_done = 0
                t0 = time.perf_counter()
                while steps_done < 150 and time.perf_counter() - t0 < 420:
                    actor.run(num_games=10**9, max_steps=25,
                              on_game=replay.add_game)
                    steps_done += 25
                dt = time.perf_counter() - t0
                moves = actor.moves_recorded - m0
                e2e19 = moves * sims19 / dt
                fresh19 = (actor.fresh_trees - f0) / max(moves, 1)
                reused = float(jnp.mean(
                    actor.state[1].n_nodes.astype(jnp.float32)))
                extras["e2e_window_steps_19x19"] = steps_done
            _log(f"19x19 e2e: {e2e19:,.0f} env-steps/s, fresh={fresh19:.3f},"
                 f" reused_nodes={reused:.0f}")
            extras["env_steps_per_s_19x19_e2e"] = round(e2e19, 1)
            # harvest/replay overhead measured on the SAME compiled
            # program (VERDICT r4 Weak #4: the old fraction divided the
            # continuous cstep rate by the eval-capable move_step rate —
            # two different programs — and could read > 1): one more
            # window of the very same actor with no replay ingestion;
            # the ratio isolates the host-side on_game work.
            with _deadline(600, "19x19 e2e control window"):
                m1 = actor.moves_recorded
                t1 = time.perf_counter()
                steps_b = 0
                while steps_b < 100 and time.perf_counter() - t1 < 300:
                    actor.run(num_games=10**9, max_steps=25, on_game=None)
                    steps_b += 25
                dt_b = time.perf_counter() - t1
                raw_cstep19 = (actor.moves_recorded - m1) * sims19 / dt_b
            extras["env_steps_per_s_19x19_no_ingest"] = round(raw_cstep19, 1)
            extras["replay_ingest_fraction_19x19"] = round(
                e2e19 / raw_cstep19, 4)
            # cross-program ratio kept under an honest name (cstep vs
            # the eval-capable move_step benched as v19)
            extras["cstep_vs_movestep_ratio_19x19"] = round(e2e19 / v19, 4)
            extras["tree_fresh_rate_19x19"] = round(fresh19, 4)
            extras["reused_nodes_per_move_19x19"] = round(reused, 1)
    except Exception as e:  # noqa: BLE001
        _log(f"19x19 bench failed: {e}")
        extras["bench_19x19_error"] = str(e)[:200]

    baseline = 100_000.0  # BASELINE.json north star, env-steps/s/chip
    print(json.dumps({
        "metric": "selfplay_env_steps_per_s_9x9",
        "value": round(value, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(value / baseline, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()

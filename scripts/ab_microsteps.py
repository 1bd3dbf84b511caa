"""Micro A/B of the non-round components of the 9x9 move step.

After the r4 closure/squaring rework the search round is 57% network;
the remaining move-level overhead lives in advance_root, new_tree_batch,
decide_batch and the root eval.  This script times, at the bench
operating point (B=3072, C=82):

1. advance_root with the compaction matmul at Precision.HIGHEST (6-pass
   bf16, the production setting) vs Precision.HIGH (3-pass);
2. new_tree_batch with and without the Dirichlet draw;
3. decide_batch.

MEASURED (v5e, 2026-08-21): HIGH is SLOWER (47.6 vs 44.0 ms isolated)
and NOT bit-equal (bf16x3 does not split every f32 exactly), so
_COMPACT_PRECISION stays HIGHEST; noise vs plain new_tree and decide
all time at the axon dispatch floor (~23-30 ms, CLAUDE.md) — the
isolated numbers are floor-bound and only end-to-end A/Bs can resolve
sub-10ms effects at this level.  The actionable outcome was the
leaf-batch-width A/B that followed: at the same 64-sim budget,
k=16 -> 979k, k=32 -> 1.18M, k=64 -> 1.27M env-steps/s (fewer, fatter
rounds amortize the per-round fixed overhead); bench.py's headline
moved to k=32.

Run: python scripts/ab_microsteps.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, repeats=7):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.goenv import engine
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
    from sejonggo_tpu.search import mcts, new_tree_batch, run_search
    from sejonggo_tpu.search.mcts import advance_root_batch

    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    size, b = 9, 3072
    search = SearchConfig(simulations=64, batch_size=16, use_symmetry=True,
                          max_nodes=82)
    net_cfg = NetConfig(blocks=4, filters=64, value_hidden=64,
                        compute_dtype="bfloat16")
    net = AZNet.from_config(size, net_cfg)
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)

    boards = jnp.stack([engine.init_board(size)] * b)
    feats = boards.astype(jnp.float32)
    policies, _ = jax.jit(predict)(variables, feats)
    trees = new_tree_batch(policies, boards, search.capacity(),
                           rng=jax.random.PRNGKey(1))
    searched = jax.jit(lambda t, r: run_search(
        t, lambda f: predict(variables, f), r,
        simulations=64, batch_size=16))(trees, jax.random.PRNGKey(2))
    jax.block_until_ready(searched)
    acts = jnp.argmax(searched.child_N[:, 0], axis=1).astype(jnp.int32)
    new_boards = jax.jit(engine.step_batch)(boards, acts)

    # 1. advance_root precision A/B (bit-compare, then timing)
    orig = mcts._COMPACT_PRECISION
    mcts._COMPACT_PRECISION = jax.lax.Precision.HIGHEST
    adv = jax.jit(lambda t, a, nb, _p=0: advance_root_batch(
        t, a, nb, reserve=64))
    out_hi = adv(searched, acts, new_boards)
    t_hi = _timeit(adv, searched, acts, new_boards)
    print(f"advance_root HIGHEST: {t_hi*1e3:8.2f} ms", flush=True)

    mcts._COMPACT_PRECISION = jax.lax.Precision.HIGH
    adv2 = jax.jit(lambda t, a, nb, _p=1: advance_root_batch(
        t, a, nb, reserve=64))
    out_lo = adv2(searched, acts, new_boards)
    same = all(
        bool(jnp.array_equal(a, c))
        for a, c in zip(jax.tree.leaves(out_lo), jax.tree.leaves(out_hi)))
    t_lo = _timeit(adv2, searched, acts, new_boards)
    print(f"advance_root HIGH:    {t_lo*1e3:8.2f} ms  bit-equal={same}",
          flush=True)
    mcts._COMPACT_PRECISION = orig

    # 2. new_tree_batch noise cost
    nt_noise = jax.jit(lambda p, bd: new_tree_batch(
        p, bd, search.capacity(), rng=jax.random.PRNGKey(3)))
    nt_plain = jax.jit(lambda p, bd: new_tree_batch(
        p, bd, search.capacity()))
    t_n = _timeit(nt_noise, policies, boards)
    t_p = _timeit(nt_plain, policies, boards)
    print(f"new_tree_batch noise: {t_n*1e3:8.2f} ms", flush=True)
    print(f"new_tree_batch plain: {t_p*1e3:8.2f} ms", flush=True)

    # 3. decide
    from sejonggo_tpu.search.mcts import decide_batch

    dec = jax.jit(lambda t: decide_batch(
        t, jnp.zeros((b,), bool), jax.random.PRNGKey(4)))
    t_d = _timeit(dec, searched)
    print(f"decide_batch:         {t_d*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Top individual device ops of one traced search round (VERDICT r4
Next #5: chase the HLOs behind the 19.1% layout-copy slice).

profile_breakdown.py reports per-HLO-CATEGORY totals; this script
lists the TOP-N individual ops (name + category + device ms summed
over occurrences) of a traced `simulate_round` at the CURRENT bench
operating point (B=3072, k=32, C=82 — the k=32 headline moved here
after profile_breakdown's k=16 trace), so layout-copy fixes target
measured ops instead of guesses.

Run: python scripts/trace_top_ops.py --trace-dir runs/trace_topops_r5
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _top_ops(trace_dir, top_n=30):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        evs = json.load(f)["traceEvents"]
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    ops = {}
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args") or {}
        hc = a.get("hlo_category")
        if hc is None:
            continue
        key = (e["name"], hc)
        ms, cnt, ln = ops.get(key, (0.0, 0, ""))
        ops[key] = (ms + e["dur"] / 1000.0, cnt + 1,
                    ln or a.get("long_name", "")[:220])
    rows = sorted(((ms, cnt, name, hc, ln)
                   for (name, hc), (ms, cnt, ln) in ops.items()),
                  key=lambda r: -r[0])
    return rows[:top_n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="runs/trace_topops_r5")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true",
                    help="just re-parse an existing trace dir")
    ap.add_argument("--full-move", action="store_true",
                    help="trace one full production move_step instead of a "
                    "standalone simulate_round.  A standalone round jit "
                    "forces argument/result layouts at program entry/exit, "
                    "inflating the copy share vs the fused move program "
                    "(where XLA picks consistent internal layouts) — this "
                    "mode measures the real thing.")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        import jax.numpy as jnp

        from sejonggo_tpu.config import NetConfig, SearchConfig
        from sejonggo_tpu.goenv import engine
        from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
        from sejonggo_tpu.ops import enable_tpu_kernels
        from sejonggo_tpu.search import new_tree_batch, run_search
        from sejonggo_tpu.search.mcts import simulate_round
        from sejonggo_tpu.utils.metrics import profile_trace

        on_cpu = jax.default_backend() == "cpu"
        if not on_cpu:
            enable_tpu_kernels(True)
        size = 9
        b = args.batch or (64 if on_cpu else 3072)
        k = args.k
        sims = 64
        search = SearchConfig(simulations=sims, batch_size=k,
                              use_symmetry=True, max_nodes=82)
        net_cfg = NetConfig(blocks=4, filters=64, value_hidden=64,
                            compute_dtype="float32" if on_cpu else "bfloat16")
        net = AZNet.from_config(size, net_cfg)
        variables = init_variables(net, jax.random.PRNGKey(0))
        predict = make_predict_fn(net)
        boards = jnp.stack([engine.init_board(size)] * b)
        policies0 = jnp.zeros((b, size * size + 1), jnp.float32)
        trees0 = new_tree_batch(policies0, boards, search.capacity())
        pfn = lambda x: predict(variables, x)  # noqa: E731
        if args.full_move:
            from sejonggo_tpu.actor.selfplay import _make_move_step

            move_step = _make_move_step(predict, None, search, size, True)
            state = (boards, trees0, jnp.zeros((b,), bool), None, None,
                     jnp.zeros((b,), bool), jnp.zeros((b,), bool),
                     jnp.ones((b,), bool))
            greedy = jnp.zeros((b,), bool)
            thr = jnp.full((b,), jnp.nan, jnp.float32)
            rng = jax.random.PRNGKey(0)
            for i in range(3):  # compile + warm into mid-game trees
                rng, sub = jax.random.split(rng)
                state, _, _ = move_step(state, sub, greedy, thr,
                                        variables, None)
            jax.block_until_ready(state)
            rng, sub = jax.random.split(rng)
            with profile_trace(args.trace_dir):
                state, _, _ = move_step(state, sub, greedy, thr,
                                        variables, None)
                jax.block_until_ready(state)
        else:
            # realistic mid-decision tree state: half the rounds done
            warm = jax.jit(lambda t: run_search(
                t, pfn, jax.random.PRNGKey(1), simulations=sims // 2,
                batch_size=k, use_symmetry=True))(trees0)
            slot_base = search.capacity() - sims + (sims // 2 // k) * k
            round_j = jax.jit(lambda t, r: simulate_round(
                t, pfn, r, batch_size=k, use_symmetry=True,
                slot_base=slot_base))
            r0 = jax.random.PRNGKey(2)
            jax.block_until_ready(round_j(warm, r0))
            with profile_trace(args.trace_dir):
                out = round_j(warm, r0)
                jax.block_until_ready(out)

    from profile_breakdown import _trace_breakdown

    crows, ctotal = _trace_breakdown(args.trace_dir)
    print(f"device total {ctotal:.2f} ms by category:")
    for kk, v in crows:
        print(f"  {kk:45s} {v:8.2f} ms  {v / ctotal:6.1%}")
    rows = _top_ops(args.trace_dir, args.top)
    total = sum(r[0] for r in rows)
    print(f"top {len(rows)} device ops (sum {total:.2f} ms shown):")
    for ms, cnt, name, hc, ln in rows:
        print(f"{ms:8.3f} ms  x{cnt:<3d} [{hc}] {name}")
        if hc in ("data formatting", "copy", "copy-start", "copy-done"):
            print(f"            {ln[:200]}")


if __name__ == "__main__":
    main()

"""Profiler corroboration of the 19x19 MFU number (VERDICT r4 Weak #3).

bench.py's ``mfu_19x19`` multiplies a hand conv-FLOP count (17.06
GF/eval at the 20x256 production net) by the measured eval rate against
a 197 TF bf16 peak constant — formula-derived, never checked against a
profile.  This script captures a real XProf trace of the exact 19x19
bench window (B=16, 1600 sims/move in 100-leaf rounds) and reports:

- device time by HLO category (conv/dot vs everything else),
- device busy time vs wall time (dispatch/idle gaps),
- trace-corroborated utilization:
    formula FLOPs of the window / conv device time   vs the 197 TF peak
    formula FLOPs of the window / wall time          (= bench mfu_19x19)

Writes PROFILE_19x19.md (--out) and leaves the trace under --trace-dir.

Run: python scripts/profile_19x19.py --trace-dir runs/trace_19x19_r5 \
        --out PROFILE_19x19.md
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_breakdown import _trace_breakdown  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="runs/trace_19x19_r5")
    ap.add_argument("--out", default=None, help="write PROFILE_19x19.md here")
    ap.add_argument("--moves", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.goenv import engine
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
    from sejonggo_tpu.ops import enable_tpu_kernels
    from sejonggo_tpu.utils.metrics import profile_trace
    from sejonggo_tpu.actor.selfplay import _make_move_step

    on_cpu = jax.default_backend() == "cpu"
    if not on_cpu:
        enable_tpu_kernels(True)

    # the exact bench.py 19x19 reference operating point
    size, b, sims, k = 19, 16, 1600, 100
    search = SearchConfig(simulations=sims, batch_size=k, use_symmetry=True,
                          max_nodes=sims + 618)
    net_cfg = NetConfig(blocks=20, filters=256, value_hidden=256,
                        compute_dtype="bfloat16")
    net = AZNet.from_config(size, net_cfg)
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)

    from sejonggo_tpu.search import new_tree_batch

    move_step = _make_move_step(predict, None, search, size, True)
    boards = jnp.stack([engine.init_board(size)] * b)
    trees = new_tree_batch(jnp.zeros((b, size * size + 1), jnp.float32),
                           boards, search.capacity())
    state = (jnp.array(boards, copy=True), trees, jnp.zeros((b,), bool),
             None, None, jnp.zeros((b,), bool), jnp.zeros((b,), bool),
             jnp.ones((b,), bool))
    greedy = jnp.zeros((b,), bool)
    thresholds = jnp.full((b,), jnp.nan, jnp.float32)
    rng = jax.random.PRNGKey(0)

    def step(state, sub):
        state, rec, _ = move_step(state, sub, greedy, thresholds,
                                  variables, None)
        return state, rec

    # compile + verify (the axon tunnel can silently no-op programs)
    import numpy as np

    rng, sub = jax.random.split(rng)
    state, rec = step(state, sub)
    assert np.isfinite(np.asarray(rec["values"])).all()
    for _ in range(2):  # warm
        rng, sub = jax.random.split(rng)
        state, rec = step(state, sub)
    jax.block_until_ready(state)

    os.makedirs(args.trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with profile_trace(args.trace_dir):
        for _ in range(args.moves):
            rng, sub = jax.random.split(rng)
            state, rec = step(state, sub)
        jax.block_until_ready(state)
    wall_s = time.perf_counter() - t0

    rows, device_ms = _trace_breakdown(args.trace_dir)

    hw = size * size
    f = net_cfg.filters
    conv_flops = 2 * hw * 9 * f * (17 + 2 * net_cfg.blocks * f) \
        + 2 * hw * f * (net_cfg.policy_filters + net_cfg.value_filters)
    evals = args.moves * b * (sims + 1)   # leaf evals + root eval per move
    window_flops = conv_flops * evals
    peak = 197e12

    conv_ms = sum(v for kk, v in rows if kk.startswith("network"))
    out = {
        "wall_s": round(wall_s, 3),
        "device_busy_ms": round(device_ms, 1),
        "device_busy_frac_of_wall": round(device_ms / 1000.0 / wall_s, 4),
        "conv_device_ms": round(conv_ms, 1),
        "conv_frac_of_device": round(conv_ms / max(device_ms, 1e-9), 4),
        "window_model_tflop": round(window_flops / 1e12, 2),
        "mfu_vs_wall (bench formula)": round(
            window_flops / wall_s / peak, 4),
        "mxu_util_during_conv": round(
            window_flops / (conv_ms / 1000.0) / peak, 4) if conv_ms else None,
        "env_steps_per_s": round(args.moves * b * sims / wall_s, 1),
    }
    print(json.dumps(out, indent=2))
    for kk, v in rows:
        print(f"  {kk:45s} {v:10.1f} ms  {v / max(device_ms, 1e-9):6.1%}")

    if args.out:
        with open(args.out, "w") as fo:
            fo.write("# PROFILE_19x19 — trace-corroborated utilization "
                     "(round 5)\n\n")
            fo.write("The 19x19 bench point (B=16, 1600 sims/move, 100-leaf "
                     "rounds, 20x256 bf16 net) profiled with XProf; "
                     f"{args.moves} moves, trace in `{args.trace_dir}/`.\n\n")
            fo.write("| quantity | value |\n|---|---|\n")
            for kk, v in out.items():
                fo.write(f"| {kk} | {v} |\n")
            fo.write("\n## Device time by HLO category\n\n")
            fo.write("| category | ms | share |\n|---|---|---|\n")
            for kk, v in rows:
                fo.write(f"| {kk} | {v:.1f} | "
                         f"{v / max(device_ms, 1e-9):.1%} |\n")
            fo.write(
                "\nReading: `mfu_vs_wall` is what bench.py's formula "
                "reports (model FLOPs over wall time vs the 197 TF bf16 "
                "peak); `mxu_util_during_conv` is the same FLOPs over "
                "the trace's conv device time — how hard the MXU runs "
                "while convolving.  The gap between them is non-conv "
                "device work plus dispatch/idle (see the category "
                "table and `device_busy_frac_of_wall`).  Excluded "
                "terms (BN, dense heads, padding of 361 to tile "
                "sizes) mean the true utilization sits between the "
                "two numbers.\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

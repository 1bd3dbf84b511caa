"""A/B the round-4 search-round reworks at the 9x9 bench point.

Measures raw move-step throughput (bench._bench_search) with each
rework toggled independently:

- closure backup (_CLOSURE_BACKUP_MAX_ROWS): while-loop climb ->
  signed-reachability matmul + one C-wide scatter;
- MXU ancestor chain (_MXU_CHAIN_MAX_ROWS): 7 dependent per-element
  parent chases -> one-hot matmul hops in leaf_features.

Run on the TPU: python scripts/ab_closure_backup.py [--moves 4]
Appends one JSON line per variant to stdout and runs/ab_closure.log.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--moves", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=3072)
    args = ap.parse_args()

    import jax

    import sejonggo_tpu.search.mcts as mcts
    from bench import _bench_search
    from sejonggo_tpu.config import NetConfig, SearchConfig

    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    search9 = SearchConfig(simulations=64, batch_size=16, use_symmetry=True,
                           max_nodes=82)
    net9 = NetConfig(blocks=4, filters=64, value_hidden=64,
                     compute_dtype="bfloat16")

    variants = [
        ("both_on", {}),
        ("closure_off", {"_CLOSURE_BACKUP_MAX_ROWS": 0}),
        ("chain_off", {"_MXU_CHAIN_MAX_ROWS": 0}),
        ("both_off", {"_CLOSURE_BACKUP_MAX_ROWS": 0,
                      "_MXU_CHAIN_MAX_ROWS": 0}),
    ]
    defaults = {k: getattr(mcts, k)
                for k in ("_CLOSURE_BACKUP_MAX_ROWS", "_MXU_CHAIN_MAX_ROWS")}
    out_path = os.path.join("runs", "ab_closure.log")
    os.makedirs("runs", exist_ok=True)
    for name, overrides in variants:
        for k, v in {**defaults, **overrides}.items():
            setattr(mcts, k, v)
        v = _bench_search(9, net9, search9, args.batch, n_moves=args.moves,
                          repeats=args.repeats)
        line = json.dumps({"variant": name,
                           "env_steps_per_s": round(v, 1), **overrides})
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")
    for k, v in defaults.items():
        setattr(mcts, k, v)


if __name__ == "__main__":
    main()

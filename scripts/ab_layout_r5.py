"""One-point headline bench for the r5 layout-copy fixes (VERDICT r4
Next #5): measures ONLY the 9x9 headline operating point (B=3072,
sims=64, k=32, max_nodes=82) via bench._bench_search and prints
env-steps/s.  Run before/after a layout change for a like-for-like A/B
on the same chip in the same session.

Run: python scripts/ab_layout_r5.py [--k 32] [--moves 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--moves", type=int, default=8)
    ap.add_argument("--batch", type=int, default=3072)
    args = ap.parse_args()

    import jax

    from bench import _bench_search
    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.ops import enable_tpu_kernels

    if jax.default_backend() != "cpu":
        enable_tpu_kernels(True)
    search = SearchConfig(simulations=64, batch_size=args.k,
                          use_symmetry=True, max_nodes=82)
    net = NetConfig(blocks=4, filters=64, value_hidden=64,
                    compute_dtype="bfloat16")
    t0 = time.time()
    v = _bench_search(9, net, search, args.batch, n_moves=args.moves)
    print(f"9x9 B={args.batch} k={args.k}: {v:,.0f} env-steps/s "
          f"({time.time() - t0:.0f}s incl. compile)")


if __name__ == "__main__":
    main()

"""A/B the fused Pallas step+legality kernel on the real TPU.

VERDICT r2 Weak #1: ops/gostep.py is bit-exact-tested but was never
enabled on the benched/production path, so its value was unknown.
This script measures the 9x9 headline point and the 19x19 reference
point under (flood only) vs (flood + gostep) vs (pure XLA) and prints
one JSON line per config.

Run: python scripts/ab_gostep.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="9x9 only, fewer repeats")
    ap.add_argument("--configs", default="flood,flood+gostep,xla",
                    help="comma list: flood, flood+gostep, gostep, xla")
    args = ap.parse_args()

    import jax

    from bench import _bench_search
    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.ops import enable_pallas_flood, enable_pallas_gostep

    on_cpu = jax.default_backend() == "cpu"

    points = {
        "9x9": dict(
            size=9, game_batch=64 if on_cpu else 2048,
            search=SearchConfig(simulations=64, batch_size=16,
                                use_symmetry=True, max_nodes=82),
            net=NetConfig(blocks=4, filters=64, value_hidden=64,
                          compute_dtype="float32" if on_cpu else "bfloat16"),
            n_moves=4),
        "19x19": dict(
            size=19, game_batch=2 if on_cpu else 16,
            search=SearchConfig(simulations=100 if on_cpu else 1600,
                                batch_size=100, use_symmetry=True,
                                max_nodes=(100 if on_cpu else 1600) + 18),
            net=NetConfig(blocks=2 if on_cpu else 20,
                          filters=32 if on_cpu else 256,
                          value_hidden=32 if on_cpu else 256,
                          compute_dtype="float32" if on_cpu else "bfloat16"),
            n_moves=1),
    }
    if args.quick:
        del points["19x19"]

    def set_impl(name):
        enable_pallas_flood("flood" in name and not on_cpu)
        enable_pallas_gostep("gostep" in name and not on_cpu)

    for cfg_name in args.configs.split(","):
        for pt_name, pt in points.items():
            set_impl(cfg_name)
            t0 = time.time()
            v = _bench_search(pt["size"], pt["net"], pt["search"],
                              pt["game_batch"], n_moves=pt["n_moves"],
                              repeats=2)
            print(json.dumps({
                "config": cfg_name, "point": pt_name,
                "env_steps_per_s": round(v, 1),
                "wall_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()

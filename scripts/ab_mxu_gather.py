"""A/B the one-hot MXU row gather vs the native gather at the 19x19
bench point (C=2218 tree capacity, where the matmul must read all C
rows per gather — the 9x9 win at C=82 is established,
runs/bench9_mxu_gather.log).

Run: python scripts/ab_mxu_gather.py
Prints one JSON line with env-steps/s per threshold setting.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bench import _bench_search
    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.search import mcts

    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    search19 = SearchConfig(simulations=1600, batch_size=100,
                            use_symmetry=True, max_nodes=1600 + 618)
    net19 = NetConfig(blocks=20, filters=256, value_hidden=256,
                      compute_dtype="bfloat16")
    out = {}
    for label, thresh in (("mxu_gather", 4096), ("native_gather", 0)):
        mcts._MXU_GATHER_MAX_ROWS = thresh
        v = _bench_search(19, net19, search19, 16, n_moves=1, repeats=3)
        out[f"env_steps_per_s_19x19_{label}"] = round(v, 1)
        print(f"[ab] {label}: {v:,.0f} env-steps/s", file=sys.stderr,
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Game-batch sweep at the 9x9 headline point.

B=2048 was chosen in round 1 (B=4096 exceeded the compiler's memory
budget then); the compact stone-grid tree and the MXU gather rework
changed the memory/throughput balance, so re-measure.

Run: python scripts/sweep_batch_9x9.py [B ...]
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

    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    search9 = SearchConfig(simulations=64, batch_size=16, use_symmetry=True,
                           max_nodes=82)
    net9 = NetConfig(blocks=4, filters=64, value_hidden=64,
                     compute_dtype="bfloat16")
    bs = [int(a) for a in sys.argv[1:]] or [2048, 3072, 4096]
    out = {}
    for b in bs:
        try:
            v = _bench_search(9, net9, search9, b, n_moves=4, repeats=3)
            out[f"env_steps_per_s_9x9_B{b}"] = round(v, 1)
            print(f"[sweep] B={b}: {v:,.0f} env-steps/s", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001 — OOM etc., keep sweeping
            out[f"env_steps_per_s_9x9_B{b}"] = f"error: {str(e)[:120]}"
            print(f"[sweep] B={b}: {str(e)[:160]}", file=sys.stderr,
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

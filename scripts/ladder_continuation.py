"""Ladder rungs for a continuation strength run (workdir seeded from a
prior run's best checkpoint, so model_1/mid rungs of strength_report.py
don't exist).  Duels the new best against the seed checkpoint and the
heuristic engine, appending to <workdir>/strength.jsonl with SGFs under
<workdir>/duels/ — same evidence format as scripts/strength_report.py.

Run: python scripts/ladder_continuation.py --workdir runs/strength_r3b \
        --seed-model model_39 [--games 64]
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
    ap.add_argument("--workdir", default="runs/strength_r3b")
    ap.add_argument("--seed-model", default="model_39")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--preset", default="strength",
                    choices=["tiny", "strength", "full"])
    args = ap.parse_args()

    from sejonggo_tpu.config import full_19x19, small_9x9, strength_9x9
    from sejonggo_tpu.learn import CheckpointStore
    from sejonggo_tpu.learn.duel import duel
    from sejonggo_tpu.utils.metrics import MetricsLogger

    cfg = {"tiny": small_9x9, "strength": strength_9x9,
           "full": full_19x19}[args.preset]()
    model_dir = os.path.join(args.workdir, cfg.model_dir)
    store = CheckpointStore(model_dir)
    best = store.best_name()
    assert best, f"no best checkpoint under {model_dir}"
    metrics = MetricsLogger(os.path.join(args.workdir, "strength.jsonl"))
    sgf_root = os.path.join(args.workdir, "duels")

    for b in [args.seed_model, "heuristic"]:
        if best == b:
            continue
        t0 = time.time()
        res = duel(best, b, cfg=cfg, model_dir=model_dir, games=args.games,
                   sgf_dir=os.path.join(sgf_root, f"{best}_vs_{b}"))
        res["seconds"] = round(time.time() - t0, 1)
        print(json.dumps(res), flush=True)
        metrics.log("duel", **res)


if __name__ == "__main__":
    main()

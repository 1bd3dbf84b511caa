"""Strength-ladder evidence for a finished strength run.

Reference counterpart: the 5 committed GNU Go games (real_games/*.sgf)
and the manual checkpoint duels of test/play_test.py:12-37.  Here the
ladder is fully automated: the promoted best model duels

  1. model_1 (the untrained starting point),
  2. the mid-run best (generation ~half),
  3. the model-free heuristic rollout engine,
  4. (optionally) an external GTP engine (GNU Go when installed).

Winrates + Elo diffs are appended to <workdir>/strength.jsonl and every
game is committed as SGF under <workdir>/duels/.

Run: python scripts/strength_report.py --workdir runs/strength_r2 \
        [--games 64] [--gtp "gnugo --mode gtp --level 1"]
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
    ap.add_argument("--workdir", default="runs/strength_r2")
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--gtp", default=None,
                    help="external GTP command (e.g. 'gnugo --mode gtp')")
    ap.add_argument("--preset", default="strength",
                    choices=["tiny", "strength", "full"])
    args = ap.parse_args()

    from sejonggo_tpu.config import full_19x19, small_9x9, strength_9x9
    from sejonggo_tpu.learn import CheckpointStore
    from sejonggo_tpu.learn.duel import duel, duel_vs_gtp
    from sejonggo_tpu.utils.metrics import MetricsLogger

    cfg = {"tiny": small_9x9, "strength": strength_9x9,
           "full": full_19x19}[args.preset]()
    model_dir = os.path.join(args.workdir, cfg.model_dir)
    store = CheckpointStore(model_dir)
    best = store.best_name()
    latest = store.latest_name()
    assert best and latest, f"no checkpoints under {model_dir}"
    mid = f"model_{max(int(latest.split('_')[1]) // 2, 1)}"
    metrics = MetricsLogger(os.path.join(args.workdir, "strength.jsonl"))
    sgf_root = os.path.join(args.workdir, "duels")

    ladder = [(best, "model_1"), (best, mid), (best, "heuristic")]
    for a, b in ladder:
        if a == b:
            continue
        t0 = time.time()
        res = duel(a, b, cfg=cfg, model_dir=model_dir, games=args.games,
                   sgf_dir=os.path.join(sgf_root, f"{a}_vs_{b}"))
        res["seconds"] = round(time.time() - t0, 1)
        print(json.dumps(res))
        metrics.log("duel", **res)

    if args.gtp:
        t0 = time.time()
        res = duel_vs_gtp(best, args.gtp, cfg=cfg, model_dir=model_dir,
                          games=min(args.games, 10))
        res.update(a=best, b=f"gtp:{args.gtp}",
                   seconds=round(time.time() - t0, 1))
        print(json.dumps(res))
        metrics.log("duel_gtp", **res)


if __name__ == "__main__":
    main()

"""Calibration run for tests/test_slow_learning.py's closed-loop test:
run the exact test config for N generations and print the per-gen gate
winrate + promotion history, so the test's generation budget can be set
where promotion is reliable rather than marginal (it failed at 6 gens
with winrates still climbing: 0.19 -> 0.375).

Run: python scripts/calibrate_slow_loop.py [--gens 14] [--seed 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=14)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--games", type=int, default=32)
    args = ap.parse_args()

    from sejonggo_tpu.config import (EvalConfig, GoConfig, NetConfig,
                                     SearchConfig, SelfPlayConfig,
                                     TrainConfig, small_9x9)
    from sejonggo_tpu.pipeline import Pipeline

    cfg = dataclasses.replace(
        small_9x9(),
        go=GoConfig(size=9, komi=5.5),
        net=NetConfig(blocks=1, filters=16, value_hidden=16,
                      compute_dtype="float32"),
        search=SearchConfig(simulations=32, batch_size=8,
                            use_symmetry=True, policy_target="visits",
                            negamax=True, dirichlet_alpha=0.25),
        selfplay=SelfPlayConfig(num_games=args.games, stop_exploration=8,
                                game_batch=16, resignation_percent=1.0),
        train=TrainConfig(batch_size=64, iters_per_epoch=64,
                          epochs_per_save=args.epochs, replay_window=6144,
                          lr=args.lr),
        eval=EvalConfig(num_games=16, margin=0.55),
    )
    with tempfile.TemporaryDirectory() as tmp:
        pipe = Pipeline(cfg, tmp, seed=args.seed)
        promos = []
        for gen in range(args.gens):
            t0 = time.time()
            prev = pipe.store.best_name()
            r = pipe.run(generations=1)[0]
            best = pipe.store.best_name()
            if best != prev:
                promos.append((gen, best))
            print(json.dumps({
                "gen": gen, "s": round(time.time() - t0, 1),
                "winrate": r["evaluate"].get("winrate"),
                "loss": round(r["train"].get("loss", float("nan")), 3),
                "best": best}), flush=True)
        print(json.dumps({"promotions": promos}), flush=True)


if __name__ == "__main__":
    main()

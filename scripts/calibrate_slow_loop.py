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
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--filters", type=int, default=16)
    ap.add_argument("--end-duel", type=int, default=0,
                    help="after the loop, duel best vs model_1 over N games")
    args = ap.parse_args()

    from sejonggo_tpu.config import (EvalConfig, GoConfig, NetConfig,
                                     SearchConfig, SelfPlayConfig,
                                     TrainConfig, small_9x9)
    from sejonggo_tpu.pipeline import Pipeline

    cfg = dataclasses.replace(
        small_9x9(),
        go=GoConfig(size=9, komi=5.5),
        net=NetConfig(blocks=args.blocks, filters=args.filters,
                      value_hidden=args.filters, compute_dtype="float32"),
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
        if args.end_duel and pipe.store.best_name() != "model_1":
            import jax

            from sejonggo_tpu.learn import evaluate_models

            bs = pipe.load(pipe.store.best_name())
            m1 = pipe.load("model_1")
            res = evaluate_models(
                pipe.predict, pipe.predict, size=9, komi=5.5,
                search=cfg.search, eval_cfg=EvalConfig(
                    num_games=args.end_duel, margin=0.55),
                rng=jax.random.PRNGKey(123),
                variables_latest={"params": bs.params,
                                  "batch_stats": bs.batch_stats},
                variables_best={"params": m1.params,
                                "batch_stats": m1.batch_stats},
                game_batch=16)
            print(json.dumps({"end_duel": res["winrate"],
                              "best": pipe.store.best_name()}), flush=True)


if __name__ == "__main__":
    main()

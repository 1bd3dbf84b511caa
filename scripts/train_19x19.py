"""Produce a trained 19x19 artifact on TPU (VERDICT r4 Next #3).

The reference's deployment config is 19x19 (conf.py:33,
main_training.py:34-98: KGS-supervised pretraining feeding the
self-play loop).  This driver runs that exact shape end-to-end at
production net size (full_19x19: 20 blocks x 256 filters, 1600
sims/move) with a reduced game count:

1. corpus: generate 19x19 games with the model-free heuristic engine
   (search/rollout.py predict_fn under the production search), saved as
   SGFs — the local stand-in for a KGS archive (no egress), merged with
   the reference's real 19x19 games (real_games/*.sgf, read-only);
2. KGS-pretrain the production net on that corpus
   (Pipeline.kgs_pretrain_phase = main_training.py parity);
3. run >=2 closed-loop generations (selfplay -> train -> gate) at
   num_games=8 with calibrated resignation LIVE (reference
   self_play.py:310-330), committing the checkpoint + metrics.

Run: python scripts/train_19x19.py --workdir runs/full19_r5
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_GAMES = "/root/reference/real_games"


def make_config(selfplay_games: int, game_batch: int, eval_games: int,
                train_epochs: int, eval_max_moves=None):
    from sejonggo_tpu.config import (EvalConfig, SelfPlayConfig, TrainConfig,
                                     full_19x19)

    cfg = full_19x19()
    return cfg.replace(
        selfplay=SelfPlayConfig(
            num_games=selfplay_games, stop_exploration=30,
            resignation_percent=0.10, resignation_cap=-0.90,
            game_batch=game_batch),
        eval=EvalConfig(num_games=eval_games, margin=0.55,
                        max_moves=eval_max_moves),
        train=dataclasses.replace(TrainConfig(), epochs_per_save=train_epochs),
    )


def generate_corpus(outdir: str, *, games: int, game_batch: int,
                    sims: int, seed: int) -> int:
    """Self-play the heuristic rollout engine at 19x19 and save SGFs
    (the 'locally generated corpus' half of the pretraining data)."""
    import jax

    from sejonggo_tpu.config import SearchConfig
    from sejonggo_tpu.learn.duel import save_gamebatch_sgfs
    from sejonggo_tpu.actor import play_games
    from sejonggo_tpu.search.rollout import make_heuristic_predict_fn

    os.makedirs(outdir, exist_ok=True)
    existing = [f for f in os.listdir(outdir) if f.endswith(".sgf")]
    if len(existing) >= games:
        print(f"corpus: {len(existing)} SGFs already present, skipping")
        return len(existing)
    predict = make_heuristic_predict_fn(7.5)
    search = SearchConfig(simulations=sims, batch_size=max(sims // 4, 8),
                          dirichlet_alpha=0.03, max_nodes=3 * sims)
    rng = jax.random.PRNGKey(seed)
    done = 0
    batch_i = 0
    while done < games:
        b = min(game_batch, games - done)
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        gb = play_games(predict, size=19, komi=7.5, search=search,
                        game_batch=b, rng=sub, selfplay=True,
                        stop_exploration=30)
        save_gamebatch_sgfs(gb, size=19, komi=7.5, outdir=outdir,
                            prefix=f"rollout_{batch_i:02d}",
                            a_name="rollout", b_name="rollout")
        done += b
        batch_i += 1
        print(f"corpus: {done}/{games} games "
              f"({time.time() - t0:.0f}s/batch, "
              f"mean_moves={float(gb.num_moves.mean()):.0f})", flush=True)
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/full19_r5")
    ap.add_argument("--corpus-games", type=int, default=48)
    ap.add_argument("--corpus-batch", type=int, default=24)
    ap.add_argument("--corpus-sims", type=int, default=48)
    ap.add_argument("--pretrain-steps", type=int, default=600)
    ap.add_argument("--generations", type=int, default=2)
    ap.add_argument("--games", type=int, default=8,
                    help="self-play games per generation")
    ap.add_argument("--game-batch", type=int, default=8)
    ap.add_argument("--eval-games", type=int, default=8)
    ap.add_argument("--eval-max-moves", type=int, default=0,
                    help="move cap for eval games (0 = engine default "
                    "2*N*N; capped games are decided by area score)")
    ap.add_argument("--train-epochs", type=int, default=8,
                    help="epochs_per_save for the closed-loop train phase "
                    "(reference 300 is a multi-day budget)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-corpus", action="store_true")
    ap.add_argument("--skip-pretrain", action="store_true")
    args = ap.parse_args()

    from sejonggo_tpu.pipeline import Pipeline
    from sejonggo_tpu.utils.metrics import setup_logging

    os.makedirs(args.workdir, exist_ok=True)
    setup_logging(os.path.join(args.workdir, "logs"))

    def emit(line):
        print(json.dumps(line), flush=True)
        with open(os.path.join(args.workdir, "train19.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")

    # 1. corpus ---------------------------------------------------------
    corpus = os.path.join(args.workdir, "corpus")
    if not args.skip_corpus:
        t0 = time.time()
        n = generate_corpus(corpus, games=args.corpus_games,
                            game_batch=args.corpus_batch,
                            sims=args.corpus_sims, seed=args.seed + 7)
        emit({"event": "corpus", "games": n,
              "seconds": round(time.time() - t0, 1)})
    # merge in the reference's real 19x19 games (read-only): symlinks
    os.makedirs(corpus, exist_ok=True)
    if os.path.isdir(REFERENCE_GAMES):
        for f in os.listdir(REFERENCE_GAMES):
            if f.endswith(".sgf"):
                dst = os.path.join(corpus, f)
                if not os.path.exists(dst):
                    os.symlink(os.path.join(REFERENCE_GAMES, f), dst)

    # 2. pipeline: pretrain + closed loop -------------------------------
    cfg = make_config(args.games, args.game_batch, args.eval_games,
                      args.train_epochs,
                      eval_max_moves=args.eval_max_moves or None)
    pipe = Pipeline(cfg, args.workdir, seed=args.seed)
    resumed = pipe.load_run_state()
    pipe.init_models()
    emit({"event": "start", "resumed": resumed,
          "best": pipe.store.best_name(),
          "latest": pipe.store.latest_name()})

    if not args.skip_pretrain and pipe.store.latest_name() == "model_1":
        t0 = time.time()
        stats = pipe.kgs_pretrain_phase(corpus, args.pretrain_steps,
                                        backup_every=200)
        emit({"event": "kgs_pretrain",
              **{k: v for k, v in stats.items()
                 if isinstance(v, (int, float, str))}})
        # the pretrained net becomes best so self-play uses it
        pipe.store.set_best(pipe.store.latest_name())
        emit({"event": "pretrain_promoted", "best": pipe.store.best_name(),
              "seconds": round(time.time() - t0, 1)})

    for gen in range(args.generations):
        t0 = time.time()
        r = pipe.run(generations=1)[0]
        sp, tr, ev = r["selfplay"], r["train"], r["evaluate"]
        emit({"event": "generation", "gen": gen,
              "seconds": round(time.time() - t0, 1),
              "games": sp["games"], "moves": sp["moves"],
              "env_steps_per_s": round(sp["env_steps_per_s"], 1),
              "resign_threshold": sp.get("resign_threshold"),
              "resigned_games": sp.get("resigned_games"),
              "winner_dip_rate": sp.get("winner_dip_rate"),
              "loss": round(tr.get("loss", float("nan")), 4),
              "gate_winrate": ev.get("winrate"),
              "promote": ev.get("promote"),
              "best": pipe.store.best_name()})

    emit({"event": "done", "best": pipe.store.best_name(),
          "latest": pipe.store.latest_name()})


if __name__ == "__main__":
    main()

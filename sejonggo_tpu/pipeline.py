"""Closed actor-learner loop: self-play -> train -> evaluate -> gate.

Reference counterpart: pipeline_sequent.py / main.py:13-28 — the
sequential loop of (self-play with best model) -> (train latest) ->
(evaluate latest vs best) -> (promote on >55% winrate), with "best" and
"latest" as the only global state.  The reference spreads this over
worker processes, a cross-process prediction service, dbm phase flags
and scp; here it is one process driving on-device batched calls, with
the CheckpointStore carrying the best/latest identities.
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.actor import ResignCalibrator, play_games
from sejonggo_tpu.config import Config, full_19x19, small_9x9
from sejonggo_tpu.learn import (
    CheckpointStore,
    ReplayBuffer,
    evaluate_models,
    make_optimizer,
    make_train_step,
)
from sejonggo_tpu.learn.train import init_train_state
from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn

logger = logging.getLogger("sejonggo_tpu.pipeline")


class Pipeline:
    def __init__(self, cfg: Config, workdir: str = ".", seed: int = 0):
        self.cfg = cfg
        self.workdir = workdir
        self.store = CheckpointStore(os.path.join(workdir, cfg.model_dir))
        self.net = AZNet.from_config(cfg.go.size, cfg.net)
        self.predict = make_predict_fn(self.net)
        self.tx = make_optimizer(cfg.train.lr, cfg.train.momentum, cfg.net.l2)
        self.train_step = make_train_step(self.net, self.tx, cfg.train.loss_mode)
        self.rng = jax.random.PRNGKey(seed)
        self.replay = ReplayBuffer(cfg.train.replay_window, cfg.go.size,
                                   seed=seed)
        self.calibrator = ResignCalibrator(
            cfg.selfplay.resignation_percent,
            cfg.selfplay.resignation_allowed_error, seed=seed)
        self.metrics_log: list = []

    def _split(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # --- model lifecycle (reference model.py:98-157) --------------------

    def init_models(self):
        """Create model_1 as best+latest if the store is empty
        (reference create_initial_model model.py:98-122)."""
        if self.store.latest_name() is None:
            variables = init_variables(self.net, self._split())
            state = init_train_state(self.net, variables, self.tx)
            self.store.save_state("model_1", state)
            self.store.set_best("model_1")
            logger.info("created initial model_1 (best)")

    def _template_state(self):
        variables = init_variables(self.net, jax.random.PRNGKey(0))
        return init_train_state(self.net, variables, self.tx)

    def load(self, name: str):
        return self.store.load_state(name, self._template_state())

    # --- phases ---------------------------------------------------------

    def selfplay_phase(self, num_games: int = 0) -> dict:
        """Generate games with the BEST model (reference
        main_selfplay.py / model_self_play self_play.py:293-340) using
        the continuous respawning actor: every device slot stays live
        instead of draining a lockstep batch."""
        from sejonggo_tpu.actor.continuous import ContinuousSelfPlay

        cfg = self.cfg
        best = self.store.best_name()
        state = self.load(best)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        n = num_games or cfg.selfplay.num_games
        t0 = time.time()
        actor = ContinuousSelfPlay(
            self.predict, variables, size=cfg.go.size, komi=cfg.go.komi,
            search=cfg.search, game_batch=cfg.selfplay.game_batch,
            stop_exploration=cfg.selfplay.stop_exploration,
            rng=self._split(),
            threshold_fn=self.calibrator.threshold_for_new_game)

        moves = 0

        def on_game(game):
            nonlocal moves
            self.calibrator.observe_game(game)
            moves += self.replay.add_game(game)

        actor.run(n, on_game=on_game)
        dt = time.time() - t0
        sims = moves * cfg.search.simulations
        stats = {
            "phase": "selfplay", "model": best, "games": actor.games_finished,
            "moves": moves, "seconds": dt,
            "moves_per_s": moves / max(dt, 1e-9),
            "sims_per_s": sims / max(dt, 1e-9),
            "resign_threshold": self.calibrator.current,
        }
        logger.info("selfplay: %s", stats)
        self.metrics_log.append(stats)
        return stats

    def train_phase(self) -> dict:
        """Train the latest model on the replay window and save
        model_<N+1> (reference train.py:24-72, TrainWorker)."""
        cfg = self.cfg
        latest = self.store.latest_name()
        state = self.load(latest)
        steps = cfg.train.epochs_per_save * cfg.train.iters_per_epoch
        t0 = time.time()
        last_metrics = {}
        for _ in range(steps):
            boards, policies, values = self.replay.sample(cfg.train.batch_size)
            state, metrics = self.train_step(
                state, jnp.asarray(boards), jnp.asarray(policies),
                jnp.asarray(values))
            last_metrics = metrics
        name = self.store.next_name()
        self.store.save_state(name, state)
        dt = time.time() - t0
        stats = {
            "phase": "train", "from": latest, "to": name, "steps": steps,
            "seconds": dt, "steps_per_s": steps / max(dt, 1e-9),
            **{k: float(v) for k, v in last_metrics.items()},
        }
        logger.info("train: %s", stats)
        self.metrics_log.append(stats)
        return stats

    def kgs_pretrain_phase(self, data_dir: str, steps: int,
                           backup_every: int = 0) -> dict:
        """Supervised pretraining from KGS SGFs (reference
        main_training.py:34-98 continuous trainer + KGSDataGenerator).
        Trains the latest model in place and saves model_<N+1>;
        `backup_every` steps writes a crash-recovery 'backup' checkpoint
        (reference EPOCHS_PER_BACKUP / save_backup_model)."""
        from sejonggo_tpu.io.kgs import kgs_sample_stream

        cfg = self.cfg
        latest = self.store.latest_name()
        state = self.load(latest)
        stream = kgs_sample_stream(
            data_dir, cfg.go.size, batch_size=cfg.train.batch_size,
            rng=np.random.RandomState(0), loop=True)
        t0 = time.time()
        last_metrics = {}
        done_steps = 0
        for boards, policies, values in stream:
            state, metrics = self.train_step(
                state, jnp.asarray(boards), jnp.asarray(policies),
                jnp.asarray(values))
            last_metrics = metrics
            done_steps += 1
            if backup_every and done_steps % backup_every == 0:
                self.store.save_state("backup", state)
            if done_steps >= steps:
                break
        name = self.store.next_name()
        self.store.save_state(name, state)
        dt = time.time() - t0
        stats = {
            "phase": "kgs_pretrain", "from": latest, "to": name,
            "steps": done_steps, "seconds": dt,
            **{k: float(v) for k, v in last_metrics.items()},
        }
        logger.info("kgs_pretrain: %s", stats)
        self.metrics_log.append(stats)
        return stats

    def evaluate_phase(self) -> dict:
        """Latest vs best gating (reference evaluator.py:23-47)."""
        cfg = self.cfg
        latest = self.store.latest_name()
        best = self.store.best_name()
        if latest == best:
            return {"phase": "evaluate", "skipped": True}
        ls = self.load(latest)
        bs = self.load(best)
        res = evaluate_models(
            self.predict, self.predict,
            size=cfg.go.size, komi=cfg.go.komi, search=cfg.search,
            eval_cfg=cfg.eval, rng=self._split(),
            variables_latest={"params": ls.params, "batch_stats": ls.batch_stats},
            variables_best={"params": bs.params, "batch_stats": bs.batch_stats},
            game_batch=min(cfg.eval.num_games, cfg.selfplay.game_batch),
        )
        if res["promote"]:
            self.store.set_best(latest)  # evaluator.py:43-46
            logger.info("promoted %s to best (winrate %.3f)", latest,
                        res["winrate"])
        stats = {"phase": "evaluate", "latest": latest, "best": best, **res}
        self.metrics_log.append(stats)
        return stats

    # --- run-state checkpoint/resume (beyond the reference, which only
    # checkpoints model files — SURVEY.md §5) --------------------------

    def save_run_state(self) -> None:
        """Persist replay window + resign calibration + RNG so a crashed
        or preempted run resumes exactly."""
        import json

        self.replay.save(os.path.join(self.workdir, "replay.npz"))
        meta = {
            "rng": np.asarray(jax.random.key_data(self.rng)).tolist(),
            "calibrator": {
                "min_values": self.calibrator.min_values,
                "current": self.calibrator.current,
            },
        }
        with open(os.path.join(self.workdir, "run_state.json"), "w") as f:
            json.dump(meta, f)

    def load_run_state(self) -> bool:
        import json

        replay_path = os.path.join(self.workdir, "replay.npz")
        meta_path = os.path.join(self.workdir, "run_state.json")
        if not (os.path.exists(replay_path) and os.path.exists(meta_path)):
            return False
        self.replay = ReplayBuffer.load(
            replay_path, self.cfg.train.replay_window, self.cfg.go.size)
        with open(meta_path) as f:
            meta = json.load(f)
        self.rng = jax.random.wrap_key_data(
            jnp.asarray(meta["rng"], jnp.uint32))
        self.calibrator.min_values = meta["calibrator"]["min_values"]
        self.calibrator.current = meta["calibrator"]["current"]
        return True

    def run(self, generations: int = 1, selfplay_games: int = 0):
        self.init_models()
        results = []
        for gen in range(generations):
            sp = self.selfplay_phase(selfplay_games)
            tr = self.train_phase()
            ev = self.evaluate_phase()
            self.save_run_state()
            results.append({"generation": gen, "selfplay": sp, "train": tr,
                            "evaluate": ev, "best": self.store.best_name()})
        return results


def main():
    parser = argparse.ArgumentParser(description="sejonggo-tpu pipeline")
    parser.add_argument("--preset", choices=["tiny", "full"], default="tiny")
    parser.add_argument("--generations", type=int, default=1)
    parser.add_argument("--games", type=int, default=0,
                        help="self-play games per generation (0 = preset)")
    parser.add_argument("--workdir", default="runs/pipeline")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    cfg = small_9x9() if args.preset == "tiny" else full_19x19()
    os.makedirs(args.workdir, exist_ok=True)
    pipe = Pipeline(cfg, args.workdir, seed=args.seed)
    results = pipe.run(args.generations, args.games)
    for r in results:
        print(r)


if __name__ == "__main__":
    main()

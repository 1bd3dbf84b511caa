"""Evaluator gating: latest vs best.

Reference counterpart: evaluator.py:23-47 — EVALUATE_N_GAMES games of
latest vs best with a random color per game (choose_first_player
play.py:301-306), promote when winrate > EVALUATE_MARGIN (0.55).  The
reference plays games one-by-one across worker processes; here the
whole match is a few lockstep batches on device.

Parity note: the reference's per-game winner comes from AREA SCORE of
the final position (play_game scores the board even on resignation,
self_play.py:250-261; resignation is off in evaluation anyway since
evaluate() passes no resign thresholds).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.actor import play_games
from sejonggo_tpu.config import EvalConfig, SearchConfig


def evaluate_models(
    predict_latest: Callable,
    predict_best: Callable,
    *,
    size: int,
    komi: float,
    search: SearchConfig,
    eval_cfg: EvalConfig,
    rng,
    variables_latest=None,
    variables_best=None,
    game_batch: int = 0,
    stop_exploration: int = 0,
    max_moves=None,
    mesh=None,
    mesh_axis: str = "dp",
    collect_games: bool = False,
) -> Dict:
    """Play eval_cfg.num_games latest-vs-best; returns winrate + stats.

    model1 = latest.  Colors are drawn uniformly per game.  Games run in
    batches of `game_batch` (defaults to num_games).
    """
    n = eval_cfg.num_games
    if game_batch <= 0:
        game_batch = n
    wins = 0
    draws = 0
    played = 0
    num_moves = []
    collected = []
    while played < n:
        b = min(game_batch, n - played)
        if mesh is not None and b % mesh.size:
            b += mesh.size - b % mesh.size  # keep the batch shardable
        rng, r_color, r_games = jax.random.split(rng, 3)
        latest_isblack = jax.random.bernoulli(r_color, 0.5, (b,))
        games = play_games(
            predict_latest, predict_best,
            size=size, komi=komi, search=search, game_batch=b,
            rng=r_games, variables1=variables_latest,
            variables2=variables_best, selfplay=False,
            stop_exploration=stop_exploration,
            model1_isblack=latest_isblack,
            max_moves=max_moves,
            mesh=mesh, mesh_axis=mesh_axis,
        )
        lb = np.asarray(latest_isblack)
        latest_won = (games.winners == 1) == lb
        latest_won &= games.winners != 0
        wins += int(latest_won.sum())
        draws += int((games.winners == 0).sum())
        played += b
        num_moves.extend(games.num_moves.tolist())
        if collect_games:
            collected.append(games)
    winrate = wins / played
    out = {
        "winrate": winrate,
        "wins": wins,
        "draws": draws,
        "games": played,
        "promote": winrate > eval_cfg.margin,   # evaluator.py:43
        "mean_moves": float(np.mean(num_moves)),
    }
    if collect_games:
        # evaluation games double as training data, like the reference's
        # NoModelEvaluateWorker (evaluate_worker.py:151)
        out["game_batches"] = collected
    return out

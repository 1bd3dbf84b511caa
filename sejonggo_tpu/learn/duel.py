"""Duel harness: pit two engines for N games.

Reference counterpart: test/play_test.py:12-37 (two named checkpoints,
manual winrate comparison) and the real_games/ SGFs vs GNU Go.  Three
opponent kinds:

- a checkpoint name from a CheckpointStore,
- 'heuristic' — the model-free engine (search.rollout),
- 'gtp:<command>' — an external GTP engine subprocess (e.g.
  'gtp:gnugo --mode gtp'), played move-by-move through our GoEngine.

CLI: python -m sejonggo_tpu.learn.duel --a model_2 --b heuristic \
        --games 8 --preset tiny --model-dir runs/pipeline/sp_models
"""
from __future__ import annotations

import argparse
import math
import subprocess
import sys
from typing import Optional

import jax
import numpy as np

from sejonggo_tpu.config import (Config, full_19x19, small_9x9,
                                 strength_9x9)
from sejonggo_tpu.learn.evaluate import evaluate_models


def elo_diff(winrate: float) -> float:
    """Winrate -> Elo difference (clamped)."""
    w = min(max(winrate, 1e-3), 1 - 1e-3)
    return -400.0 * math.log10(1.0 / w - 1.0)


def _resolve(name: str, cfg: Config, model_dir: str):
    """Returns (predict_fn, variables) for an opponent spec."""
    if name == "heuristic":
        from sejonggo_tpu.search.rollout import make_heuristic_predict_fn

        return make_heuristic_predict_fn(cfg.go.komi), None
    if name == "dummy":
        from sejonggo_tpu.nets import dummy_actor_fn

        return dummy_actor_fn, None
    from sejonggo_tpu.learn import CheckpointStore, make_optimizer
    from sejonggo_tpu.learn.train import init_train_state
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn

    store = CheckpointStore(model_dir)
    net = AZNet.from_config(cfg.go.size, cfg.net)
    tx = make_optimizer()
    template = init_train_state(
        net, init_variables(net, jax.random.PRNGKey(0)), tx)
    if name == "best":
        name = store.best_name()
    elif name == "latest":
        name = store.latest_name()
    return make_predict_fn(net), store.load_variables(name, template)


def save_gamebatch_sgfs(gb, *, size: int, komi: float, outdir: str,
                        prefix: str, a_name: str, b_name: str) -> int:
    """Write every game of a GameBatch as an SGF with RE/PB/PW (the
    reference committed its evidence games the same way,
    real_games/*.sgf; sgfsave.py:130-167 layout)."""
    import os

    from sejonggo_tpu.io.sgf import divmod_xy, game_to_sgf

    os.makedirs(outdir, exist_ok=True)
    t_len, b = gb.actions.shape
    for g in range(b):
        moves = [(int(gb.players[t, g]),
                  *divmod_xy(int(gb.actions[t, g]), size))
                 for t in range(t_len) if gb.move_valid[t, g]]
        w = int(gb.winners[g])
        if w == 0:
            result = "0"
        else:
            margin = abs(float(gb.black_points[g]) - float(gb.white_points[g]))
            result = ("B" if w == 1 else "W") + f"+{margin:g}"
        a_black = bool(gb.model1_isblack[g])
        with open(os.path.join(outdir, f"{prefix}_{g:03d}.sgf"), "w") as f:
            f.write(game_to_sgf(
                size, komi, moves, result,
                values=[float(v) for v in gb.values[:, g]][:len(moves)],
                black_name=a_name if a_black else b_name,
                white_name=b_name if a_black else a_name))
    return b


def duel(a: str, b: str, *, cfg: Config, model_dir: str, games: int,
         seed: int = 0, max_moves: Optional[int] = None,
         sgf_dir: Optional[str] = None,
         michi_sims: Optional[int] = None) -> dict:
    if jax.default_backend() not in ("cpu",):
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)
    if b == "michi":
        # the REAL model-free engine: michi/RAVE search with heuristic
        # playouts (search/michi.py; reference mcts1/tree_search.py:64-136
        # at N_SIMS=1400), not the rollout-prior predict_fn standin
        import dataclasses as _dc

        from sejonggo_tpu.config import MichiConfig
        from sejonggo_tpu.learn.duel_michi import (play_vs_michi,
                                                   save_michi_duel_sgfs)

        predict_a, vars_a = _resolve(a, cfg, model_dir)
        michi_cfg = MichiConfig(komi=cfg.go.komi)
        if michi_sims:
            michi_cfg = _dc.replace(michi_cfg, n_sims=michi_sims)
        res = play_vs_michi(
            predict_a, vars_a, size=cfg.go.size, komi=cfg.go.komi,
            search=cfg.search, michi=michi_cfg, game_batch=games,
            rng=jax.random.PRNGKey(seed), max_moves=max_moves,
            progress_every=10)
        if sgf_dir is not None:
            save_michi_duel_sgfs(
                res, size=cfg.go.size, komi=cfg.go.komi, outdir=sgf_dir,
                prefix=f"{a}_vs_michi{michi_cfg.n_sims}", net_name=a,
                michi_name=f"michi-{michi_cfg.n_sims}")
        out = {k: res[k] for k in ("games", "winrate", "net_wins", "draws",
                                   "michi_resigns")}
        out["wins"] = res["net_wins"]
        out["mean_moves"] = float(res["num_moves"].mean())
        out["a"], out["b"] = a, f"michi@{michi_cfg.n_sims}"
        out["elo_diff_a_vs_b"] = elo_diff(res["winrate"])
        return out
    predict_a, vars_a = _resolve(a, cfg, model_dir)
    predict_b, vars_b = _resolve(b, cfg, model_dir)
    eval_cfg = cfg.eval.__class__(num_games=games, margin=0.5)
    res = evaluate_models(
        predict_a, predict_b, size=cfg.go.size, komi=cfg.go.komi,
        search=cfg.search, eval_cfg=eval_cfg, rng=jax.random.PRNGKey(seed),
        variables_latest=vars_a, variables_best=vars_b,
        game_batch=min(games, 32), max_moves=max_moves,
        collect_games=sgf_dir is not None)
    if sgf_dir is not None:
        for i, gb in enumerate(res.pop("game_batches", [])):
            save_gamebatch_sgfs(
                gb, size=cfg.go.size, komi=cfg.go.komi, outdir=sgf_dir,
                prefix=f"{a}_vs_{b}_b{i}", a_name=a, b_name=b)
    res["a"], res["b"] = a, b
    res["elo_diff_a_vs_b"] = elo_diff(res["winrate"])
    return res


class GTPSubprocessEngine:
    """Drive an external GTP engine (GNU Go etc.) over a pipe —
    the counterpart of the reference's manual GoGui/Sabaki matches
    (real_games/*.sgf)."""

    def __init__(self, command: str, size: int, komi: float):
        self.proc = subprocess.Popen(
            command.split(), stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1)
        self._cmd(f"boardsize {size}")
        self._cmd(f"komi {komi}")
        self._cmd("clear_board")

    def _cmd(self, line: str) -> str:
        assert self.proc.stdin and self.proc.stdout
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        out = []
        while True:
            resp = self.proc.stdout.readline()
            if resp.strip() == "" and out:
                break
            if resp == "":
                break
            out.append(resp.rstrip("\n"))
        text = "\n".join(out).strip()
        if text.startswith("?"):
            raise RuntimeError(f"GTP error for {line!r}: {text}")
        return text.lstrip("= ").strip()

    def play(self, color: str, vertex: str):
        self._cmd(f"play {color} {vertex}")

    def genmove(self, color: str) -> str:
        return self._cmd(f"genmove {color}")

    def close(self):
        try:
            self._cmd("quit")
        except Exception:  # noqa: BLE001
            pass
        self.proc.terminate()


def duel_vs_gtp(checkpoint: str, gtp_command: str, *, cfg: Config,
                model_dir: str, games: int, seed: int = 0,
                our_color_first: str = "B") -> dict:
    """Alternating-color match of one of our engines vs an external GTP
    engine; winner by our area scoring of the final position."""
    from sejonggo_tpu.goenv import engine as ge
    from sejonggo_tpu.goenv import gtp_to_xy, xy_to_gtp
    from sejonggo_tpu.io.gtp import GoEngine

    predict, variables = _resolve(checkpoint, cfg, model_dir)
    size, komi = cfg.go.size, cfg.go.komi
    wins = 0
    for g in range(games):
        ours_black = (g % 2 == 0) == (our_color_first == "B")
        eng = GoEngine(predict, variables, size=size, komi=komi,
                       search=cfg.search, seed=seed + g)
        ext = GTPSubprocessEngine(gtp_command, size, komi)
        passes = 0
        for move_n in range(2 * size * size):
            black_turn = move_n % 2 == 0
            if black_turn == ours_black:
                color = 1 if black_turn else -1
                x, y, _ = eng.genmove(color)
                vertex = xy_to_gtp(x, y, size)
                ext.play("B" if black_turn else "W", vertex)
            else:
                vertex = ext.genmove("B" if black_turn else "W")
                if vertex.lower() == "resign":
                    passes = 99
                    break
                x, y = gtp_to_xy(vertex, size)
                eng.play(1 if black_turn else -1, x, y)
            passes = passes + 1 if y >= size else 0
            if passes >= 2:
                break
        ext.close()
        if passes == 99:
            wins += 1  # external resigned
        else:
            w = int(ge.winner(eng.board, komi))
            if (w == 1) == ours_black and w != 0:
                wins += 1
    winrate = wins / games
    return {"wins": wins, "games": games, "winrate": winrate,
            "elo_diff": elo_diff(winrate)}


def main():
    parser = argparse.ArgumentParser(description="sejonggo-tpu duel harness")
    parser.add_argument(
        "--a", required=True,
        help="checkpoint name | best | latest | heuristic | dummy")
    parser.add_argument("--b", required=True,
                        help="same as --a, plus 'michi' (the real RAVE "
                        "engine, search/michi.py)")
    parser.add_argument("--michi-sims", type=int, default=None,
                        help="override MichiConfig.n_sims for --b michi")
    parser.add_argument("--max-moves", type=int, default=None,
                        help="move cap per game (default 2*N^2); capped "
                        "games are area-scored")
    parser.add_argument("--games", type=int, default=8)
    parser.add_argument("--preset", choices=["tiny", "strength", "full"],
                        default="tiny")
    parser.add_argument("--model-dir", default="sp_models")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--gtp", default=None,
                        help="external GTP command for --b (overrides --b)")
    parser.add_argument("--sgf-dir", default=None,
                        help="write every duel game as SGF into this dir")
    args = parser.parse_args()
    cfg = {"tiny": small_9x9, "strength": strength_9x9,
           "full": full_19x19}[args.preset]()
    if args.gtp:
        res = duel_vs_gtp(args.a, args.gtp, cfg=cfg, model_dir=args.model_dir,
                          games=args.games, seed=args.seed)
    else:
        res = duel(args.a, args.b, cfg=cfg, model_dir=args.model_dir,
                   games=args.games, seed=args.seed, sgf_dir=args.sgf_dir,
                   michi_sims=args.michi_sims, max_moves=args.max_moves)
    print(res)


if __name__ == "__main__":
    main()

"""Batched duel: the neural PUCT engine vs the real michi/RAVE engine.

VERDICT r4 Next #1: every committed "vs heuristic" duel so far pitted
the net against search/rollout.py's prior predict_fn under the same
PUCT search — a much weaker baseline than the repo's actual strongest
model-free engine, the michi-style RAVE searcher (search/michi.py,
reference mcts1/tree_search.py:64-136, 1400 playout sims).  This
module plays the real engine, batched.

Design: B lockstep games, ordered as [net-plays-black half |
net-plays-white half].  All boards share one move parity, so at every
move exactly one half is net-to-move and the other michi-to-move —
each move is ONE batched net search (tree reuse + per-game D4
symmetry, the evaluation-mode configuration of actor/selfplay.py) and
ONE batched michi search (fresh 1400-sim RAVE tree per move, exactly
how ``--engine michi`` plays over GTP, io/gtp.py MichiEngine).

Michi resigns a game when its root winrate drops below
MichiConfig.resign_thres (reference conf.py:89 RESIGN_THRES) — the
net then wins that game.  The net never resigns (strength duels run
resignation-off, config.py strength notes).  Other games end on
both-pass or the 2*N^2 move cap and are scored by area.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.config import MichiConfig, SearchConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import (advance_root_batch, decide_batch,
                                 new_tree_batch, run_search)
from sejonggo_tpu.search.michi import MichiSearcher, best_root_stats


def _tree_where(mask, a, b):
    def sel(x, y):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def _make_net_step(predict_fn: Callable, search: SearchConfig, size: int):
    """Jitted net move for one half-batch: root predict, tree build or
    reuse, PUCT search, greedy decide, env step, re-root (the
    evaluation-mode subset of actor/selfplay.py's move_step)."""
    cap = search.capacity()
    pass_action = size * size

    @jax.jit
    def net_step(boards, trees, valid, done, rng, variables):
        b = boards.shape[0]
        r_search, r_decide = jax.random.split(rng)
        pf = lambda feats: predict_fn(variables, feats)  # noqa: E731
        policies, _ = pf(boards.astype(jnp.float32))
        fresh = new_tree_batch(policies, boards, cap)  # no noise: eval mode
        active = _tree_where(valid, trees, fresh)
        active = run_search(
            active, pf, r_search,
            simulations=search.simulations, batch_size=search.batch_size,
            c_puct=search.c_puct, negamax=search.negamax,
            use_symmetry=search.use_symmetry, per_game_symmetry=True)
        actions = decide_batch(active, jnp.ones((b,), bool), r_decide)
        actions = jnp.where(done, pass_action, actions)
        new_boards = engine.step_batch(boards, actions)
        new_boards = jnp.where(done.reshape(-1, 1, 1, 1), boards, new_boards)
        trees, valid = advance_root_batch(active, actions, new_boards,
                                          reserve=search.simulations)
        return new_boards, trees, valid, actions

    return net_step


def _make_michi_step(michi: MichiConfig, search: SearchConfig, size: int,
                     chunk_sims: int = 256):
    """Michi move for one half-batch + net-tree advance by the michi
    action (the net keeps its reusable tree across opponent moves,
    reference self_play.py:224-238 semantics).  The search itself runs
    through the host-chunked MichiSearcher — a full 1400-sim search is
    minutes of device time and the axon tunnel kills single programs
    over ~1 min."""
    pass_action = size * size
    searcher = MichiSearcher(michi, chunk_sims)

    @jax.jit
    def finish(trees, boards, net_trees, net_valid, done):
        acts, wrs = jax.vmap(best_root_stats)(trees)
        resign_now = (~done) & (wrs < michi.resign_thres)
        actions = jnp.where(done | resign_now, pass_action, acts)
        new_boards = engine.step_batch(boards, actions)
        frozen = (done | resign_now).reshape(-1, 1, 1, 1)
        new_boards = jnp.where(frozen, boards, new_boards)
        net_trees, tvalid = advance_root_batch(net_trees, actions, new_boards,
                                               reserve=search.simulations)
        net_valid = jnp.where(done | resign_now, net_valid,
                              net_valid & tvalid)
        return new_boards, net_trees, net_valid, actions, resign_now

    def michi_step(boards, net_trees, net_valid, done, last_actions, rng):
        trees = searcher.search(boards, rng, last_actions=last_actions,
                                active=~done)
        return finish(trees, boards, net_trees, net_valid, done)

    return michi_step


def play_vs_michi(
    predict_fn: Callable,
    variables,
    *,
    size: int,
    komi: float,
    search: SearchConfig,
    michi: Optional[MichiConfig] = None,
    game_batch: int,
    rng,
    max_moves: Optional[int] = None,
    progress_every: int = 0,
) -> dict:
    """Play `game_batch` games (half with the net as black) against the
    michi engine; returns winrate + per-game records for SGF export.

    Returned dict: net_wins, michi_resigns, games, winrate, plus
    per-game arrays (winners, net_isblack, num_moves) and the move
    history (actions/players/move_valid, (T, B)) for save_duel_sgfs.
    """
    if game_batch % 2:
        raise ValueError("game_batch must be even (half per color)")
    if michi is None:
        michi = MichiConfig(komi=komi)
    michi = dataclasses.replace(michi, komi=komi)
    if max_moves is None:
        max_moves = 2 * size * size
    h = game_batch // 2
    net_step = _make_net_step(predict_fn, search, size)
    michi_step = _make_michi_step(michi, search, size)
    pass_action = size * size
    cap = search.capacity()

    # state per half: boards, net trees (+valid), done, skipped_last,
    # last_action (feeds michi's CFG locality prior), michi_resigned
    halves = []
    for _ in range(2):
        boards = jnp.stack([engine.init_board(size)] * h)
        dummy = jnp.zeros((h, size * size + 1), jnp.float32)
        halves.append(dict(
            boards=jnp.array(boards, copy=True),
            trees=new_tree_batch(dummy, boards, cap),
            valid=jnp.zeros((h,), bool),
            done=np.zeros((h,), bool),
            skipped=np.zeros((h,), bool),
            last=np.full((h,), -1, np.int32),
            resigned=np.zeros((h,), bool),
        ))

    actions_hist = []   # (T, B) with halves concatenated [h1 | h2]
    players_hist = []

    for move_n in range(max_moves):
        player = 1 if move_n % 2 == 0 else -1
        # net moves on half 0 (net=black) at black's turns
        net_idx = 0 if player == 1 else 1
        mi_idx = 1 - net_idx
        net_h, mi_h = halves[net_idx], halves[mi_idx]

        rng, r_net, r_mi = jax.random.split(rng, 3)
        acts_pair = [None, None]

        if not net_h["done"].all():
            nb, nt, nv, na = net_step(
                net_h["boards"], net_h["trees"], net_h["valid"],
                jnp.asarray(net_h["done"]), r_net, variables)
            net_h["boards"], net_h["trees"], net_h["valid"] = nb, nt, nv
            na = np.asarray(na)
        else:
            na = np.full((h,), pass_action, np.int32)
        acts_pair[net_idx] = na

        if not mi_h["done"].all():
            mb, mt, mv, ma, resign = michi_step(
                mi_h["boards"], mi_h["trees"], mi_h["valid"],
                jnp.asarray(mi_h["done"]), jnp.asarray(mi_h["last"]), r_mi)
            mi_h["boards"], mi_h["trees"], mi_h["valid"] = mb, mt, mv
            ma, resign = np.asarray(ma), np.asarray(resign)
            mi_h["resigned"] |= resign
            mi_h["done"] = mi_h["done"] | resign
        else:
            ma = np.full((h,), pass_action, np.int32)
        acts_pair[mi_idx] = ma

        # host-side bookkeeping (pass/done tracking, move records)
        for idx, acts in enumerate(acts_pair):
            hh = halves[idx]
            moved = ~hh["done"]
            is_pass = acts == pass_action
            ended = moved & hh["skipped"] & is_pass
            hh["skipped"] = np.where(moved, is_pass, hh["skipped"])
            hh["last"] = np.where(moved, acts.astype(np.int32), hh["last"])
            hh["done"] = hh["done"] | ended
        actions_hist.append(np.concatenate(acts_pair))
        players_hist.append(np.full((game_batch,), player, np.int32))
        if progress_every and (move_n + 1) % progress_every == 0:
            import sys as _sys

            live = int((~halves[0]["done"]).sum()
                       + (~halves[1]["done"]).sum())
            print(f"[duel] move {move_n + 1}: {live}/{game_batch} live, "
                  f"{int(np.concatenate([halves[0]['resigned'], halves[1]['resigned']]).sum())} michi resigns",
                  file=_sys.stderr, flush=True)
        if halves[0]["done"].all() and halves[1]["done"].all():
            break

    # re-derive move_valid from done progression: a recorded action is
    # valid iff the game had not ended before this move.  Reconstruct by
    # replay: game g's moves are valid until its num_moves-th move.
    actions_arr = np.stack(actions_hist)            # (T, B)
    players_arr = np.stack(players_hist)

    # recompute done-progression exactly: a game ends the move AFTER the
    # second consecutive pass, at a michi resign, or at the cap.  We
    # tracked doneness online; recover num_moves by scanning the action
    # history the same way the loop did.
    t_len = actions_arr.shape[0]
    move_valid = np.zeros((t_len, game_batch), bool)
    for g in range(game_batch):
        skipped = False
        for t in range(t_len):
            a = actions_arr[t, g]
            move_valid[t, g] = True
            if a == pass_action and skipped and t > 0:
                break
            skipped = a == pass_action
    # michi resigns: strip trailing all-pass padding after the resign
    resigned = np.concatenate([halves[0]["resigned"], halves[1]["resigned"]])
    for g in np.flatnonzero(resigned):
        # find last non-pass move; everything after it is padding
        nz = np.flatnonzero((actions_arr[:, g] != pass_action)
                            & move_valid[:, g])
        cut = (nz[-1] + 1) if nz.size else 0
        move_valid[cut:, g] = False

    final_boards = jnp.concatenate([halves[0]["boards"], halves[1]["boards"]])
    winners, bp, wp = jax.vmap(partial(engine.score, komi=komi))(final_boards)
    winners = np.asarray(winners, np.int32)
    net_isblack = np.concatenate([np.ones((h,), bool), np.zeros((h,), bool)])
    # michi resign hands the game to the net regardless of area score
    net_color = np.where(net_isblack, 1, -1)
    effective_winners = np.where(resigned, net_color, winners)
    net_won = (effective_winners == net_color) & (effective_winners != 0)

    return dict(
        games=game_batch,
        net_wins=int(net_won.sum()),
        draws=int((effective_winners == 0).sum()),
        michi_resigns=int(resigned.sum()),
        winrate=float(net_won.mean()),
        winners=effective_winners,
        area_winners=winners,
        black_points=np.asarray(bp),
        white_points=np.asarray(wp),
        net_isblack=net_isblack,
        actions=actions_arr,
        players=players_arr,
        move_valid=move_valid,
        num_moves=move_valid.sum(0).astype(np.int32),
    )


def save_michi_duel_sgfs(res: dict, *, size: int, komi: float, outdir: str,
                         prefix: str, net_name: str,
                         michi_name: str = "michi") -> int:
    """Write every duel game as SGF with RE/PB/PW (same evidence format
    as learn/duel.py save_gamebatch_sgfs; reference real_games/*.sgf)."""
    import os

    from sejonggo_tpu.io.sgf import divmod_xy, game_to_sgf

    os.makedirs(outdir, exist_ok=True)
    t_len, b = res["actions"].shape
    for g in range(b):
        moves = [(int(res["players"][t, g]),
                  *divmod_xy(int(res["actions"][t, g]), size))
                 for t in range(t_len) if res["move_valid"][t, g]]
        w = int(res["winners"][g])
        if w == 0:
            result = "0"
        else:
            net_color = 1 if res["net_isblack"][g] else -1
            resigned = bool(res["michi_resigns"]) and \
                w == net_color and int(res["area_winners"][g]) != w
            if resigned:
                result = ("B" if w == 1 else "W") + "+R"
            else:
                margin = abs(float(res["black_points"][g])
                             - float(res["white_points"][g]))
                result = ("B" if w == 1 else "W") + f"+{margin:g}"
        black = net_name if res["net_isblack"][g] else michi_name
        white = michi_name if res["net_isblack"][g] else net_name
        with open(os.path.join(outdir, f"{prefix}_{g:03d}.sgf"), "w") as f:
            f.write(game_to_sgf(size, komi, moves, result,
                                black_name=black, white_name=white))
    return b

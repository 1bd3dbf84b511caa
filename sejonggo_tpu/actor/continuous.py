"""Continuous self-play: finished games respawn in place.

play_games (selfplay.py) steps a fixed batch until ALL games finish,
so late-game slots idle while stragglers drain — the lockstep cost of
variable-length games (SURVEY.md §7 hard parts).  Here every slot is
always live: when a game ends (resign / both-passed / move cap) its
slot is scored and respawned as a fresh game inside the same jitted
step, so the device never computes on dead games.  The host harvests
per-slot move records and flushes each finished game to the replay
sink with its value targets.

This is the TPU-native replacement for the reference's
N_GAME_PROCESS=32 independent game processes (selfplay_worker.py):
throughput scales with the slot count instead of the process count.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import (
    advance_root_batch,
    decide_batch,
    new_tree_batch,
    policy_target_batch,
    run_search,
)

from sejonggo_tpu.actor.selfplay import _tree_where


@functools.lru_cache(maxsize=16)
def _make_continuous_step(predict: Callable, search: SearchConfig, size: int,
                          selfplay: bool, stop_exploration: int,
                          max_moves: int, komi: float):
    cap = search.capacity()
    num_points = size * size

    from sejonggo_tpu.utils.platform import donate_argnums

    @partial(jax.jit, **donate_argnums(0))
    def cstep(state, rng, resign_thresholds, variables):
        boards, trees, tree_valid, skipped_last, move_n = state
        b = boards.shape[0]
        player = boards[:, 0, 0, 16].astype(jnp.int32)
        greedy = move_n >= stop_exploration

        rng, r_noise, r_search, r_decide = jax.random.split(rng, 4)
        predict_fn = lambda x: predict(variables, x)  # noqa: E731

        feats = boards.astype(jnp.float32)
        policies, values = predict_fn(feats)
        values = values.reshape(b)

        resign_now = (~jnp.isnan(resign_thresholds)) & (
            values <= resign_thresholds)
        move_valid = ~resign_now

        fresh = new_tree_batch(
            policies, boards, cap,
            rng=r_noise if selfplay else None,
            dirichlet_alpha=search.dirichlet_alpha,
            epsilon=search.dirichlet_epsilon)
        tree_fresh = move_valid & ~tree_valid
        trees = _tree_where(tree_valid, trees, fresh)
        pre_search = trees

        trees = run_search(
            trees, predict_fn, r_search,
            simulations=search.simulations, batch_size=search.batch_size,
            c_puct=search.c_puct, negamax=search.negamax,
            use_symmetry=search.use_symmetry)
        actions = decide_batch(trees, greedy, r_decide)
        ptargets = policy_target_batch(trees, search.policy_target)

        pass_action = jnp.asarray(num_points, jnp.int32)
        actions = jnp.where(move_valid, actions, pass_action)
        is_pass = actions == pass_action

        new_boards = engine.step_batch(boards, actions)
        new_boards = jnp.where(move_valid.reshape(-1, 1, 1, 1),
                               new_boards, boards)

        adv, av = advance_root_batch(trees, actions, new_boards,
                                     reserve=search.simulations)
        trees = _tree_where(move_valid, adv, pre_search)
        tree_valid = jnp.where(move_valid, av, tree_valid)

        ended_bothpass = move_valid & skipped_last & is_pass
        ended_cap = move_valid & (move_n + 1 >= max_moves)
        ended = resign_now | ended_bothpass | ended_cap

        # score ended games (area winner on the post-move board, the
        # reference parity rule; resign winner = opponent of resigner)
        sw, bp, wp = jax.vmap(partial(engine.score, komi=komi))(new_boards)
        area_winner = sw.astype(jnp.int32)
        resign_winner = jnp.where(resign_now, -player, area_winner)

        # respawn
        fresh_board = jnp.broadcast_to(
            engine.init_board(size), boards.shape).astype(boards.dtype)
        boards_out = jnp.where(ended.reshape(-1, 1, 1, 1), fresh_board,
                               new_boards)
        tree_valid = jnp.where(ended, False, tree_valid)
        move_n_out = jnp.where(ended, 0, move_n + 1)
        skipped_out = jnp.where(ended | ~move_valid, False, is_pass)

        # compact harvest record: the signed stone grid (black-positive)
        # of the pre-move board instead of its 17 redundant history
        # planes — 17x less device->host traffic; the host rebuilds the
        # planes from the per-step grid history at game end
        stones = ((boards[..., 0] - boards[..., 1])
                  * player[:, None, None].astype(boards.dtype)).astype(
                      jnp.int8)
        record = dict(
            stones=stones, policy_targets=ptargets, values=values,
            actions=actions, players=player, move_valid=move_valid,
            tree_fresh=tree_fresh, ended=ended,
            area_winner=area_winner, resign_winner=resign_winner,
            resigned=resign_now,
            black_points=bp, white_points=wp,
        )
        return (boards_out, trees, tree_valid, skipped_out, move_n_out), record

    return cstep


class ContinuousSelfPlay:
    """Streaming self-play generator over B always-live slots."""

    def __init__(self, predict: Callable, variables, *, size: int,
                 komi: float, search: SearchConfig, game_batch: int,
                 stop_exploration: int = 30, selfplay: bool = True,
                 max_moves: Optional[int] = None, rng=None,
                 threshold_fn: Optional[Callable[[], float]] = None,
                 mesh=None, mesh_axis: str = "dp"):
        self.predict = predict
        self.variables = variables
        self.size = size
        self.komi = komi
        self.search = search
        self.b = game_batch
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.max_moves = max_moves or 2 * size * size
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from sejonggo_tpu.parallel import replicate

            if game_batch % mesh.size:
                raise ValueError(
                    f"game_batch={game_batch} not divisible by mesh size "
                    f"{mesh.size}")
            self._data_sharding = NamedSharding(mesh, P(mesh_axis))
            self.variables = replicate(variables, mesh) \
                if variables is not None else None
        self._step = _make_continuous_step(
            predict, search, size, selfplay, stop_exploration,
            self.max_moves, komi)

        boards = jnp.stack([engine.init_board(size)] * self.b)
        trees = new_tree_batch(
            jnp.zeros((self.b, size * size + 1), jnp.float32), boards,
            search.capacity())
        # copy: trees.root_board aliases boards (donated pytree must
        # not contain one buffer twice)
        self.state = (jnp.array(boards, copy=True), trees,
                      jnp.zeros((self.b,), bool),
                      jnp.zeros((self.b,), bool),
                      jnp.zeros((self.b,), jnp.int32))
        if mesh is not None:
            from sejonggo_tpu.parallel import shard_actor_state

            # shard every state leaf over its leading (game) axis; jit
            # propagates the shardings through search/env/inference so
            # the whole move step runs batch-parallel across devices
            self.state = shard_actor_state(self.state, mesh, mesh_axis)
        # Host-side harvest: a ring buffer over STEPS (a live game spans
        # at most max_moves steps), written once per device step with
        # whole-batch array copies.  Per-slot Python work happens only
        # when a game ends (strided column slices), so the host loop is
        # O(#ended) per step instead of O(B) — at B=2048 the old
        # per-slot dict appends dominated the device time.
        w = self.max_moves + 1
        a = size * size + 1
        self._ring = {
            "stones": np.zeros((w, self.b, size, size), np.int8),
            "policy_targets": np.zeros((w, self.b, a), np.float32),
            "values": np.zeros((w, self.b), np.float32),
            "actions": np.zeros((w, self.b), np.int32),
            "players": np.zeros((w, self.b), np.int32),
            "move_valid": np.zeros((w, self.b), bool),
        }
        self._ring_w = w
        self._start = np.zeros((self.b,), np.int64)  # first step of the
        #                                              slot's current game
        self._gstep = 0    # steps harvested (device steps may run ahead)
        # per-game resign thresholds, fixed for a game's lifetime
        # (reference assigns resign per game, self_play.py:310-313)
        self._threshold_fn = threshold_fn or (lambda: float("nan"))
        self._thresholds = np.asarray(
            [self._threshold_fn() for _ in range(self.b)], np.float32)
        self.steps = 0
        self.games_finished = 0
        self.empty_games = 0  # zero-move instant resigns (dropped)
        self.moves_recorded = 0
        self.fresh_trees = 0  # tree_fresh occurrences (reuse-rate metric)

    @property
    def tree_fresh_rate(self) -> float:
        """Fraction of recorded moves that rebuilt the tree from scratch
        (1.0 - reuse rate; the reference reuses trees across moves,
        self_play.py:224-238)."""
        return self.fresh_trees / max(self.moves_recorded, 1)

    def _harvest_game(self, g: int, rec) -> Dict:
        """Extract slot g's finished game from the step ring buffer as
        stacked arrays (T = recorded moves).  The 17-plane training
        boards are rebuilt here from the per-step signed stone grids:
        plane pair q of move t is (stones_{t-q} == side_t,
        stones_{t-q} == -side_t), zeros before the game start — exactly
        the reference encoding (play.py:226-242,295-299), verified by
        the replay test in tests/test_continuous.py."""
        t = self._gstep
        idxs = np.arange(self._start[g], t + 1) % self._ring_w
        sel = idxs[self._ring["move_valid"][idxs, g]]
        stones = self._ring["stones"][sel, g]          # (T, N, N)
        players = self._ring["players"][sel, g]        # (T,)
        n = self.size
        tt = stones.shape[0]
        boards = np.zeros((tt, n, n, 17), np.int8)
        s = players[:, None, None].astype(np.int8)
        for q in range(8):
            shifted = np.concatenate(
                [np.zeros((min(q, tt), n, n), np.int8),
                 stones[: max(tt - q, 0)]])
            boards[..., 2 * q] = shifted == s
            boards[..., 2 * q + 1] = shifted == -s
        boards[..., 16] = s
        return {
            "boards": boards,
            "policies": self._ring["policy_targets"][sel, g],
            "values": self._ring["values"][sel, g],
            "actions": self._ring["actions"][sel, g],
            "players": players,
            "winner": int(rec["area_winner"][g]),
            "resign_winner": int(rec["resign_winner"][g]),
            "resigned": bool(rec["resigned"][g]),
            "black_points": float(rec["black_points"][g]),
            "white_points": float(rec["white_points"][g]),
            "holdout": bool(np.isnan(self._thresholds[g])),
        }

    def run(self, num_games: int, thresholds_fn=None, on_game=None,
            keep_empty: bool = False, max_steps: Optional[int] = None):
        """Play until `num_games` finish; returns finished-game dicts.

        Each game dict carries stacked per-move arrays (boards,
        policies, values, actions, players) plus scalar outcome fields.
        thresholds_fn(b) -> (B,) per-step override of the per-game
        thresholds (NaN = off); on_game(game) called per completion.
        max_steps bounds the DEVICE steps taken this call regardless of
        completions (fixed-window benchmarking at operating points where
        whole games are minutes long, e.g. 19x19/1600-sims)."""
        finished = []
        pending = None  # previous step's device-side record (1-step lag:
        # the next step is dispatched BEFORE the previous record is
        # fetched, so the device never waits on the host/transfer).
        # Consequence: a respawned game's first step still runs with its
        # slot's previous resign threshold — one benign early step,
        # thresholds are per-game from step two on.

        def process(record):
            rec = jax.device_get(record)  # one pytree fetch
            w = self._gstep % self._ring_w
            for k, buf in self._ring.items():
                buf[w] = rec[k]
            self.moves_recorded += int(rec["move_valid"].sum())
            self.fresh_trees += int(rec["tree_fresh"].sum())
            for g in np.nonzero(rec["ended"])[0]:
                game = self._harvest_game(int(g), rec)
                self._start[g] = self._gstep + 1
                self._thresholds[g] = self._threshold_fn()
                if game["boards"].shape[0] == 0 and not keep_empty:
                    # zero-move (instant-resign) games carry no data;
                    # the reference deletes them outright
                    # (selfplay_worker.py:115-118, utils.py:147-160)
                    self.empty_games += 1
                    continue
                self.games_finished += 1
                finished.append(game)
                if on_game is not None:
                    on_game(game)
            self._gstep += 1

        first_step = self.steps
        while len(finished) < num_games and (
                max_steps is None or self.steps - first_step < max_steps):
            if thresholds_fn is not None:
                thr = jnp.asarray(thresholds_fn(self.b), jnp.float32)
            else:
                thr = jnp.asarray(self._thresholds)
            if self._data_sharding is not None:
                thr = jax.device_put(thr, self._data_sharding)
            self.rng, sub = jax.random.split(self.rng)
            self.state, record = self._step(self.state, sub, thr,
                                            self.variables)
            self.steps += 1
            if pending is not None:
                process(pending)
            pending = record
        if pending is not None:
            process(pending)
        return finished

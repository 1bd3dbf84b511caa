"""Batched self-play / evaluation games.

TPU-native replacement for reference play_game (self_play.py:164-290):
instead of one python game per process (N_GAME_PROCESS=32 workers,
selfplay_worker.py) with per-move host/GPU round trips, B games step in
lockstep on device.  Each move is one jitted call: predict at the root,
(re)build or reuse trees, run the batched search, pick moves, step the
env, re-root the trees.  Finished games are frozen by masking until the
whole batch ends (the reference's variable-length games, handled here
with done masks).

Semantics replicated from the reference per move:
- predict at the current board (no symmetry) for the resign check and
  the recorded value (self_play.py:187-193);
- fresh trees (with root Dirichlet noise in self-play) only when the
  previous tree was never expanded at the chosen child
  (self_play.py:195-198);
- temperature 1 until STOP_EXPLORATION, then 0 (self_play.py:185-186);
- policy target = the root children's priors (self_play.py:203-205),
  or normalized visits in 'visits' mode;
- both-players-share-one-tree in self-play; separate trees per model in
  evaluation, both advanced on each move (self_play.py:224-238);
- game ends on resign (value <= threshold), both-passed, or the
  2*N^2 move cap (self_play.py:181,190-193,217-219);
- the recorded game winner comes from AREA SCORE of the final position
  even for resigned games, exactly as the reference does
  (self_play.py:250-261 scores the board regardless of end reason);
  the resign-aware winner is reported separately for metrics/gating.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

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
    tree_capacity,
)
from sejonggo_tpu.search.tree import Tree


@dataclasses.dataclass
class GameBatch:
    """Stacked per-move records for B lockstep games (T = moves played)."""

    boards: np.ndarray         # (T, B, N, N, 17) int8 — board before the move
    policy_targets: np.ndarray  # (T, B, A) f32
    values: np.ndarray         # (T, B) f32 — predicted value at the move
    actions: np.ndarray        # (T, B) i32
    players: np.ndarray        # (T, B) i32 — side that moved
    move_valid: np.ndarray     # (T, B) bool
    tree_fresh: np.ndarray     # (T, B) bool — a fresh tree was built this move
    winners: np.ndarray        # (B,) i32 — area-score winner (+1/0/-1), reference quirk
    resign_winners: np.ndarray  # (B,) i32 — winner with resigns honored
    black_points: np.ndarray   # (B,)
    white_points: np.ndarray   # (B,)
    end_reasons: np.ndarray    # (B,) int: 0=moves-cap, 1=both-passed, 2=resign
    num_moves: np.ndarray      # (B,) i32
    model1_isblack: np.ndarray  # (B,) bool

    def value_targets(self) -> np.ndarray:
        """(T, B) ±1 value targets from the area-score winner, matching
        the reference's save path (sgfsave.py:60-66: value=1 if the
        mover won else -1; draws get 0)."""
        w = self.winners[None, :]
        p = self.players
        return np.where(w == 0, 0.0, np.where(p == w, 1.0, -1.0)).astype(np.float32)


def _tree_where(mask, a: Tree, b: Tree) -> Tree:
    def sel(x, y):
        m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


import functools


@functools.lru_cache(maxsize=32)
def _make_move_step(predict1: Callable, predict2: Optional[Callable],
                    search: SearchConfig, size: int, selfplay: bool):
    """Build the jitted per-move function for a batch of games.

    predict fns have signature (variables, boards_f32) -> (probs, values)
    so network weights are traced arguments (no recompilation when the
    checkpoint changes between generations).  Cached so repeated
    play_games calls with the same configuration reuse the compiled step.
    """
    cap = search.capacity()

    def select_predict(model1_now, variables1, variables2):
        """predict_fn over flat leaf batches, routing per-game rows to
        the current model (evaluation mode runs both nets and selects;
        self-play uses one net)."""
        if predict2 is None:
            return lambda boards: predict1(variables1, boards)

        def both(flat_boards):
            p1, v1 = predict1(variables1, flat_boards)
            p2, v2 = predict2(variables2, flat_boards)
            reps = flat_boards.shape[0] // model1_now.shape[0]
            m = jnp.repeat(model1_now, reps)
            return (
                jnp.where(m[:, None], p1, p2),
                jnp.where(m[:, None], v1, v2),
            )

        return both

    from sejonggo_tpu.utils.platform import donate_argnums

    @partial(jax.jit, **donate_argnums(0))
    def move_step(state, rng, greedy, resign_thresholds, variables1,
                  variables2):
        """One move for all B games.

        Self-play: one shared tree per game (reference other_mcts is the
        same object, self_play.py:196-198).  Evaluation: two trees per
        game, one per model; the current model's tree is searched, BOTH
        are advanced by the chosen action (self_play.py:224-238).
        """
        (boards, trees1, valid1, trees2, valid2, done, skipped_last,
         model1_isblack) = state
        b = boards.shape[0]
        player = boards[:, 0, 0, 16].astype(jnp.int32)
        # whose turn: model1 plays black's moves iff model1_isblack
        model1_now = (player == 1) == model1_isblack

        rng, r_noise, r_search, r_decide = jax.random.split(rng, 4)
        predict_fn = select_predict(model1_now, variables1, variables2)

        feats = boards.astype(jnp.float32)
        policies, values = predict_fn(feats)
        values = values.reshape(b)

        resign_now = (~done) & (~jnp.isnan(resign_thresholds)) & (
            values <= resign_thresholds)
        move_valid = (~done) & (~resign_now)

        dual = predict2 is not None
        if dual:
            active = _tree_where(model1_now, trees1, trees2)
            active_valid = jnp.where(model1_now, valid1, valid2)
            other = _tree_where(model1_now, trees2, trees1)
            other_valid = jnp.where(model1_now, valid2, valid1)
        else:
            active, active_valid = trees1, valid1

        fresh = new_tree_batch(
            policies, boards, cap,
            rng=r_noise if selfplay else None,
            dirichlet_alpha=search.dirichlet_alpha,
            epsilon=search.dirichlet_epsilon,
        )
        tree_fresh = move_valid & ~active_valid
        active = _tree_where(active_valid, active, fresh)

        # keep the pre-search tree for frozen (done/resigning) games:
        # the lockstep search still runs on them, and without this their
        # never-re-rooted trees would grow by `simulations` nodes every
        # iteration until the fixed arrays overflow
        active_before = active

        active = run_search(
            active, predict_fn, r_search,
            simulations=search.simulations, batch_size=search.batch_size,
            c_puct=search.c_puct, negamax=search.negamax,
            use_symmetry=search.use_symmetry,
            # evaluation games have no Dirichlet noise and greedy
            # decisions — per-game symmetry draws are their ONLY
            # decorrelation (reference games decorrelate through each
            # process's own random_symmetry_predict RNG); self-play
            # keeps the cheaper shared-draw path (noise decorrelates it)
            per_game_symmetry=not selfplay,
        )
        actions = decide_batch(active, greedy, r_decide)
        ptargets = policy_target_batch(active, search.policy_target)

        pass_action = jnp.asarray(size * size, jnp.int32)
        actions = jnp.where(move_valid, actions, pass_action)
        is_pass = actions == pass_action
        ended_bothpass = move_valid & skipped_last & is_pass

        new_boards = engine.step_batch(boards, actions)
        new_boards = jnp.where(
            move_valid.reshape(-1, 1, 1, 1), new_boards, boards)

        reserve = search.simulations
        adv_active, av = advance_root_batch(active, actions, new_boards,
                                            reserve=reserve)
        active = _tree_where(move_valid, adv_active, active_before)
        active_valid = jnp.where(move_valid, av, active_valid)

        if dual:
            adv_other, ov = advance_root_batch(other, actions, new_boards,
                                               reserve=reserve)
            other = _tree_where(move_valid & other_valid, adv_other, other)
            other_valid = jnp.where(move_valid, other_valid & ov, other_valid)
            trees1 = _tree_where(model1_now, active, other)
            valid1 = jnp.where(model1_now, active_valid, other_valid)
            trees2 = _tree_where(model1_now, other, active)
            valid2 = jnp.where(model1_now, other_valid, active_valid)
        else:
            trees1, valid1 = active, active_valid

        new_done = done | resign_now | ended_bothpass
        new_skipped = jnp.where(move_valid, is_pass, skipped_last)

        # compact record: signed stone grid instead of the 17-plane
        # board (17x less device->host traffic; the host rebuilds the
        # planes from the grid history — see play_games)
        stones = ((boards[..., 0] - boards[..., 1])
                  * player[:, None, None].astype(boards.dtype)).astype(
                      jnp.int8)
        record = dict(
            stones=stones, policy_targets=ptargets, values=values,
            actions=actions, players=player, move_valid=move_valid,
            tree_fresh=tree_fresh,
        )
        new_state = (new_boards, trees1, valid1, trees2, valid2, new_done,
                     new_skipped, model1_isblack)
        flags = dict(resign_now=resign_now, ended_bothpass=ended_bothpass)
        return new_state, record, flags

    return move_step


def play_games(
    predict1: Callable,
    predict2: Optional[Callable] = None,
    *,
    size: int,
    komi: float,
    search: SearchConfig,
    game_batch: int,
    rng,
    variables1=None,
    variables2=None,
    selfplay: bool = True,
    stop_exploration: int = 30,
    resign_thresholds=None,      # (B,) float, NaN = resignation off
    model1_isblack=None,         # (B,) bool; default: model1 is black
    max_moves: Optional[int] = None,
    mesh=None,                   # shard the game batch over this mesh
    mesh_axis: str = "dp",
) -> GameBatch:
    """Play B games to completion; returns stacked per-move records.

    predict fns: (variables, boards_f32 (M, N, N, 17)) ->
    (policy_probs (M, A), values (M, 1)); must be jax-traceable (they
    are called inside jit).  `variables*` are the network weights pytrees
    passed through as traced arguments (None for stateless stubs).
    """
    b = game_batch
    if max_moves is None:
        max_moves = 2 * size * size
    if resign_thresholds is None:
        resign_thresholds = jnp.full((b,), jnp.nan, jnp.float32)
    else:
        resign_thresholds = jnp.asarray(resign_thresholds, jnp.float32)
    if model1_isblack is None:
        model1_isblack = jnp.ones((b,), bool)
    else:
        model1_isblack = jnp.asarray(model1_isblack, bool)
    # snapshot, then place a FRESH device copy in the state: the state
    # tuple is donated into move_step, which would delete the caller's
    # array out from under them
    model1_isblack_np = np.asarray(model1_isblack)
    model1_isblack = jnp.asarray(np.array(model1_isblack_np))

    move_step = _make_move_step(predict1, predict2, search, size, selfplay)

    boards = jnp.stack([engine.init_board(size)] * b)
    cap = search.capacity()
    dummy_policy = jnp.zeros((b, size * size + 1), jnp.float32)
    trees1 = new_tree_batch(dummy_policy, boards, cap)
    dual = predict2 is not None
    # separate board copy: both trees' root_board would otherwise be
    # passthrough aliases of one buffer inside the donated state
    trees2 = new_tree_batch(
        dummy_policy, jnp.array(boards, copy=True), cap) if dual else None
    state = (
        # fresh copy: trees1.root_board aliases `boards` (same-dtype
        # astype is no-copy) and a donated pytree must not contain the
        # same buffer twice
        jnp.array(boards, copy=True),
        trees1, jnp.zeros((b,), bool),   # valid1: force fresh trees at move 0
        trees2, jnp.zeros((b,), bool) if dual else None,
        jnp.zeros((b,), bool),           # done
        jnp.zeros((b,), bool),           # skipped_last
        model1_isblack,
    )
    if mesh is not None:
        from sejonggo_tpu.parallel import replicate, shard_actor_state

        if b % mesh.size:
            raise ValueError(
                f"game_batch={b} not divisible by mesh size {mesh.size}")
        state = shard_actor_state(state, mesh, mesh_axis)
        resign_thresholds = jax.device_put(
            resign_thresholds,
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec(mesh_axis)))
        if variables1 is not None:
            variables1 = replicate(variables1, mesh)
        if variables2 is not None:
            variables2 = replicate(variables2, mesh)

    records = []
    flags_resign = np.zeros((b,), bool)
    flags_bothpass = np.zeros((b,), bool)
    resign_player = np.zeros((b,), np.int32)

    data_sharding = None
    if mesh is not None:
        data_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_axis))

    # 1-step lag: dispatch move t+1 before fetching move t's record, so
    # the device never waits on the host/transfer (one jax.device_get
    # per move).  The done-check runs on the lagged flags — at most one
    # extra all-masked step whose moves are move_valid=False.
    host_done = np.zeros((b,), bool)
    pending = None

    def process(p):
        nonlocal resign_player
        rec, fl = jax.device_get(p)
        records.append(rec)
        rn = fl["resign_now"]
        # the resigner is the side to move when the resign fires
        resign_player = np.where(rn & ~flags_resign, rec["players"],
                                 resign_player)
        flags_resign[:] |= rn
        flags_bothpass[:] |= fl["ended_bothpass"]
        host_done[:] |= rn | fl["ended_bothpass"]

    for move_n in range(max_moves):
        greedy = jnp.full((b,), move_n >= stop_exploration)
        if data_sharding is not None:
            greedy = jax.device_put(greedy, data_sharding)
        rng, sub = jax.random.split(rng)
        state, record, flags = move_step(
            state, sub, greedy, resign_thresholds, variables1, variables2)
        if pending is not None:
            process(pending)
        pending = (record, flags)
        if host_done.all():
            break
    if pending is not None:
        process(pending)

    final_boards = state[0]
    winners, black_pts, white_pts = jax.vmap(partial(engine.score, komi=komi))(
        final_boards)
    winners = np.asarray(winners, np.int32)

    move_valid = np.stack([r["move_valid"] for r in records])
    num_moves = move_valid.sum(0).astype(np.int32)
    end_reasons = np.where(flags_resign, 2, np.where(flags_bothpass, 1, 0))
    # resign-aware winner: opponent of the resigner
    resign_winners = np.where(flags_resign, -resign_player, winners)

    # Rebuild the 17-plane training boards from the per-move signed
    # stone grids: plane pair q of move t is (stones_{t-q} == side_t) /
    # (== -side_t), zeros before the game start — the exact reference
    # encoding (play.py:226-242,295-299), pinned by the full-game
    # differential tests.
    stones = np.stack([r["stones"] for r in records])     # (T, B, N, N)
    players = np.stack([r["players"] for r in records])   # (T, B)
    t_len, n = stones.shape[0], stones.shape[-1]
    boards = np.zeros((t_len, b, n, n, 17), np.int8)
    s = players[:, :, None, None].astype(np.int8)
    for q in range(8):
        shifted = np.concatenate(
            [np.zeros((min(q, t_len), b, n, n), np.int8),
             stones[: max(t_len - q, 0)]])
        boards[..., 2 * q] = shifted == s
        boards[..., 2 * q + 1] = shifted == -s
    boards[..., 16] = s

    return GameBatch(
        boards=boards,
        policy_targets=np.stack([r["policy_targets"] for r in records]),
        values=np.stack([r["values"] for r in records]),
        actions=np.stack([r["actions"] for r in records]),
        players=np.stack([r["players"] for r in records]),
        move_valid=move_valid,
        tree_fresh=np.stack([r["tree_fresh"] for r in records]),
        winners=winners,
        resign_winners=resign_winners.astype(np.int32),
        black_points=np.asarray(black_pts),
        white_points=np.asarray(white_pts),
        end_reasons=end_reasons.astype(np.int32),
        num_moves=num_moves,
        model1_isblack=model1_isblack_np,
    )

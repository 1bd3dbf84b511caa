"""Model-free search: vectorized heuristic priors + batched rollouts.

Reference counterpart: the self-contained michi-style engine in mcts1/
(tree_search.py playout pool :81-107, gen_playout_moves :141-174,
go_heuristics.py capture/atari fix_atari :116-213, 3x3 patterns, prior
initialization tree_node.py:22-89) and the nomodel self-play path
(nomodel_self_play.py).  The reference runs scalar heuristics over
string boards in a process pool; here the heuristics are reduced to
vectorizable board features (SURVEY.md §7 hard-parts guidance) and the
playouts are a jitted lockstep loop over the whole batch — the
TPU-native form of playout-level parallelism (P7).

The exported ``heuristic_predict_fn`` has the same signature as a
network predict_fn, so the ENTIRE nomodel configuration reuses the
batched MCTS, actor and pipeline unchanged: plug it into play_games
and you have the reference's "9x9 model-free MCTS self-play" config.

Heuristic prior features (weights loosely follow conf.py:84-105):
- capture: the last liberty of an opponent group in atari
  (PRIOR_CAPTURE_ONE/MANY, go_heuristics fix_atari capture suggestion);
- escape: the last liberty of an OWN group in atari (atari-fix);
- local response: neighborhood of the opponent's last move (michi's
  local move preference);
- line height: third/fourth-line bonus on empty areas (PRIOR_CFG /
  line-height prior analog);
- self-atari avoidance: moves whose only breath is a lone adjacent
  empty point are damped (PRIOR_SELFATARI).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.goenv.engine import (
    _dilate,
    _group_minmax_lib,
    _shift_fill,
)

# prior weights (relative urgencies, cf. reference conf.py:97-104)
W_CAPTURE = 30.0
W_ESCAPE = 15.0
W_LOCAL = 6.0
W_LINE3 = 3.0
W_BASE = 1.0
W_SELF_ATARI = 0.1
W_PASS = 1e-3


def _atari_liberty_mask(stones, empty, n):
    """Flat (N*N,) float: 1 where a point is the single liberty of a
    `stones` group in atari."""
    mn, mx = _group_minmax_lib(stones, empty)
    in_atari = stones & (mn == mx) & (mn < n * n)
    flat = jnp.zeros((n * n,), jnp.float32)
    idx = jnp.where(in_atari, mn, n * n)  # out-of-range drops the scatter
    return (flat.at[idx.reshape(-1)].add(1.0, mode="drop") > 0).astype(jnp.float32)


def heuristic_priors(board):
    """(A,) unnormalized move urgencies for one board."""
    n = board.shape[-3]
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    empty = ~(own | opp)

    capture = _atari_liberty_mask(opp, empty, n)
    escape = _atari_liberty_mask(own, empty, n)

    # opponent's last move: an opp stone now that wasn't there a move ago
    # (planes 1 vs 3 after the history shift)
    last = (board[:, :, 1].astype(jnp.int32) - board[:, :, 3].astype(jnp.int32)) == 1
    local = _dilate(_dilate(last)) | _dilate(last)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    edge_d = jnp.minimum(jnp.minimum(row, n - 1 - row),
                         jnp.minimum(col, n - 1 - col))
    line3 = (edge_d == 2) | (edge_d == 3)

    # breath count: adjacent empties (self-atari-ish when <= 1 and no
    # capture/escape urgency)
    adj_empty = (
        _shift_fill(empty, 1, 0, False).astype(jnp.int32)
        + _shift_fill(empty, -1, 0, False).astype(jnp.int32)
        + _shift_fill(empty, 0, 1, False).astype(jnp.int32)
        + _shift_fill(empty, 0, -1, False).astype(jnp.int32)
    )

    w = (
        W_BASE
        + W_CAPTURE * capture.reshape(n, n)
        + W_ESCAPE * escape.reshape(n, n)
        + W_LOCAL * local.astype(jnp.float32)
        + W_LINE3 * line3.astype(jnp.float32)
    )
    risky = (adj_empty <= 1) & (capture.reshape(n, n) == 0)
    w = jnp.where(risky, w * W_SELF_ATARI, w)
    w = jnp.where(empty, w, 0.0)
    return jnp.concatenate([w.reshape(-1), jnp.asarray([W_PASS])])


def _own_true_eye(board):
    """(N, N) bool: single-point eyes of the side to move (all orthogonal
    neighbors own stones, off-board counts as own) — the playout
    no-eye-filling rule (michi's is_eyeish, go_heuristics.py)."""
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    empty = ~(own | opp)
    surrounded = (
        _shift_fill(own, 1, 0, True)
        & _shift_fill(own, -1, 0, True)
        & _shift_fill(own, 0, 1, True)
        & _shift_fill(own, 0, -1, True)
    )
    return empty & surrounded


def _rollout_step(board, rng):
    """One random playout move: uniform over legal non-eye-filling
    points; pass when none remain."""
    n = board.shape[-3]
    legal = ~engine.illegal_moves_mask(board)
    eye = _own_true_eye(board).reshape(-1)
    playable = legal.at[n * n].set(False) & jnp.concatenate(
        [~eye, jnp.zeros((1,), bool)])
    any_play = jnp.any(playable)
    logits = jnp.where(playable, 0.0, -jnp.inf)
    action = jnp.where(
        any_play,
        jax.random.categorical(rng, logits),
        jnp.asarray(n * n),
    ).astype(jnp.int32)
    return engine.step(board, action), action


def rollout_values(boards, rng, komi: float, num_steps: int = 0):
    """Batched random playouts to the end, then area score.

    Returns (B, 1) values in {-1, 0, +1}-ish from the perspective of
    each board's side to move (the role of mcplayout
    mcts1/tree_search.py:177-220, vectorized).  num_steps 0 = 2*N*N.
    """
    n = boards.shape[-3]
    if num_steps <= 0:
        num_steps = 2 * n * n
    b = boards.shape[0]
    to_move = boards[:, 0, 0, 16].astype(jnp.int32)

    # fixed-length playout: eye-safe random moves converge to a stable
    # position; once nothing is playable every further step is a pass
    def body(carry, rng_step):
        bds = carry
        rngs = jax.random.split(rng_step, b)
        new_bds, _ = jax.vmap(_rollout_step)(bds, rngs)
        return new_bds, None

    rngs = jax.random.split(rng, num_steps)
    final, _ = lax.scan(body, boards, rngs)
    winners = jax.vmap(lambda bd: engine.score(bd, komi)[0])(final)
    # winner is black-positive; convert to the original side to move
    val = jnp.where(to_move == 1, winners, -winners).astype(jnp.float32)
    return val[:, None]


def make_heuristic_predict_fn(komi: float, rollout_steps: int = 0,
                              value_mode: str = "score", seed: int = 0):
    """predict_fn(variables, boards) -> (policy, value) for the nomodel
    configuration.

    value_mode 'score': fast tanh-squashed area-score estimate of the
    current position (cheap, good for priors-only search).
    value_mode 'rollout': batched random playouts (closer to michi's
    Monte-Carlo evaluation, heavier).
    `variables` is ignored (kept for actor-signature compatibility);
    rollout randomness is derived from the board content so the fn stays
    a pure function of its inputs (fixed-seed reproducible).
    """

    def predict(variables, boards):
        b = boards.shape[0]
        n = boards.shape[-3]
        iboards = boards.astype(jnp.int8)
        priors = jax.vmap(heuristic_priors)(iboards)
        policy = priors / jnp.sum(priors, axis=-1, keepdims=True)
        if value_mode == "rollout":
            mix = jnp.sum(boards.astype(jnp.uint32)) + jnp.uint32(seed)
            rng = jax.random.fold_in(jax.random.PRNGKey(0), mix)
            value = rollout_values(iboards, rng, komi, rollout_steps)
        else:
            def score_value(bd):
                w, black, white = engine.score(bd, komi)
                to_move = bd[0, 0, 16].astype(jnp.float32)
                diff = (black - white) * to_move
                return jnp.tanh(diff / (n * 2.0))

            value = jax.vmap(score_value)(iboards)[:, None]
        return policy, value

    return predict

"""Vectorized, functional Go engine (jit/vmap-compatible).

Functional parity targets: reference ``play.py`` —
  - board encoding ``game_init``/``make_play`` (play.py:295-299, 226-242):
    (N, N, 17) planes; 0..15 are 8 move-pairs of (current-player stones,
    opponent stones) history, plane 16 is side-to-move (+-1); history
    shifts by two planes per move; the player swap permutes planes via
    ``SWAP_INDEX`` (play.py:15).
  - legality ``legal_moves`` (play.py:71-104): occupied, simple-ko from
    history planes, suicide-unless-capturing.
  - captures ``take_stones`` (play.py:182-217): opponent groups adjacent
    to the placed stone die first, then own (suicide) groups.
  - area scoring ``get_winner``/``_get_points``/``color_board``
    (play.py:244-292).

The reference implements these with recursive Python flood fills; here
everything is masked-dilation fixpoints under ``lax.while_loop`` so a
whole batch of boards steps in lockstep on device.  All functions operate
on a single board and are batched by callers with ``jax.vmap``; board
size is static (derived from the array shape).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Plane-permutation applied on every player swap (reference play.py:15).
SWAP_INDEX = (1, 0, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13, 12, 15, 14)
NUM_PLANES = 17


# ---------------------------------------------------------------------------
# low-level helpers


def _shift_fill(v, dy: int, dx: int, fill):
    """v shifted so out[..., y, x] = v[..., y + dy, x + dx], `fill`
    outside.  Rank-polymorphic over leading batch dims."""
    rows, cols = v.shape[-2], v.shape[-1]
    pad = [(0, 0)] * (v.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(v, pad, constant_values=fill)
    return p[..., 1 + dy:1 + dy + rows, 1 + dx:1 + dx + cols]


def _dilate(m):
    """4-neighborhood dilation of a bool mask: any orthogonal neighbor set."""
    return (
        _shift_fill(m, 1, 0, False)
        | _shift_fill(m, -1, 0, False)
        | _shift_fill(m, 0, 1, False)
        | _shift_fill(m, 0, -1, False)
    )


def _nbr_reduce(v, fill, op):
    """Elementwise op over the 4 orthogonal neighbors (fill off-board)."""
    return op(
        op(_shift_fill(v, 1, 0, fill), _shift_fill(v, -1, 0, fill)),
        op(_shift_fill(v, 0, 1, fill), _shift_fill(v, 0, -1, fill)),
    )


def _flood(seed, allowed):
    """Grow `seed & allowed` within `allowed` (4-connectivity) to fixpoint.

    TPU-native replacement for the reference's recursive flood fills
    (capture_group play.py:160-180, _color_adjoint play.py:244-263).
    """
    seed = seed & allowed

    def cond(state):
        return state[1]

    def body(state):
        cur, _ = state
        new = cur | (allowed & _dilate(cur))
        return new, jnp.any(new != cur)

    out, _ = lax.while_loop(cond, body, (seed, jnp.any(seed)))
    return out


def _group_minmax_lib(stones, empty):
    """Per-stone min/max flat index of its group's distinct liberties.

    Returns (mn, mx) int32 grids; for non-stones mn=N*N (INF) and mx=-1.
    A group has exactly one liberty iff mn == mx < N*N, zero iff mn > mx,
    and >= 2 distinct liberties iff mn < mx.
    """
    n = stones.shape[-1]
    inf = n * n
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    flat = row * n + col
    lib_min = jnp.where(empty, flat, inf)
    lib_max = jnp.where(empty, flat, -1)
    mn = jnp.where(stones, _nbr_reduce(lib_min, inf, jnp.minimum), inf)
    mx = jnp.where(stones, _nbr_reduce(lib_max, -1, jnp.maximum), -1)

    def cond(state):
        return state[2]

    def body(state):
        mn, mx, _ = state
        nmn = jnp.minimum(mn, _nbr_reduce(jnp.where(stones, mn, inf), inf, jnp.minimum))
        nmx = jnp.maximum(mx, _nbr_reduce(jnp.where(stones, mx, -1), -1, jnp.maximum))
        nmn = jnp.where(stones, nmn, inf)
        nmx = jnp.where(stones, nmx, -1)
        return nmn, nmx, jnp.any((nmn != mn) | (nmx != mx))

    mn, mx, _ = lax.while_loop(cond, body, (mn, mx, jnp.array(True)))
    return mn, mx


# ---------------------------------------------------------------------------
# board API


def init_board(size: int, dtype=jnp.int8):
    """Empty board, player +1 to move (reference game_init play.py:295-299)."""
    board = jnp.zeros((size, size, NUM_PLANES), dtype)
    return board.at[:, :, 16].set(1)


def current_player(board):
    """Side to move: +1/-1 (reference board[0,0,0,-1])."""
    return board[0, 0, 16].astype(jnp.int32)


def real_board(board):
    """Signed board with black (first mover) = +1, white = -1.

    Reference get_real_board play.py:106-112.
    """
    player = board[0, 0, 16].astype(jnp.int32)
    p0 = board[:, :, 0].astype(jnp.int32)
    p1 = board[:, :, 1].astype(jnp.int32)
    return jnp.where(player == 1, p0 - p1, p1 - p0)


def _swap_sides(board):
    """Swap current/other planes and flip side-to-move (play.py:219-224)."""
    swapped = board[:, :, list(SWAP_INDEX)]
    return jnp.concatenate([swapped, -board[:, :, 16:17]], axis=-1)


@jax.jit
def illegal_moves_mask(board):
    """(N*N+1,) bool, True = illegal.  Pass (last entry) is always legal.

    Same convention as reference legal_moves (play.py:71-104): occupied,
    simple ko read off the history planes (play.py:78-80), and suicide
    unless the move captures (play.py:83-101).

    Parity quirk replicated deliberately: the reference's suicide test
    (play.py:99, ``capture_group(col, row, real_board)``) runs on the
    board WITHOUT the placed stone, at an empty point — so its rule is
    "a move is suicide iff it has no adjacent empty point and captures
    no opponent group", which also forbids filling a fully-surrounded
    point that would join a live friendly group.  Capture detection uses
    the distinct-liberty min/max trick: an adjacent opponent group with
    <= 1 distinct liberty is captured by the move (its last liberty must
    be the played point, which is adjacent and empty).
    """
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    ko_pt = (board[:, :, 2].astype(jnp.int32)
             - board[:, :, 0].astype(jnp.int32)) == 1
    return _illegal_core(own, opp, ko_pt)


def legal_moves_mask(board):
    """(N*N+1,) bool, True = legal."""
    return ~illegal_moves_mask(board)


def signed_stones(board):
    """(N, N) int8 black-positive stone grid from a plane board
    (black = the first mover = +1; reference get_real_board
    play.py:106-112)."""
    player = board[0, 0, 16].astype(jnp.int8)
    return (board[:, :, 0].astype(jnp.int8) - board[:, :, 1].astype(jnp.int8)
            ) * player


def step_stones(stones, side, action):
    """Apply a move on a signed stone grid: place `side`'s stone at
    `action` (N*N = pass), resolve captures with the reference's
    take_stones ordering (opponent groups adjacent to the stone first,
    then own suicide removal; play.py:182-217).  The compact per-node
    state of the search tree — history planes live only at the tree
    root (see search/tree.py)."""
    n = stones.shape[-2]
    action = jnp.asarray(action, jnp.int32)
    side = jnp.asarray(side, jnp.int8)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onehot = (row * n + col) == action  # all-False when action == pass

    own = (stones == side) | onehot
    opp = stones == -side

    empty = ~(own | opp)
    dead_opp = opp & ~_flood(opp & _dilate(empty), opp)
    removed_opp = _flood(dead_opp & _dilate(onehot), dead_opp)
    opp = opp & ~removed_opp

    empty = ~(own | opp)
    dead_own = own & ~_flood(own & _dilate(empty), own)
    removed_own = _flood(dead_own & (_dilate(onehot) | onehot), dead_own)
    own = own & ~removed_own

    return jnp.where(own, side, jnp.where(opp, -side, 0)).astype(jnp.int8)


def _illegal_core(own, opp, ko_pt):
    """Shared legality core (see illegal_moves_mask for semantics)."""
    n = own.shape[-1]
    empty = ~(own | opp)
    ko = ko_pt & (jnp.sum(ko_pt) == 1)
    opp_mn, opp_mx = _group_minmax_lib(opp, empty)
    opp_capturable = opp & (opp_mn >= opp_mx)
    breath = _dilate(empty) | _dilate(opp_capturable)
    legal = empty & ~ko & breath
    illegal = ~legal.reshape(n * n)
    return jnp.concatenate([illegal, jnp.zeros((1,), bool)])


def illegal_moves_mask_stones(stones, prev_stones, side):
    """(N*N+1,) illegality mask from a signed stone grid + the previous
    position's grid (for the simple-ko test).  Equivalent to
    illegal_moves_mask on the full plane board: plane 0 == (stones ==
    side), plane 2 == (prev_stones == side) — the history shift plus
    player swap make plane 2 the *current* side's stones one position
    ago (play.py:78-80,231,241)."""
    own = stones == side
    opp = stones == -side
    ko_pt = (prev_stones == side) & ~own
    return _illegal_core(own, opp, ko_pt)


@jax.jit
def step(board, action):
    """Apply a move for the side to move; action in [0, N*N], N*N = pass.

    Reference make_play play.py:226-242: shift history planes, place the
    stone, resolve captures (take_stones play.py:182-217: opponent groups
    adjacent to the placed stone first, then own suicide groups), swap
    players.  History shifts and the player swap happen on pass too.
    The move must be legal; no validation is performed under jit.
    """
    n = board.shape[-3]
    num_points = n * n
    dtype = board.dtype
    action = jnp.asarray(action, jnp.int32)

    # history shift: planes 2:16 <- 0:14 (play.py:231)
    shifted = jnp.concatenate(
        [board[:, :, 0:2], board[:, :, 0:14], board[:, :, 16:17]], axis=-1
    )

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onehot = (row * n + col) == action  # all-False when action == pass

    p0 = (shifted[:, :, 0] == 1) | onehot
    p1 = shifted[:, :, 1] == 1

    # opponent captures: dead = no liberty; only groups adjacent to the
    # placed stone are removed (take_stones play.py:185-199)
    empty = ~(p0 | p1)
    dead_opp = p1 & ~_flood(p1 & _dilate(empty), p1)
    removed_opp = _flood(dead_opp & _dilate(onehot), dead_opp)
    p1 = p1 & ~removed_opp

    # own suicide: checked at the placed stone and its neighbors
    # (take_stones play.py:200-215), after opponent captures resolved
    empty = ~(p0 | p1)
    dead_own = p0 & ~_flood(p0 & _dilate(empty), p0)
    removed_own = _flood(dead_own & (_dilate(onehot) | onehot), dead_own)
    p0 = p0 & ~removed_own

    placed = shifted.at[:, :, 0].set(p0.astype(dtype)).at[:, :, 1].set(p1.astype(dtype))
    return _swap_sides(placed)


def play_at(board, x, y, color=None):
    """Convenience wrapper mirroring reference make_play(x, y, board, color).

    y == size means pass.  If `color` is given and differs from the side
    to move, the sides are swapped first (used by tests/GTP to force
    consecutive moves of one color, play.py:226-229).
    Returns (new_board, player-who-moved).
    """
    n = board.shape[-3]
    if color is not None and int(board[0, 0, 16]) != color:
        board = _swap_sides(board)
    player = int(board[0, 0, 16])
    action = n * n if y >= n else y * n + x
    return step(board, action), player


@jax.jit
def score(board, komi: float):
    """Area score (reference get_winner/_get_points play.py:274-292).

    Returns (winner, black_points, white_points) with winner in {+1,0,-1}
    (black/tie/white).  Empty regions touching only black count for
    black, only white for white, dame for neither; komi added to white.
    """
    real = real_board(board)
    black = real == 1
    white = real == -1
    empty = real == 0
    reach_b = _flood(empty & _dilate(black), empty)
    reach_w = _flood(empty & _dilate(white), empty)
    black_pts = (jnp.sum(black) + jnp.sum(reach_b & ~reach_w)).astype(jnp.float32)
    white_pts = (jnp.sum(white) + jnp.sum(reach_w & ~reach_b)).astype(jnp.float32) + komi
    w = jnp.where(black_pts > white_pts, 1, jnp.where(black_pts == white_pts, 0, -1))
    return w, black_pts, white_pts


def winner(board, komi: float):
    return score(board, komi)[0]


def color_board(real, color: int):
    """Empty points connected to `color` stones become `color`.

    Vectorized reference color_board/_color_adjoint (play.py:244-271);
    operates on a signed 2D board.
    """
    real = jnp.asarray(real, jnp.int32)
    stones = real == color
    empty = real == 0
    reach = _flood(empty & _dilate(stones), empty)
    return jnp.where(reach, color, real)


def area_counts(real):
    """colored(+1) + colored(-1), as in reference _get_points play.py:286-292.

    Black stones -> 2, white stones -> -2, black-only territory -> 1,
    white-only -> -1, dame/neutral -> 0.
    """
    return color_board(real, 1) + color_board(real, -1)


def group_liberty_count(board, x: int, y: int, color: int):
    """Distinct liberties of the `color` group connected to (x, y).

    Clean-semantics counterpart of reference get_liberties (play.py:57-69):
    the group is the seed point plus connected stones of `color` (in
    real-board labeling), liberties are distinct empty neighbors of the
    group, excluding the seed point itself.
    """
    n = board.shape[-3]
    real = real_board(board)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    seed = (row == y) & (col == x)
    stones = real == color
    group = seed | _flood(stones & _dilate(seed), stones)
    libs = (real == 0) & _dilate(group) & ~seed
    return jnp.sum(libs)


# ---------------------------------------------------------------------------
# batched variants (leading B axis, no vmap)
#
# The hot search path steps B*k leaf boards per round; doing that as one
# batched computation (instead of vmap-of-single-board) lets the flood
# fixpoints run as whole-batch iterations and makes room for a fused
# Pallas kernel (ops/flood.py) that iterates each block in VMEM.

_flood_batch_impl = None


def set_flood_impl(fn) -> None:
    """Install a batched flood-fill implementation (seed, allowed) ->
    reached for (B, N, N) bool masks; None restores the XLA fixpoint.
    Used by ops.flood to plug in the Pallas TPU kernel."""
    global _flood_batch_impl
    _flood_batch_impl = fn


def _flood_b(seed, allowed):
    if _flood_batch_impl is not None:
        return _flood_batch_impl(seed, allowed)
    return _flood(seed, allowed)


def step_stones_batch(stones, sides, actions):
    """Batched ``step_stones``: (B, N, N) signed grids, (B,) sides, (B,)
    actions.  The search round's leaf stepping — the dominant flood-fill
    load (B*k leaves per round) — runs through ``_flood_b`` so the
    Pallas TPU kernel (ops/flood.py) applies where it wins."""
    n = stones.shape[-1]
    actions = jnp.asarray(actions, jnp.int32)
    side = jnp.asarray(sides, jnp.int8)[:, None, None]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onehot = (row * n + col)[None] == actions[:, None, None]

    own = (stones == side) | onehot
    opp = stones == -side

    empty = ~(own | opp)
    dead_opp = opp & ~_flood_b(opp & _dilate(empty), opp)
    removed_opp = _flood_b(dead_opp & _dilate(onehot), dead_opp)
    opp = opp & ~removed_opp

    empty = ~(own | opp)
    dead_own = own & ~_flood_b(own & _dilate(empty), own)
    removed_own = _flood_b(dead_own & (_dilate(onehot) | onehot), dead_own)
    own = own & ~removed_own

    return jnp.where(own, side, jnp.where(opp, -side, 0)).astype(jnp.int8)


def illegal_moves_mask_stones_batch(stones, prev_stones, sides):
    """Batched ``illegal_moves_mask_stones``: (B, N, N) grids + (B,)
    sides -> (B, N*N+1) bool."""
    n = stones.shape[-1]
    side = jnp.asarray(sides, jnp.int8)[:, None, None]
    own = stones == side
    opp = stones == -side
    ko_pt = (prev_stones == side) & ~own
    empty = ~(own | opp)
    ko = ko_pt & (jnp.sum(ko_pt, axis=(-2, -1), keepdims=True) == 1)
    opp_mn, opp_mx = _group_minmax_lib(opp, empty)
    opp_capturable = opp & (opp_mn >= opp_mx)
    breath = _dilate(empty) | _dilate(opp_capturable)
    legal = empty & ~ko & breath
    illegal = ~legal.reshape(stones.shape[0], n * n)
    return jnp.concatenate(
        [illegal, jnp.zeros((stones.shape[0], 1), bool)], axis=-1)


_step_legal_impl = None


def set_step_legal_impl(fn) -> None:
    """Install a fused (stones, sides, actions) -> (new_stones, illegal)
    implementation for the search leaf path; None restores the XLA
    composition.  Used by ops.gostep to plug in the fused Pallas TPU
    kernel."""
    global _step_legal_impl
    _step_legal_impl = fn


def step_and_illegal_stones_batch(stones, sides, actions):
    """Fused leaf step + next-mover legality: (B, N, N) signed grids,
    (B,) sides/actions -> (new_stones (B, N, N) int8,
    illegal (B, N*N+1) bool).  THE search hot path: one call covers the
    B*k leaf expansions of a search round (mcts.simulate_round).
    Semantics = step_stones_batch then illegal_moves_mask_stones_batch
    on (new, parent, -side); the pluggable ops.gostep Pallas kernel
    runs the whole sequence VMEM-resident."""
    if _step_legal_impl is not None:
        return _step_legal_impl(stones, sides, actions)
    new_stones = step_stones_batch(stones, sides, actions)
    next_side = (-jnp.asarray(sides, jnp.int8))
    illegal = illegal_moves_mask_stones_batch(new_stones, stones, next_side)
    return new_stones, illegal


def step_batch(boards, actions):
    """Batched `step`: boards (B, N, N, 17), actions (B,) int32."""
    n = boards.shape[-3]
    dtype = boards.dtype
    actions = jnp.asarray(actions, jnp.int32)

    shifted = jnp.concatenate(
        [boards[..., 0:2], boards[..., 0:14], boards[..., 16:17]], axis=-1)

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    onehot = (row * n + col)[None] == actions[:, None, None]

    p0 = (shifted[..., 0] == 1) | onehot
    p1 = shifted[..., 1] == 1

    empty = ~(p0 | p1)
    dead_opp = p1 & ~_flood_b(p1 & _dilate(empty), p1)
    removed_opp = _flood_b(dead_opp & _dilate(onehot), dead_opp)
    p1 = p1 & ~removed_opp

    empty = ~(p0 | p1)
    dead_own = p0 & ~_flood_b(p0 & _dilate(empty), p0)
    removed_own = _flood_b(dead_own & (_dilate(onehot) | onehot), dead_own)
    p0 = p0 & ~removed_own

    placed = shifted.at[..., 0].set(p0.astype(dtype)).at[..., 1].set(
        p1.astype(dtype))
    swapped = placed[..., list(SWAP_INDEX)]
    return jnp.concatenate([swapped, -placed[..., 16:17]], axis=-1)


def illegal_moves_mask_batch(boards):
    """Batched `illegal_moves_mask`: (B, N, N, 17) -> (B, N*N+1) bool."""
    n = boards.shape[-3]
    own = boards[..., 0] == 1
    opp = boards[..., 1] == 1
    empty = ~(own | opp)

    ko_pt = (boards[..., 2].astype(jnp.int32)
             - boards[..., 0].astype(jnp.int32)) == 1
    ko = ko_pt & (jnp.sum(ko_pt, axis=(-2, -1), keepdims=True) == 1)

    opp_mn, opp_mx = _group_minmax_lib(opp, empty)
    opp_capturable = opp & (opp_mn >= opp_mx)

    breath = _dilate(empty) | _dilate(opp_capturable)
    legal = empty & ~ko & breath
    illegal = ~legal.reshape(boards.shape[0], n * n)
    return jnp.concatenate(
        [illegal, jnp.zeros((boards.shape[0], 1), bool)], axis=-1)


def to_features(board, dtype=jnp.float32):
    """Network input features: the 17 planes as floats.

    Bit-for-bit the reference's feature encoding (the board IS the
    features; self_play.py:187 feeds it directly to the model).
    """
    return board.astype(dtype)


def show_board(board) -> str:
    """ASCII rendering (reference _show_board play.py:114-133 style)."""
    real = jax.device_get(real_board(board))
    out = []
    for brow in real:
        out.append(" ".join("○" if c == 1 else "●" if c == -1 else "." for c in brow))
    return "\n".join(out)

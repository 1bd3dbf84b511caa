"""Vectorized Go heuristics for the model-free michi-style engine.

Reference counterpart: mcts1/go_heuristics.py — 3x3 playout patterns
(pat3src/pat3_expand :29-107,266-290), common-fate-graph distances
(cfg_distances :215-236), line height / empty area (:239-250),
atari/capture analysis incl. ladder reading (fix_atari :116-213), and
eye detection (is_eyeish/is_eye :420-456).  The reference runs these as
scalar string-board routines per candidate move; here each heuristic is
computed for EVERY board point at once as masked-dilation / gather ops,
so a whole batch of boards is analyzed in a few fused XLA kernels
(SURVEY.md §7 "heuristic rollouts" hard-part).

Boards use the goenv 17-plane encoding (plane 0 = side-to-move stones,
plane 1 = opponent stones); all masks are from the side-to-move
perspective.

Deliberate deviations from the reference (documented per function):
- ladder reading uses a deterministic greedy attacker instead of the
  reference's exhaustive two-branch recursion (read_ladder_attack
  go_heuristics.py:137-150); clean ladders read identically, pinned by
  golden tests;
- self-atari detection is "resulting group has exactly one liberty"
  (with snapback awareness), where the reference tests whether
  fix_atari finds any capture defense for the played stone.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.goenv.engine import _dilate, _flood, _nbr_reduce, _shift_fill

# ---------------------------------------------------------------------------
# 3x3 playout patterns (reference pat3src go_heuristics.py:29-71)
#
# Pattern alphabet: 'X' own stone, 'O' opponent stone, '.' empty,
# ' ' off-board, '?' anything, 'x' not-own, 'o' not-opponent.  A point
# matches when its 3x3 neighborhood matches any pattern under any of
# the 8 dihedral transforms and either color orientation (the
# reference materializes that closure as an expanded string set,
# pat3_expand go_heuristics.py:74-104; here it becomes one 4^8-entry
# lookup table indexed by the base-4 neighborhood code).

_PAT3_SRC = [
    # hane patterns
    ("XOX", "...", "???"),   # enclosing hane
    ("XO.", "...", "?.?"),   # non-cutting hane
    ("XO?", "X..", "x.?"),   # magari
    # generic attachment
    (".O.", "X..", "..."),   # katatsuke / diagonal attachment
    # cut patterns
    ("XO?", "O.o", "?o?"),   # unprotected cut
    ("XO?", "O.X", "???"),   # peeped cut
    ("?X?", "O.O", "ooo"),   # de
    ("OX?", "o.O", "???"),   # cut keima
    # side (edge) patterns
    ("X.?", "O.?", "   "),   # chase
    ("OX?", "X.O", "   "),   # block side cut
    ("?X?", "x.O", "   "),   # block side connection
    ("?XO", "x.x", "   "),   # sagari
    ("?OX", "X.O", "   "),   # side cut
]

# symbol codes used in neighborhood encodings
_EMPTY, _OWN, _OPP, _EDGE = 0, 1, 2, 3

# allowed-symbol bitmask per pattern character (bit i = symbol i allowed)
_CHAR_MASK = {
    ".": 1 << _EMPTY,
    "X": 1 << _OWN,
    "O": 1 << _OPP,
    " ": 1 << _EDGE,
    "?": 0b1111,
    "x": 0b1111 & ~(1 << _OWN),
    "o": 0b1111 & ~(1 << _OPP),
}
_SWAP = {"X": "O", "O": "X", "x": "o", "o": "x"}


def _dihedral_variants(rows):
    """All 8 rotations/reflections of a 3-row pattern."""
    grid = [list(r) for r in rows]
    out = []
    g = grid
    for _ in range(4):
        g = [[g[2 - c][r] for c in range(3)] for r in range(3)]  # rot90
        out.append(g)
        out.append(g[::-1])  # vertical flip
    return out


@lru_cache(maxsize=1)
def _pat3_table_np() -> np.ndarray:
    """(65536,) bool: neighborhood-code -> matches any pat3.

    Code: the 8 non-center points of the 3x3 square in row-major order
    (NW, N, NE, W, E, SW, S, SE), base-4 little-endian, symbols
    (_EMPTY, _OWN, _OPP, _EDGE).  Center is the empty candidate point.
    """
    masks = []
    for pat in _PAT3_SRC:
        for rows in (pat, tuple("".join(_SWAP.get(ch, ch) for ch in r)
                                for r in pat)):
            for var in _dihedral_variants(rows):
                flat = [ch for row in var for ch in row]
                if not (_CHAR_MASK[flat[4]] >> _EMPTY) & 1:
                    continue  # center cannot host a move
                masks.append([_CHAR_MASK[ch]
                              for i, ch in enumerate(flat) if i != 4])
    masks = np.unique(np.asarray(masks, np.uint8), axis=0)  # (P, 8)

    codes = np.arange(4 ** 8, dtype=np.int64)
    syms = np.stack([(codes >> (2 * k)) & 3 for k in range(8)], 1)  # (C, 8)
    table = np.zeros(4 ** 8, bool)
    for m in masks:
        table |= np.all((m[None, :] >> syms) & 1 == 1, axis=1)
    return table


# the 8 non-center offsets, row-major — must match _pat3_table_np
_NBR8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def pat3_mask(board):
    """(N, N) bool: empty points whose 3x3 neighborhood matches a pat3
    (reference `neighborhood_33(...) in pat3set`, go_heuristics.py:108,
    tree_search.py:162-167)."""
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    return pat3_mask_from(own, opp)


def pat3_mask_from(own, opp):
    """pat3_mask from raw (N, N) own/opp masks (stone-grid playouts)."""
    empty = ~(own | opp)
    sym = jnp.where(own, _OWN, jnp.where(opp, _OPP, _EMPTY)).astype(jnp.int32)
    code = jnp.zeros_like(sym)
    for k, (dy, dx) in enumerate(_NBR8):
        code = code + (_shift_fill(sym, dy, dx, _EDGE) << (2 * k))
    table = jnp.asarray(_pat3_table_np())
    return table[code] & empty


# ---------------------------------------------------------------------------
# locality / shape heuristics


def cfg_distances(board, last_action, cap: int = 4):
    """(N, N) int32 common-fate-graph distance from `last_action`:
    stepping within a same-colored chain is free, any other step costs 1
    (reference cfg_distances go_heuristics.py:215-236).  Distances are
    clamped to `cap` (the reference only consumes d in 1..3,
    tree_node.py:60-62); `last_action` == pass yields all-`cap`.
    """
    n = board.shape[-3]
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    flat = jnp.arange(n * n, dtype=jnp.int32).reshape(n, n)
    dist = jnp.where(flat == last_action, 0, cap).astype(jnp.int32)

    def relax(d):
        best = d
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nd = _shift_fill(d, dy, dx, cap)
            same = (own & _shift_fill(own, dy, dx, False)) | (
                opp & _shift_fill(opp, dy, dx, False))
            best = jnp.minimum(best, jnp.minimum(nd + 1, cap)
                               .astype(jnp.int32))
            best = jnp.minimum(best, jnp.where(same, nd, cap))
        return best

    def cond(state):
        return state[1]

    def body(state):
        d, _ = state
        nd = relax(d)
        return nd, jnp.any(nd != d)

    dist, _ = lax.while_loop(cond, body, (dist, jnp.asarray(True)))
    return dist


def line_height_grid(n: int):
    """(N, N) int32 line number above the nearest edge (0-indexed;
    reference line_height go_heuristics.py:239-242)."""
    row = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.minimum(jnp.minimum(row, n - 1 - row),
                       jnp.minimum(col, n - 1 - col))


def empty_area_mask(board, dist: int = 3):
    """(N, N) bool: empty points with no stone within `dist` steps
    through empty space (reference empty_area go_heuristics.py:245-250's
    recursion, unrolled as `dist` masked dilations)."""
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    stones = own | opp
    empty = ~stones
    bad = _dilate(stones)
    for _ in range(dist - 1):
        bad = bad | _dilate(bad & empty)
    return empty & ~bad


def own_true_eye_mask(board):
    """(N, N) bool: single-point true eyes of the side to move — all
    on-board orthogonal neighbors own, and not falsified by diagonals
    (>= 2 opponent diagonals, edge counts as one; reference is_eye
    go_heuristics.py:436-456).  Playouts and michi child generation
    never fill these (Position.moves go_heuristics.py:505-521)."""
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    return own_true_eye_from(own, opp)


def own_true_eye_from(own, opp):
    """own_true_eye_mask from raw (N, N) own/opp masks."""
    empty = ~(own | opp)
    eyeish = (
        _shift_fill(own, 1, 0, True)
        & _shift_fill(own, -1, 0, True)
        & _shift_fill(own, 0, 1, True)
        & _shift_fill(own, 0, -1, True)
    )
    false_count = jnp.zeros(own.shape, jnp.int32)
    at_edge = jnp.zeros(own.shape, bool)
    for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        false_count = false_count + _shift_fill(opp, dy, dx, False).astype(
            jnp.int32)
        at_edge = at_edge | ~_shift_fill(jnp.ones_like(own), dy, dx, False)
    false_count = false_count + at_edge.astype(jnp.int32)
    return empty & eyeish & (false_count < 2)


# ---------------------------------------------------------------------------
# group analysis: distinct liberties, labels, sizes


def _merge_tops(a, b, k: int, inf: int):
    """Merge two (k, ...) sorted-distinct index stacks, keeping the k
    smallest distinct (inf = pad)."""
    cat = jnp.concatenate([a, b], 0)
    s = jnp.sort(cat, axis=0)
    dup = jnp.concatenate(
        [jnp.zeros_like(s[:1], bool), s[1:] == s[:-1]], 0)
    s = jnp.where(dup, inf, s)
    return jnp.sort(s, axis=0)[:k]


def group_lib_tops(stones, empty, k: int = 3):
    """(k, N, N) int32: per stone, the k smallest distinct flat indices
    of its group's liberties (N*N pad).  Generalizes goenv's
    _group_minmax_lib to k-distinct counting — a group has exactly c
    distinct liberties iff tops[c-1] < N*N <= tops[c]."""
    n = stones.shape[-1]
    inf = n * n
    flat = jnp.arange(inf, dtype=jnp.int32).reshape(n, n)
    lib = jnp.where(empty, flat, inf)
    nbrs = jnp.stack(
        [_shift_fill(lib, dy, dx, inf)
         for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1))], 0)
    s = jnp.sort(nbrs, axis=0)
    dup = jnp.concatenate([jnp.zeros_like(s[:1], bool), s[1:] == s[:-1]], 0)
    s = jnp.sort(jnp.where(dup, inf, s), axis=0)[:k]
    tops = jnp.where(stones[None], s, inf)

    def cond(state):
        return state[1]

    def body(state):
        t, _ = state
        merged = t
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = _shift_fill(jnp.where(stones[None], t, inf), dy, dx, inf)
            merged = _merge_tops(merged, nb, k, inf)
        merged = jnp.where(stones[None], merged, inf)
        return merged, jnp.any(merged != t)

    tops, _ = lax.while_loop(cond, body, (tops, jnp.asarray(True)))
    return tops


def lib_count_capped(tops):
    """(N, N) int32 distinct-liberty count (capped at k) from tops."""
    n = tops.shape[-1]
    return jnp.sum(tops < n * n, axis=0).astype(jnp.int32)


def group_labels(stones):
    """(N, N) int32: per stone, the minimum flat index in its group
    (N*N for non-stones) — a stable group id."""
    n = stones.shape[-1]
    inf = n * n
    flat = jnp.arange(inf, dtype=jnp.int32).reshape(n, n)
    lab = jnp.where(stones, flat, inf)

    def cond(state):
        return state[1]

    def body(state):
        l, _ = state
        nl = jnp.minimum(
            l, _nbr_reduce(jnp.where(stones, l, inf), inf, jnp.minimum))
        nl = jnp.where(stones, nl, inf)
        return nl, jnp.any(nl != l)

    lab, _ = lax.while_loop(cond, body, (lab, jnp.asarray(True)))
    return lab


def group_sizes(stones, labels):
    """(N, N) int32 stone count of each stone's group (0 elsewhere)."""
    n = stones.shape[-1]
    counts = jnp.zeros((n * n + 1,), jnp.int32).at[labels.reshape(-1)].add(
        stones.reshape(-1).astype(jnp.int32))
    return jnp.where(stones, counts[labels], 0)


# ---------------------------------------------------------------------------
# self-atari (exact liberty counting incl. snapback)


def self_atari_mask(board):
    """(N, N) bool: empty points where a side-to-move stone would leave
    its (merged) group with exactly one liberty.

    Counts the distinct liberties of the post-move group directly: the
    union of the point's empty neighbors and the liberties of adjacent
    own groups, minus the point itself, plus capture relief (a captured
    single stone contributes its point — snapback stays self-atari; a
    capture of >= 2 stones never counts as self-atari).  The reference
    instead plays the move and asks fix_atari for capture defenses
    (mcplayout go_heuristics.py / tree_search.py:195-200,
    tree_node.py:76-79); the two agree on "group left with one liberty"
    which is what both use it for.
    """
    n = board.shape[-3]
    inf = n * n
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    empty = ~(own | opp)
    flat = jnp.arange(inf, dtype=jnp.int32).reshape(n, n)

    own_tops = group_lib_tops(own, empty, k=3)          # (3, N, N)
    opp_tops = group_lib_tops(opp, empty, k=2)
    opp_atari = opp & (lib_count_capped(opp_tops) == 1)
    opp_labels = group_labels(opp)
    opp_size = group_sizes(opp, opp_labels)

    dirs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    cands = []
    cap_single = []  # snapback candidate liberties
    for dy, dx in dirs:
        # empty neighbor -> its own index is a liberty
        nb_empty = _shift_fill(empty, dy, dx, False)
        nb_flat = _shift_fill(flat, dy, dx, inf)
        cands.append(jnp.where(nb_empty, nb_flat, inf))
        # own-group neighbor -> its group's liberty tops
        nb_own = _shift_fill(own, dy, dx, False)
        nb_tops = _shift_fill(own_tops, dy, dx, inf)
        for i in range(nb_tops.shape[0]):
            cands.append(jnp.where(nb_own, nb_tops[i], inf))
    # capture relief: adjacent opponent groups whose single liberty is here
    cap_relief = jnp.zeros((n, n), jnp.int32)
    for dy, dx in dirs:
        nb_atari = _shift_fill(opp_atari, dy, dx, False)
        nb_lib = _shift_fill(opp_tops[0], dy, dx, inf)
        nb_size = _shift_fill(opp_size, dy, dx, 0)
        nb_flat = _shift_fill(flat, dy, dx, inf)
        captures_here = nb_atari & (nb_lib == flat)
        cap_relief = cap_relief + jnp.where(captures_here, nb_size, 0)
        # the captured neighbor point itself becomes a liberty
        cap_single.append(jnp.where(captures_here, nb_flat, inf))

    cands = jnp.stack(cands + cap_single, 0)            # (K, N, N)
    cands = jnp.where(cands == flat[None], inf, cands)  # exclude the point
    s = jnp.sort(cands, axis=0)
    distinct = jnp.sum(
        (s < inf)
        & jnp.concatenate([jnp.ones_like(s[:1], bool), s[1:] != s[:-1]], 0),
        axis=0)
    # note: the same captured group counted from two directions inflates
    # cap_relief, which only strengthens the (>= 2 stones freed -> not
    # self-atari) shortcut it feeds.
    return empty & (distinct <= 1) & (cap_relief < 2)


# ---------------------------------------------------------------------------
# atari / capture analysis (fix_atari parity)


def capture_moves(board, include_escapes: bool = True):
    """Suggested capture/defense moves for groups in atari, as masks.

    Returns (suggest, many): (N, N) bools — `suggest` marks the union
    of (i) liberties of opponent groups in atari (captures, incl.
    countercaptures of a defending group) and (ii) when
    `include_escapes`, the liberty of an own group in atari whose
    escape actually gains >= 2 liberties (reference fix_atari
    go_heuristics.py:176-213's escape test == not-self-atari here).
    `many` marks suggestions whose analyzed group has > 1 stones
    (PRIOR_CAPTURE_MANY vs _ONE sizing, tree_node.py:43-51).
    """
    n = board.shape[-3]
    inf = n * n
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    empty = ~(own | opp)
    flat = jnp.arange(inf, dtype=jnp.int32).reshape(n, n)

    suggest = jnp.zeros((n * n + 1,), bool)
    many = jnp.zeros((n * n + 1,), bool)

    def scatter(mask_pts, idx, big, suggest, many):
        idx = jnp.where(mask_pts, idx, inf).reshape(-1)
        suggest = suggest.at[idx].set(True, mode="drop")
        many = many.at[idx].max(
            jnp.where(mask_pts, big, False).reshape(-1), mode="drop")
        return suggest, many

    # captures: liberties of opponent groups in atari
    opp_tops = group_lib_tops(opp, empty, k=2)
    opp_atari = opp & (lib_count_capped(opp_tops) == 1)
    opp_size = group_sizes(opp, group_labels(opp))
    suggest, many = scatter(opp_atari, opp_tops[0], opp_size > 1,
                            suggest, many)

    if include_escapes:
        own_tops = group_lib_tops(own, empty, k=2)
        own_atari = own & (lib_count_capped(own_tops) == 1)
        own_size = group_sizes(own, group_labels(own))
        sa = self_atari_mask(board)
        esc_ok = ~sa.reshape(-1)
        esc_idx = jnp.where(own_atari, own_tops[0], inf)
        valid = own_atari & esc_ok[jnp.clip(esc_idx, 0, inf - 1)].reshape(
            esc_idx.shape)
        suggest, many = scatter(valid, esc_idx, own_size > 1, suggest, many)

    return (suggest[:inf].reshape(n, n) & empty,
            many[:inf].reshape(n, n) & empty)


# ---------------------------------------------------------------------------
# ladder reading (greedy deterministic variant of read_ladder_attack)

_LADDER_MAX_TARGETS = 4  # 2-liberty groups read per board


def _freedom(empty, idx, n):
    """Number of empty orthogonal neighbors of flat point idx."""
    y, x = idx // n, idx % n
    cnt = jnp.asarray(0, jnp.int32)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        yy, xx = y + dy, x + dx
        inside = (yy >= 0) & (yy < n) & (xx >= 0) & (xx < n)
        cnt = cnt + jnp.where(
            inside & empty[jnp.clip(yy, 0, n - 1), jnp.clip(xx, 0, n - 1)],
            1, 0)
    return cnt


def _ladder_reads_capture(board, seed, first_lib):
    """True if the side to move captures the opponent group containing
    flat point `seed` (exactly 2 liberties) by attacking at `first_lib`.

    Greedy variant of the reference's exhaustive 2-liberty solver
    (read_ladder_attack go_heuristics.py:137-150): the defender always
    extends on its last liberty; at each attacker turn the attacker
    blocks the liberty with more empty neighbors (the freer escape
    direction).  Countercaptures (an attacker group left in atari next
    to the chased group) end the ladder as an escape, matching
    fix_atari's countercapture scan (go_heuristics.py:182-192).
    """
    n = board.shape[-3]
    inf = n * n

    def group_state(bd, target_is_own):
        stones = (bd[:, :, 0] if target_is_own else bd[:, :, 1]) == 1
        other = (bd[:, :, 1] if target_is_own else bd[:, :, 0]) == 1
        empty = ~(stones | other)
        seedm = jnp.zeros((n, n), bool).reshape(-1).at[seed].set(True)
        grp = _flood(seedm.reshape(n, n), stones)
        tops = group_lib_tops(grp, empty, k=3)
        at_seed = tops.reshape(3, -1)[:, seed]
        return grp, at_seed, empty, other

    b0 = engine.step(board, first_lib)
    # after step the defender is the side to move: target group = own
    alive = b0[:, :, 0].reshape(-1)[seed] == 1  # target survived the attack
    state = (b0, jnp.asarray(False), jnp.asarray(False), jnp.asarray(0))

    def cond(st):
        _, done, _, it = st
        return ~done & (it < 2 * inf)

    def body(st):
        bd, _, captured, it = st
        # defender to move; target group is bd's own side
        grp, tops, empty, attacker = group_state(bd, True)
        nlibs = jnp.sum(tops < inf)
        # countercapture: attacker group adjacent to grp in atari?
        atk_tops = group_lib_tops(attacker, empty, k=2)
        atk_atari = attacker & (lib_count_capped(atk_tops) == 1)
        counter = jnp.any(_dilate(grp) & atk_atari)
        escaped = counter | (nlibs >= 2)  # in-atari invariant broken

        lib0 = tops[0]
        legal_def = ~engine.illegal_moves_mask(bd)[jnp.clip(lib0, 0, inf)]
        captured_now = ~escaped & ~legal_def
        bd1 = engine.step(bd, jnp.where(legal_def, lib0, inf).astype(
            jnp.int32))  # inf = pass when trapped
        # attacker to move; target group is now the opponent side
        grp1, tops1, empty1, _ = group_state(bd1, False)
        nlibs1 = jnp.sum(tops1 < inf)
        escaped = escaped | (nlibs1 >= 3)
        captured_now = captured_now | (~escaped & (nlibs1 <= 1))

        # attacker blocks the freer liberty
        f0 = _freedom(empty1, jnp.clip(tops1[0], 0, inf - 1), n)
        f1 = _freedom(empty1, jnp.clip(tops1[1], 0, inf - 1), n)
        pick = jnp.where(f1 > f0, tops1[1], tops1[0]).astype(jnp.int32)
        other = jnp.where(f1 > f0, tops1[0], tops1[1]).astype(jnp.int32)
        illegal = engine.illegal_moves_mask(bd1)
        pick = jnp.where(illegal[jnp.clip(pick, 0, inf)], other, pick)
        atk_fail = illegal[jnp.clip(pick, 0, inf)]
        escaped = escaped | (~captured_now & atk_fail)
        bd2 = engine.step(bd1, jnp.clip(pick, 0, inf).astype(jnp.int32))

        done = escaped | captured_now
        return (jnp.where(done, bd, bd2), done, captured_now, it + 1)

    _, _, captured, _ = lax.while_loop(cond, body, state)
    return alive & captured


def ladder_capture_moves(board):
    """(suggest, many): moves that capture an opponent two-liberty
    group in a working ladder (fix_atari's twolib_test path,
    go_heuristics.py:163-173; priors treat them as captures,
    tree_node.py:43-51).  Reads up to _LADDER_MAX_TARGETS groups per
    board, both initial attack points each (the reference's exhaustive
    first branch), greedy afterwards."""
    n = board.shape[-3]
    inf = n * n
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    empty = ~(own | opp)

    tops = group_lib_tops(opp, empty, k=3)
    two_lib = opp & (lib_count_capped(tops) == 2)
    labels = group_labels(opp)
    sizes = group_sizes(opp, labels)
    cand = two_lib & (sizes > 1)

    # pick up to _LADDER_MAX_TARGETS distinct group labels
    lab_flat = jnp.where(cand, labels, inf).reshape(-1)
    s = jnp.sort(lab_flat)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    ranked = jnp.where(first & (s < inf), s, inf)
    targets = jnp.sort(ranked)[:_LADDER_MAX_TARGETS]  # seed = label = a stone

    lib_pairs = tops.reshape(3, -1)

    def read(seed, which):
        lib = lib_pairs[which, jnp.clip(seed, 0, inf - 1)].astype(jnp.int32)
        valid = (seed < inf) & (lib < inf) & ~engine.illegal_moves_mask(
            board)[jnp.clip(lib, 0, inf)]
        works = lax.cond(
            valid,
            lambda: _ladder_reads_capture(board, seed, lib),
            lambda: jnp.asarray(False))
        return jnp.where(works, lib, inf), seed

    suggest = jnp.zeros((inf + 1,), bool)
    many = jnp.zeros((inf + 1,), bool)
    for which in range(2):
        libs, seeds = jax.vmap(lambda s: read(s, which))(targets)
        suggest = suggest.at[libs].set(True, mode="drop")
        big = sizes.reshape(-1)[jnp.clip(seeds, 0, inf - 1)] > 1
        many = many.at[libs].max(big, mode="drop")
    return suggest[:inf].reshape(n, n), many[:inf].reshape(n, n)


# ---------------------------------------------------------------------------
# MXU closure-based group analysis (the playout hot path)
#
# The sort-based group machinery above (group_lib_tops / group_labels:
# per-group fixpoints of sorted top-k merges) measures ~0.3 ms of device
# throughput PER BOARD-STEP on v5e — hundreds of small sorts inside
# data-dependent while_loops.  A michi playout runs ~162 such steps per
# simulation, which made the reference budget (N_SIMS=1400) minutes per
# move.  This section re-derives the exact same group facts through ONE
# one-hot reachability closure on the MXU (the CLAUDE.md playbook:
# permutation/adjacency matmul squaring instead of index chasing):
#
#   M = closure(same-color adjacency + I)        log2(N*N) squarings
#   libset[p] = OR_{q in group(p)} adj_empty[q]  one boolean matmul
#   lib_count, group size, atari libs, self-atari, capture suggestions,
#   legality: elementwise reductions of M / libset.
#
# bfloat16 operands with a float32 accumulator are exact here (0/1
# values, row sums <= N*N < 2^8 per partial product), so the closure
# runs at full MXU rate.  Exactness vs the sort-based path is pinned by
# tests/test_heuristics.py::test_closure_analysis_matches_sorted.


class GroupAnalysis(NamedTuple):
    """Per-board group facts from one reachability closure.

    Fields (nn = N*N, flat indexing):
      own, opp, empty: (N, N) bool
      reach:     (nn, nn) bool — same-color reachability incl. self
      libset:    (nn, nn) bool — libset[p, q]: q is a liberty of p's
                 group (rows of empty p: p's own adjacent empties)
      lib_count: (nn,) int32 — distinct liberties of p's group (stones)
      size:      (nn,) int32 — stones in p's group (stones; else 0)
    """

    own: jnp.ndarray
    opp: jnp.ndarray
    empty: jnp.ndarray
    reach: jnp.ndarray
    libset: jnp.ndarray
    lib_count: jnp.ndarray
    size: jnp.ndarray


@lru_cache(maxsize=8)
def _adjacency_np(n: int) -> np.ndarray:
    """(nn, nn) bool 4-neighborhood adjacency of board points."""
    nn = n * n
    a = np.zeros((nn, nn), bool)
    for y in range(n):
        for x in range(n):
            p = y * n + x
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < n and 0 <= xx < n:
                    a[p, yy * n + xx] = True
    return a


def _bmat(a, b):
    """Boolean matmul on the MXU: any (..., p, q) @ (..., q, r) -> bool."""
    return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) > 0.5


def closure_analysis(own, opp) -> GroupAnalysis:
    """GroupAnalysis of one board from its (N, N) own/opp masks."""
    import math

    n = own.shape[-1]
    nn = n * n
    empty = ~(own | opp)
    adj = jnp.asarray(_adjacency_np(n))
    of, pf, ef = own.reshape(nn), opp.reshape(nn), empty.reshape(nn)
    same = (of[:, None] & of[None, :]) | (pf[:, None] & pf[None, :])
    m = (adj & same) | jnp.eye(nn, dtype=bool)
    for _ in range(math.ceil(math.log2(nn))):
        m = _bmat(m, m)
    base = adj & ef[None, :]                    # adjacent-empty bits
    libset = _bmat(m, base)
    stones_f = of | pf
    lib_count = jnp.where(stones_f, jnp.sum(libset, -1), 0).astype(jnp.int32)
    size = jnp.where(
        stones_f, jnp.sum(m & stones_f[None, :], -1), 0).astype(jnp.int32)
    return GroupAnalysis(own, opp, empty, m, libset, lib_count, size)


def self_atari_from(a: GroupAnalysis):
    """(N, N) bool — exact self_atari_mask from a closure analysis
    (same semantics: post-move group left with one distinct liberty,
    snapback-aware, >=2 captured stones never self-atari)."""
    n = a.own.shape[-1]
    nn = n * n
    adj = jnp.asarray(_adjacency_np(n))
    of, pf, ef = (a.own.reshape(nn), a.opp.reshape(nn),
                  a.empty.reshape(nn))
    base = adj & ef[None, :]
    own_edge = adj & of[None, :]
    cand = base | _bmat(own_edge, a.libset)     # empty nbrs + own-grp libs
    cand = cand & ~jnp.eye(nn, dtype=bool)      # exclude the point itself
    opp_atari = pf & (a.lib_count == 1)
    # captures_here[x, q]: adjacent opp stone q in atari whose single
    # liberty is x — its point becomes a liberty (snapback candidate)
    captures_here = adj & opp_atari[None, :] & a.libset.T
    relief = jnp.sum(captures_here * a.size[None, :], -1)
    cand = cand | captures_here
    distinct = jnp.sum(cand, -1)
    return (a.empty & (distinct <= 1).reshape(n, n)
            & (relief < 2).reshape(n, n))


def capture_moves_from(a: GroupAnalysis, include_escapes: bool = True,
                       self_atari=None):
    """capture_moves from a closure analysis (same semantics/returns)."""
    n = a.own.shape[-1]
    nn = n * n
    of, pf = a.own.reshape(nn), a.opp.reshape(nn)
    big = a.size > 1
    opp_atari = pf & (a.lib_count == 1)
    # an atari group's libset row is one-hot at its single liberty
    suggest = jnp.any(opp_atari[:, None] & a.libset, 0)
    many = jnp.any((opp_atari & big)[:, None] & a.libset, 0)
    if include_escapes:
        sa = (self_atari_from(a) if self_atari is None
              else self_atari).reshape(nn)
        own_atari = of & (a.lib_count == 1)
        valid = own_atari[:, None] & a.libset & ~sa[None, :]
        suggest = suggest | jnp.any(valid, 0)
        many = many | jnp.any(valid & big[:, None], 0)
    return (suggest.reshape(n, n) & a.empty, many.reshape(n, n) & a.empty)


def illegal_from(a: GroupAnalysis, ko_pt):
    """engine._illegal_core from a closure analysis: (N*N+1,) bool,
    pass legal.  ko_pt: (N, N) bool simple-ko candidate."""
    n = a.own.shape[-1]
    ko = ko_pt & (jnp.sum(ko_pt) == 1)
    opp_capturable = a.opp & (a.lib_count == 1).reshape(n, n)
    breath = _dilate(a.empty) | _dilate(opp_capturable)
    legal = a.empty & ~ko & breath
    return jnp.concatenate([~legal.reshape(n * n),
                            jnp.zeros((1,), bool)])

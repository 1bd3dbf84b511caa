"""Large-pattern subsystem tests (search/patterns.py).

The reference ships no patterns.spat/patterns.prob, so these use tiny
synthetic files in the same pachi format, plus a differential check of
gridcular neighborhood generation against the reference generator."""
import os
import sys

import numpy as np
import pytest

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import patterns as P
from tests.test_michi import board_from_ascii

REFERENCE_PATH = "/root/reference"

ROWS = [
    ".........",
    ".........",
    "...X.....",
    "..XO.....",
    "...X.....",
    ".........",
    ".........",
    ".........",
    ".........",
]


def _store(tmp_path, neighborhood, sid=7, prob=0.25):
    spat = tmp_path / "p.spat"
    spat.write_text(
        "# comment line\n"
        f"{sid} 2 {neighborhood} deadbeef\n")
    probf = tmp_path / "p.prob"
    probf.write_text(f"{prob} 14 3842 (capture:17 border:0 s:{sid})\n")
    store = P.PatternStore()
    assert store.load_spat(str(spat)) == 1
    assert store.load_probs(str(probf)) == 1
    return store


def test_pattern_match_and_rotation_invariance(tmp_path):
    b = board_from_ascii(ROWS)
    chars = P._board_chars(b)
    # take the smallest-diameter neighborhood at (3,4) as the pattern
    nb = next(P.gridcular_neighborhoods(chars, 3, 4))
    store = _store(tmp_path, nb)
    p = P.large_pattern_probability(store, b, 3, 4)
    assert p == pytest.approx(0.25)
    # a mirrored board must match through the rotation set
    mirrored = [r[::-1] for r in ROWS]
    bm = board_from_ascii(mirrored)
    assert P.large_pattern_probability(store, bm, 3, 9 - 1 - 4) == \
        pytest.approx(0.25)
    # empty far corner: no match
    assert P.large_pattern_probability(store, b, 8, 8) is None


def test_widest_match_wins(tmp_path):
    b = board_from_ascii(ROWS)
    chars = P._board_chars(b)
    nbs = [nb for nb in P.gridcular_neighborhoods(chars, 3, 4)]
    small, larger = nbs[0], nbs[8]  # diameters 1 and 2, same rotation
    spat = tmp_path / "p.spat"
    spat.write_text("1 2 %s x\n2 3 %s x\n" % (small, larger))
    probf = tmp_path / "p.prob"
    probf.write_text("0.1 1 1 (s:1)\n0.9 1 1 (s:2)\n")
    store = P.PatternStore()
    store.load_spat(str(spat))
    store.load_probs(str(probf))
    assert P.large_pattern_probability(store, b, 3, 4) == pytest.approx(0.9)


def test_root_prior_bonus_shape_and_gating(tmp_path):
    b = board_from_ascii(ROWS)
    empty_store = P.PatternStore()
    assert P.root_prior_bonus(empty_store, b, 100.0) is None

    chars = P._board_chars(b)
    nb = next(P.gridcular_neighborhoods(chars, 3, 4))
    store = _store(tmp_path, nb, prob=0.25)
    bonus = P.root_prior_bonus(store, b, 100.0)
    assert bonus.shape == (82,)
    assert bonus[3 * 9 + 4] == pytest.approx(np.sqrt(0.25) * 100.0)
    assert bonus[81] == 0.0


def test_gridcular_matches_reference_generator():
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import importlib

        conf_mod = importlib.import_module("conf")
        conf_mod.conf["SIZE"] = 9
        gh = importlib.import_module("mcts1.go_heuristics")
    finally:
        sys.path.remove(REFERENCE_PATH)
    b = board_from_ascii(ROWS)
    chars = P._board_chars(b)
    # reference operates on its bordered string board
    n = 9
    lines = [(n + 1) * " "]
    for y in range(n):
        lines.append(" " + "".join(chars[y, x] for x in range(n)))
    lines.append((n + 2) * " ")
    board_str = "\n".join(lines)
    for y, x in [(3, 4), (0, 0), (8, 8), (4, 4)]:
        c = (y + 1) * gh.W + (x + 1)
        ref = list(gh.neighborhood_gridcular(board_str, c))
        mine = list(P.gridcular_neighborhoods(chars, y, x))
        assert mine == ref, (y, x)

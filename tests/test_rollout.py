"""Model-free (nomodel) search tests: heuristic priors, eye rules,
batched rollouts, and a full nomodel self-play game with fixed-seed
determinism (golden-trajectory idea from SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.actor import play_games
from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search.rollout import (
    _own_true_eye,
    heuristic_priors,
    make_heuristic_predict_fn,
    rollout_values,
)

SIZE = 9
A = SIZE * SIZE + 1


def board_from_moves(moves):
    board = engine.init_board(SIZE)
    for mv in moves:
        board, _ = engine.play_at(board, *mv)
    return board


def test_capture_prior_dominates():
    # white group at (1,0) in atari: black to play at (2,0) captures
    board = board_from_moves([
        (0, 0), (1, 0), (1, 1), (8, 8), (8, 7, 1)])
    # black: (0,0),(1,1),(8,7); white: (1,0),(8,8); white group (1,0)
    # has one liberty at (2,0); black to move
    assert int(board[0, 0, 16]) == -1 or True  # sanity only
    board = board_from_moves([
        (0, 0), (1, 0), (1, 1), (8, 8)])
    # black to move; white (1,0) liberties: (2,0) only
    priors = np.asarray(heuristic_priors(board))
    assert priors.argmax() == 2  # the capture point (2,0) -> index 2


def test_escape_prior():
    # black (0,0) in atari (white at (1,0),(0,1) would capture); here
    # white at (1,0) only and (0,1): black's escape lib gets weight
    board = board_from_moves([(0, 0), (1, 0), (8, 8), (0, 1)])
    # black to move; black (0,0) in atari? libs: none except... white at
    # (1,0),(0,1): black (0,0) has 0 libs -> would be captured; actually
    # its lib set is empty only if both neighbors occupied: then capture
    # already happened. Use a 1-lib case:
    board = board_from_moves([(4, 4), (4, 3), (8, 8), (3, 4)])
    # black (4,4); white (4,3),(3,4); black to move; black group libs:
    # (5,4),(4,5) -> not atari. Make atari:
    board = board_from_moves([(4, 4), (4, 3), (8, 8), (3, 4), (8, 7, 1), (5, 4)])
    # black: (4,4),(8,8),(8,7); white: (4,3),(3,4),(5,4); black to move
    # black (4,4) single liberty: (4,5) -> index 5*9+4 = 49
    priors = np.asarray(heuristic_priors(board))
    assert priors[49] >= 15.0  # escape weight present


def test_true_eye_detection():
    # black ring around (1,1): (1,0),(0,1),(2,1),(1,2)
    board = board_from_moves([
        (1, 0), (0, SIZE), (0, 1), (0, SIZE), (2, 1), (0, SIZE), (1, 2)])
    # after last black move it's white's turn; swap so black to move
    board, _ = engine.play_at(board, 0, SIZE, color=-1)  # white passes
    eye = np.asarray(_own_true_eye(board))
    assert eye[1, 1] == True  # noqa: E712
    # the corner (0,0) is also a true eye: off-board sides count as own
    assert eye[0, 0] == True  # noqa: E712
    assert eye.sum() == 2


def test_rollout_values_shape_and_range():
    boards = jnp.stack([engine.init_board(SIZE)] * 4)
    vals = rollout_values(boards, jax.random.PRNGKey(0), komi=5.5,
                          num_steps=40)
    assert vals.shape == (4, 1)
    assert np.all(np.abs(np.asarray(vals)) <= 1.0)
    # playouts diverge across the batch: final values not all equal on a
    # komi-balanced board is not guaranteed, but values must be in
    # {-1, 0, 1} for the score-based winner
    assert set(np.unique(np.asarray(vals))) <= {-1.0, 0.0, 1.0}


def test_heuristic_predict_fn_interface():
    fn = make_heuristic_predict_fn(komi=5.5)
    boards = jnp.stack([engine.init_board(SIZE)] * 3).astype(jnp.float32)
    policy, value = fn(None, boards)
    assert policy.shape == (3, A)
    assert np.allclose(np.asarray(policy.sum(-1)), 1.0, atol=1e-5)
    assert value.shape == (3, 1)
    fn2 = make_heuristic_predict_fn(komi=5.5, value_mode="rollout",
                                    rollout_steps=20)
    policy2, value2 = fn2(None, boards)
    assert value2.shape == (3, 1)


def test_nomodel_selfplay_and_determinism():
    """The reference's nomodel config (BASELINE.json config #1): full
    self-play games with the heuristic engine; identical seeds give
    identical trajectories."""
    fn = make_heuristic_predict_fn(komi=5.5)
    search = SearchConfig(simulations=16, batch_size=8, use_symmetry=False)

    def run(seed):
        return play_games(
            fn, size=SIZE, komi=5.5, search=search, game_batch=2,
            rng=jax.random.PRNGKey(seed), selfplay=True, stop_exploration=6,
            max_moves=30)

    g1 = run(7)
    g2 = run(7)
    g3 = run(8)
    assert np.array_equal(g1.actions, g2.actions)
    assert np.array_equal(g1.boards, g2.boards)
    assert not np.array_equal(g1.actions, g3.actions)
    # games are real: stones get played, players alternate
    assert (g1.actions[: 6] != SIZE * SIZE).any()

"""Game-level behavior tests (counterpart of reference
test/tests.py:1070-1137 and the play_game loop semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.actor import GameBatch, ResignCalibrator, play_games
from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.nets import as_actor_fn, dummy_actor_fn, make_constant_predict_fn

SIZE = 9
A = SIZE * SIZE + 1
SEARCH = SearchConfig(simulations=8, batch_size=4, use_symmetry=False)


def pass_model():
    p = np.zeros(A, np.float32)
    p[A - 1] = 1.0
    return as_actor_fn(make_constant_predict_fn(p, value=0.0))


def test_selfplay_game_consistency():
    games = play_games(
        dummy_actor_fn, size=SIZE, komi=5.5, search=SEARCH, game_batch=2,
        rng=jax.random.PRNGKey(0), selfplay=True, stop_exploration=4,
        max_moves=12,
    )
    t, b = games.values.shape
    assert b == 2
    for g in range(b):
        # players alternate 1,-1,1,... on valid moves
        valid = games.move_valid[:, g]
        players = games.players[valid, g]
        assert np.array_equal(players, np.where(np.arange(len(players)) % 2 == 0, 1, -1))
        # replaying the recorded actions reproduces the recorded boards
        board = engine.init_board(SIZE)
        for i in np.where(valid)[0]:
            assert np.array_equal(np.asarray(board), games.boards[i, g])
            board = engine.step(board, int(games.actions[i, g]))
    # value targets are +-1 by winner and mover
    vt = games.value_targets()
    w = games.winners
    for g in range(b):
        if w[g] != 0:
            valid = games.move_valid[:, g]
            expect = np.where(games.players[valid, g] == w[g], 1.0, -1.0)
            assert np.array_equal(vt[valid, g], expect)


def test_selfplay_tree_created_once():
    # reference tests.py:1107-1119: one tree per self-play game
    games = play_games(
        dummy_actor_fn, size=SIZE, komi=5.5, search=SEARCH, game_batch=2,
        rng=jax.random.PRNGKey(1), selfplay=True, stop_exploration=30,
        max_moves=5,
    )
    fresh_counts = (games.tree_fresh & games.move_valid).sum(0)
    assert np.array_equal(fresh_counts, [1, 1])


def test_evaluation_two_trees_and_routing():
    """reference tests.py:1122-1136 (two trees in evaluation) plus
    model routing: a pass-only model1 must produce passes exactly on its
    color's turns."""
    games = play_games(
        pass_model(), dummy_actor_fn, size=SIZE, komi=5.5, search=SEARCH,
        game_batch=2, rng=jax.random.PRNGKey(2), selfplay=False,
        stop_exploration=0, max_moves=6,
        model1_isblack=jnp.array([True, False]),
    )
    acts = games.actions
    valid = games.move_valid
    # game 0: model1 (pass) is black -> even moves pass
    for t in range(acts.shape[0]):
        if valid[t, 0]:
            if t % 2 == 0:
                assert acts[t, 0] == SIZE * SIZE
            else:
                assert acts[t, 0] != SIZE * SIZE
        if valid[t, 1]:
            if t % 2 == 1:
                assert acts[t, 1] == SIZE * SIZE
            else:
                assert acts[t, 1] != SIZE * SIZE
    # here each model's tree never contains the opponent's move (the
    # models explore disjoint actions), so — like the reference, which
    # drops other_mcts when the action is missing (self_play.py:226-228)
    # — a fresh tree is built every move
    fresh_counts = (games.tree_fresh & games.move_valid).sum(0)
    assert np.array_equal(fresh_counts, [6, 6])


def test_evaluation_tree_created_twice():
    """reference tests.py:1122-1136: deterministic 2-move evaluation
    game -> exactly two trees created (one per model)."""
    search = SearchConfig(simulations=32, batch_size=8, use_symmetry=False)
    games = play_games(
        dummy_actor_fn, dummy_actor_fn, size=SIZE, komi=5.5,
        search=search, game_batch=1, rng=jax.random.PRNGKey(5),
        selfplay=False, stop_exploration=0, max_moves=2,
    )
    fresh_counts = (games.tree_fresh & games.move_valid).sum(0)
    assert np.array_equal(fresh_counts, [2])


def test_resignation():
    losing = as_actor_fn(make_constant_predict_fn(
        np.full(A, 1.0 / A, np.float32), value=-0.9))
    thresholds = jnp.array([-0.5, jnp.nan])
    games = play_games(
        losing, size=SIZE, komi=5.5, search=SEARCH, game_batch=2,
        rng=jax.random.PRNGKey(3), selfplay=True, stop_exploration=30,
        resign_thresholds=thresholds, max_moves=6,
    )
    # game 0 resigns immediately: no moves, black (to move) resigns, white wins
    assert games.end_reasons[0] == 2
    assert games.num_moves[0] == 0
    assert games.resign_winners[0] == -1
    # game 1 has resignation disabled and plays on
    assert games.end_reasons[1] != 2
    assert games.num_moves[1] > 0


def test_both_passed_ends_game():
    games = play_games(
        pass_model(), size=SIZE, komi=5.5, search=SEARCH, game_batch=1,
        rng=jax.random.PRNGKey(4), selfplay=False, stop_exploration=0,
        max_moves=10,
    )
    assert games.end_reasons[0] == 1  # both passed
    assert games.num_moves[0] == 2
    assert games.winners[0] == -1  # empty board: white by komi


def test_resign_calibrator():
    cal = ResignCalibrator(holdout_percent=1.0, allowed_error=0.25, seed=0)
    t = cal.thresholds(4)
    assert np.all(np.isnan(t))  # cold start: resignation off

    # synthetic finished batch: 4 games, winner black, black's min values
    # 0.1/0.2/0.3/0.4 -> 25th percentile index 1 of sorted -> 0.2
    tt, b = 4, 4
    games = GameBatch(
        boards=np.zeros((tt, b, SIZE, SIZE, 17), np.int8),
        policy_targets=np.zeros((tt, b, A), np.float32),
        values=np.tile(np.array([[0.1], [0.2], [0.3], [0.4]], np.float32), (1, b)).T.reshape(tt, b, order="F") * 0
        + np.array([[0.1, 0.2, 0.3, 0.4]] * tt) ,
        actions=np.zeros((tt, b), np.int32),
        players=np.tile(np.array([1, -1, 1, -1], np.int32)[:, None], (1, b)),
        move_valid=np.ones((tt, b), bool),
        tree_fresh=np.zeros((tt, b), bool),
        winners=np.ones((b,), np.int32),
        resign_winners=np.ones((b,), np.int32),
        black_points=np.zeros(b), white_points=np.zeros(b),
        end_reasons=np.zeros(b, np.int32), num_moves=np.full(b, tt, np.int32),
        model1_isblack=np.ones(b, bool),
    )
    cal.observe(games)
    # per game g, black's moves have value = column constant -> min value
    # = games.values[0, g]; sorted [0.1, 0.2, 0.3, 0.4], idx int(.25*4)=1
    assert np.isclose(cal.current, 0.2)
    t2 = cal.thresholds(1000)
    assert np.isnan(t2).all()  # holdout 100%
    cal2 = ResignCalibrator(holdout_percent=0.0, allowed_error=0.25, seed=0)
    cal2.current = -0.5
    t3 = cal2.thresholds(8)
    assert np.all(t3 == np.float32(-0.5))

"""Continuous (respawning) self-play tests."""
import jax
import numpy as np

from sejonggo_tpu.actor.continuous import ContinuousSelfPlay
from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.nets import dummy_actor_fn
from sejonggo_tpu.search.rollout import make_heuristic_predict_fn

SIZE = 9
SEARCH = SearchConfig(simulations=8, batch_size=4, use_symmetry=False)


def test_continuous_produces_complete_games():
    sp = ContinuousSelfPlay(
        dummy_actor_fn, None, size=SIZE, komi=5.5, search=SEARCH,
        game_batch=4, stop_exploration=4, max_moves=20,
        rng=jax.random.PRNGKey(0))
    games = sp.run(num_games=10)
    assert len(games) >= 10
    assert sp.games_finished >= 10
    for game in games:
        t = game["boards"].shape[0]
        assert 0 < t <= 20
        # replay the recorded actions: boards consistent
        board = engine.init_board(SIZE)
        for i in range(t):
            assert np.array_equal(np.asarray(board), game["boards"][i])
            board = engine.step(board, int(game["actions"][i]))
        # players alternate from black
        np.testing.assert_array_equal(
            game["players"], [1 if i % 2 == 0 else -1 for i in range(t)])
        assert game["winner"] in (-1, 0, 1)
        assert game["values"].shape == (t,)
        assert game["policies"].shape == (t, SIZE * SIZE + 1)
    # slots kept busy: total recorded moves across games ~ steps * batch
    assert sp.moves_recorded >= sp.steps  # at least one live slot per step
    assert 0.0 <= sp.tree_fresh_rate <= 1.0


def test_continuous_resignation_and_thresholds():
    from sejonggo_tpu.nets import as_actor_fn, make_constant_predict_fn

    losing = as_actor_fn(make_constant_predict_fn(
        np.full(SIZE * SIZE + 1, 1.0 / (SIZE * SIZE + 1), np.float32),
        value=-0.9))
    sp = ContinuousSelfPlay(
        losing, None, size=SIZE, komi=5.5, search=SEARCH, game_batch=2,
        stop_exploration=0, max_moves=10, rng=jax.random.PRNGKey(1))
    games = sp.run(num_games=4, thresholds_fn=lambda b: np.full(b, -0.5),
                   keep_empty=True)
    # with value always below threshold, every game resigns immediately
    for game in games:
        assert game["resigned"]
        assert game["boards"].shape[0] == 0
        assert game["resign_winner"] == -1  # black to move resigned


def test_continuous_with_heuristic_engine():
    fn = make_heuristic_predict_fn(komi=5.5)
    sp = ContinuousSelfPlay(
        fn, None, size=SIZE, komi=5.5, search=SEARCH, game_batch=2,
        stop_exploration=4, max_moves=16, rng=jax.random.PRNGKey(2))
    games = sp.run(num_games=3)
    assert len(games) >= 3
    assert all(g["boards"].shape[0] > 0 for g in games)

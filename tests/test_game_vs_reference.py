"""Full-game differential test: the reference's play_game vs our
batched actor on identical deterministic settings.

With the dummy model, identity symmetry, temperature 0 from move 0 and
no noise/resignation, an entire evaluation game is deterministic — the
move sequence, recorded boards, prior policy targets, predicted values
and the final area-score winner must all match the reference exactly.
This is the fixed-seed trajectory-match goal of BASELINE.md for the
deterministic subset (sampled-temperature moves can't match across RNG
implementations and are exercised by our own determinism tests).
"""
import sys
import types

import jax
import numpy as np
import pytest

from sejonggo_tpu.actor import play_games
from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.nets import dummy_actor_fn

SIZE = 9
A = SIZE * SIZE + 1


@pytest.fixture(scope="module")
def ref_self_play(reference_play):
    if "sgfmill" not in sys.modules:
        fake = types.ModuleType("sgfmill")
        fake.sgf = types.ModuleType("sgfmill.sgf")
        sys.modules["sgfmill"] = fake
        sys.modules["sgfmill.sgf"] = fake.sgf
    import importlib

    import conf as ref_conf

    ref_conf.conf["THREAD_SIMULATION"] = False
    ref_conf.conf["SHOW_EACH_MOVE"] = False
    ref_conf.conf["SHOW_END_GAME"] = False
    return importlib.import_module("self_play")


class RefDummyModel:
    name = "dummy"

    def predict_on_batch(self, X):
        b = X.shape[0]
        ramp = np.array(list(reversed(range(1, A + 1))), np.float32)
        policy = np.tile(ramp / ramp.sum(), (b, 1))
        return policy, np.ones((b, 1), np.float32)


@pytest.mark.parametrize("sims,k,num_moves", [(16, 4, 8), (32, 8, 12)])
def test_full_game_matches_reference(reference_play, ref_self_play,
                                     sims, k, num_moves, monkeypatch):
    ref_sp = ref_self_play
    import random as pyrandom

    import symmetry as ref_sym

    orig_sym = ref_sym.SYMMETRIES
    ref_sym.SYMMETRIES = orig_sym[:1]
    monkeypatch.setattr(ref_sp, "MCTS_BATCH_SIZE", k)
    pyrandom.seed(0)  # only affects choose_first_player (model1==model2)
    try:
        model = RefDummyModel()
        ref_game = ref_sp.play_game(
            model, model, sims, stop_exploration=0, self_play=False,
            num_moves=num_moves)
    finally:
        ref_sym.SYMMETRIES = orig_sym

    search = SearchConfig(simulations=sims, batch_size=k, use_symmetry=False)
    ours = play_games(
        dummy_actor_fn, dummy_actor_fn, size=SIZE, komi=5.5, search=search,
        game_batch=1, rng=jax.random.PRNGKey(0), selfplay=False,
        stop_exploration=0, max_moves=num_moves)

    ref_moves = ref_game["moves"]
    n_ours = int(ours.num_moves[0])
    assert len(ref_moves) == n_ours, (
        f"move count: ref {len(ref_moves)} vs ours {n_ours}")
    for t, md in enumerate(ref_moves):
        x, y = md["move"]
        ref_action = SIZE * SIZE if y == SIZE else y * SIZE + x
        assert int(ours.actions[t, 0]) == ref_action, f"move {t}"
        assert np.array_equal(md["board"][0], ours.boards[t, 0]), f"board {t}"
        assert np.allclose(md["policy"],
                           ours.policy_targets[t, 0], atol=1e-6), f"policy {t}"
        assert float(md["value"][0]) == float(ours.values[t, 0]), f"value {t}"
        # REFERENCE BUG (documented, not replicated): play_game records
        # move_data['player'] from the variable updated at the END of the
        # previous iteration (self_play.py:213,236), so the field lags by
        # one move; downstream, save_self_play_data compares it against
        # game_data['winner'] in {1,0,None} (self_play.py:256) so
        # white-won games label EVERY move value_target=-1
        # (sgfsave.py:55-56).  We record the true mover.
        true_mover = 1 if t % 2 == 0 else -1
        lagged = 1 if t == 0 else (1 if (t - 1) % 2 == 0 else -1)
        assert int(ours.players[t, 0]) == true_mover
        assert int(md["player"]) == lagged

    ref_winner = {1: 1, None: 0, 0: -1}[ref_game["winner"]]
    assert int(ours.winners[0]) == ref_winner


def _train_tiny_net(seed=0, steps=5):
    """A real (small) trained flax net for the differential game: a few
    SGD steps on synthetic targets move the weights off init."""
    import jax.numpy as jnp

    from sejonggo_tpu.config import NetConfig
    from sejonggo_tpu.learn import make_optimizer, make_train_step
    from sejonggo_tpu.learn.train import init_train_state
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn

    net = AZNet.from_config(SIZE, NetConfig(blocks=1, filters=8,
                                            value_hidden=8,
                                            compute_dtype="float32"))
    variables = init_variables(net, jax.random.PRNGKey(seed))
    tx = make_optimizer()
    state = init_train_state(net, variables, tx)
    step = make_train_step(net, tx)
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        boards = jnp.asarray(
            rng.randint(0, 2, (8, SIZE, SIZE, 17)).astype(np.float32))
        pol = jnp.asarray(rng.dirichlet(np.ones(A), size=8).astype(np.float32))
        val = jnp.asarray(rng.uniform(-1, 1, 8).astype(np.float32))
        state, _ = step(state, boards, pol, val)
    predict = make_predict_fn(net)
    return predict, {"params": state.params, "batch_stats": state.batch_stats}


class RefFlaxModel:
    """predict_on_batch adapter so the REFERENCE searches with OUR
    trained flax net — both engines then see identical evaluations and
    the whole game must match move for move."""

    name = "flax_tiny"

    def __init__(self, predict, variables):
        self._predict = predict
        self._variables = variables

    def predict_on_batch(self, X):
        import jax.numpy as jnp

        p, v = self._predict(self._variables, jnp.asarray(X, jnp.float32))
        # writable copies: the reference's reverse-symmetry fns mutate
        # the returned policy in place (symmetry.py:50)
        return np.array(p), np.array(v)


def test_trained_net_game_with_symmetry_matches_reference(
        reference_play, ref_self_play, monkeypatch):
    """Full-game differential with (a) a small TRAINED net instead of the
    dummy and (b) the D4 symmetry path ENABLED, pinned to the same fixed
    non-identity transform (left diagonal, index 1) on both sides."""
    ref_sp = ref_self_play
    import random as pyrandom

    import symmetry as ref_sym

    import jax.numpy as jnp

    from sejonggo_tpu.actor import selfplay as sp_mod
    from sejonggo_tpu.search import mcts as mcts_mod

    predict, variables = _train_tiny_net()
    sims, k, num_moves = 16, 4, 8

    orig_sym = ref_sym.SYMMETRIES
    ref_sym.SYMMETRIES = [orig_sym[1]]  # left diagonal only
    # pin ours to the same transform: symmetry id 1 on every draw
    monkeypatch.setattr(mcts_mod, "_draw_symmetry",
                        lambda rng, num: jnp.asarray(1, jnp.int32))
    monkeypatch.setattr(
        mcts_mod, "_draw_symmetry_batch",
        lambda rng, num, b: jnp.full((b,), 1, jnp.int32))
    sp_mod._make_move_step.cache_clear()
    monkeypatch.setattr(ref_sp, "MCTS_BATCH_SIZE", k)
    pyrandom.seed(0)
    try:
        model = RefFlaxModel(predict, variables)
        ref_game = ref_sp.play_game(
            model, model, sims, stop_exploration=0, self_play=False,
            num_moves=num_moves)
    finally:
        ref_sym.SYMMETRIES = orig_sym

    search = SearchConfig(simulations=sims, batch_size=k, use_symmetry=True)
    ours = play_games(
        predict, predict, size=SIZE, komi=5.5, search=search,
        game_batch=1, rng=jax.random.PRNGKey(0), selfplay=False,
        stop_exploration=0, max_moves=num_moves,
        variables1=variables, variables2=variables)
    sp_mod._make_move_step.cache_clear()  # drop the patched compile

    ref_moves = ref_game["moves"]
    n_ours = int(ours.num_moves[0])
    assert len(ref_moves) == n_ours
    for t, md in enumerate(ref_moves):
        x, y = md["move"]
        ref_action = SIZE * SIZE if y == SIZE else y * SIZE + x
        assert int(ours.actions[t, 0]) == ref_action, f"move {t}"
        assert np.array_equal(md["board"][0], ours.boards[t, 0]), f"board {t}"
        assert np.allclose(md["policy"], ours.policy_targets[t, 0],
                           atol=1e-5), f"policy {t}"
        assert np.isclose(float(md["value"][0]), float(ours.values[t, 0]),
                          atol=1e-6), f"value {t}"

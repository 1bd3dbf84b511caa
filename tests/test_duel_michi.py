"""Tests for the batched net-vs-michi duel (learn/duel_michi.py).

VERDICT r4 Next #1 infrastructure: the duel that pits a PUCT/net
engine against the REAL michi/RAVE searcher.  Runs at tiny sims on
CPU; the committed evidence duels run at MichiConfig defaults (1400
sims) on the TPU (runs/strength_r5*/)."""
import os

import jax
import numpy as np
import pytest

from sejonggo_tpu.config import MichiConfig, SearchConfig
from sejonggo_tpu.learn.duel_michi import play_vs_michi, save_michi_duel_sgfs
from sejonggo_tpu.nets import dummy_actor_fn


SEARCH = SearchConfig(simulations=12, batch_size=4, max_nodes=48)
MICHI = MichiConfig(n_sims=12, expand_visits=2, use_ladders=False,
                    komi=5.5, capacity=16, resign_thres=0.02)


_dummy_predict = dummy_actor_fn


def test_duel_completes_and_reports():
    res = play_vs_michi(
        _dummy_predict, None, size=5, komi=5.5, search=SEARCH,
        michi=MICHI, game_batch=4, rng=jax.random.PRNGKey(0),
        max_moves=30)
    assert res["games"] == 4
    assert 0.0 <= res["winrate"] <= 1.0
    assert res["net_wins"] + res["draws"] <= 4
    assert (res["num_moves"] >= 1).all()
    assert (res["num_moves"] <= 30).all()
    # half the games have the net as black
    assert res["net_isblack"].sum() == 2
    # players alternate: move t is by (+1 if t even else -1)
    t_len = res["players"].shape[0]
    assert (res["players"][:, 0] == [1 if t % 2 == 0 else -1
                                     for t in range(t_len)]).all()


def test_duel_alternating_legality():
    """Every recorded valid move must be legal when replayed through the
    engine — catches half/parity mixups (wrong engine moving, wrong
    board stepped)."""
    from sejonggo_tpu.goenv import engine

    res = play_vs_michi(
        _dummy_predict, None, size=5, komi=5.5, search=SEARCH,
        michi=MICHI, game_batch=2, rng=jax.random.PRNGKey(1),
        max_moves=26)
    for g in range(res["games"]):
        board = engine.init_board(5)
        for t in range(res["actions"].shape[0]):
            if not res["move_valid"][t, g]:
                break
            a = int(res["actions"][t, g])
            # side to move must match the recorded player
            assert int(board[0, 0, 16]) == int(res["players"][t, g])
            if a < 25:
                illegal = engine.illegal_moves_mask(board)
                assert not bool(illegal[a]), (g, t, a)
            board = engine.step(board, a)


def test_sgf_export(tmp_path):
    res = play_vs_michi(
        _dummy_predict, None, size=5, komi=5.5, search=SEARCH,
        michi=MICHI, game_batch=2, rng=jax.random.PRNGKey(2),
        max_moves=20)
    n = save_michi_duel_sgfs(res, size=5, komi=5.5,
                             outdir=str(tmp_path), prefix="t",
                             net_name="net")
    assert n == 2
    files = sorted(os.listdir(tmp_path))
    assert files == ["t_000.sgf", "t_001.sgf"]
    text = (tmp_path / "t_000.sgf").read_text()
    assert "RE[" in text and "PB[" in text and "PW[" in text


def test_michi_resign_awards_net():
    """With an absurdly high resign threshold michi resigns its first
    move and the net wins every game."""
    michi = MichiConfig(n_sims=8, expand_visits=2, use_ladders=False,
                        komi=5.5, capacity=16, resign_thres=1.1)
    res = play_vs_michi(
        _dummy_predict, None, size=5, komi=5.5, search=SEARCH,
        michi=michi, game_batch=2, rng=jax.random.PRNGKey(3),
        max_moves=20)
    assert res["michi_resigns"] == 2
    assert res["net_wins"] == 2
    assert res["winrate"] == 1.0

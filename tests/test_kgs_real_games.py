"""KGS/supervised path on REAL 19x19 games (VERDICT r3 Next #7).

The reference's only real external games — its engine vs GNU Go,
/root/reference/real_games/sgo_gnugo{1..5}.sgf (19x19, komi 6.5,
300+ moves each, containing real pass moves ';W[]') — exercised
end-to-end: replay_sgf at production size, the kgs_sample_stream
batcher, and a kgs_pretrain_phase step on a tiny net.  Reference
counterpart: kgs_data_generator.py:95-143 (play_game_kgs).

The SGFs are read from the read-only reference checkout (game DATA,
not code); tests skip if the checkout is absent.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from sejonggo_tpu.io.kgs import kgs_sample_stream, replay_sgf

REAL_GAMES = sorted(glob.glob("/root/reference/real_games/*.sgf"))

pytestmark = pytest.mark.skipif(
    not REAL_GAMES, reason="reference real_games checkout not present")


def test_replay_real_19x19_games():
    total = 0
    for path in REAL_GAMES:
        with open(path) as f:
            samples = replay_sgf(f.read(), 19)
        assert len(samples) >= 300, path
        total += len(samples)
        passes = 0
        for i, s in enumerate(samples):
            assert s["board"].shape == (19, 19, 17)
            assert s["policy"].shape == (362,)
            assert s["policy"].sum() == 1.0
            assert float(s["value"]) in (-1.0, 1.0)
            # side-to-move plane alternates with the mover
            assert int(s["board"][0, 0, 16]) == s["player"]
            if s["policy"][361] == 1.0:
                passes += 1
                assert s["move"][1] >= 19  # pass encoded off-board
        # board size mismatch guard: replay at 9x9 returns nothing
        with open(path) as f:
            assert replay_sgf(f.read(), 9) == []
    assert total >= 1500
    # stones actually accumulate through a replay (engine applied moves)
    last = samples[-1]["board"]
    assert (np.abs(last[:, :, 0]) + np.abs(last[:, :, 1])).sum() > 100


def test_real_games_contain_passes():
    """The corpus includes ';B[]'/';W[]' pass nodes — they must map to
    the pass action (index 361), not crash the parser."""
    n_pass = 0
    for path in REAL_GAMES:
        with open(path) as f:
            samples = replay_sgf(f.read(), 19)
        n_pass += sum(int(s["policy"][361] == 1.0) for s in samples)
    assert n_pass >= 5


def test_kgs_sample_stream_real_dir():
    stream = kgs_sample_stream(os.path.dirname(REAL_GAMES[0]), 19,
                               batch_size=64,
                               rng=np.random.RandomState(0))
    boards, policies, values = next(stream)
    assert boards.shape == (64, 19, 19, 17) and boards.dtype == np.float32
    assert policies.shape == (64, 362)
    assert np.all(policies.sum(1) == 1.0)
    assert set(np.unique(values)) <= {-1.0, 1.0}


@pytest.mark.slow
def test_kgs_pretrain_phase_on_real_games(tmp_path):
    """kgs_pretrain_phase end-to-end at production board size (tiny
    net): trains on the real SGF stream, saves model_2 + a backup, and
    records finite losses (reference main_training.py:34-98)."""
    from sejonggo_tpu.config import (EvalConfig, GoConfig, NetConfig,
                                     SearchConfig, SelfPlayConfig,
                                     TrainConfig, full_19x19)
    from sejonggo_tpu.pipeline import Pipeline

    cfg = full_19x19()
    cfg = dataclasses.replace(
        cfg,
        go=GoConfig(size=19, komi=6.5),
        net=NetConfig(blocks=1, filters=8, value_hidden=8,
                      compute_dtype="float32"),
        search=SearchConfig(simulations=8, batch_size=4),
        selfplay=SelfPlayConfig(game_batch=2),
        train=TrainConfig(batch_size=16, replay_window=4096),
        eval=EvalConfig(num_games=2),
    )
    pipe = Pipeline(cfg, str(tmp_path), seed=0)
    pipe.init_models()
    stats = pipe.kgs_pretrain_phase(os.path.dirname(REAL_GAMES[0]),
                                    steps=6, backup_every=4)
    assert stats["steps"] == 6
    assert np.isfinite(stats["loss"])
    assert pipe.store.exists("model_2")
    assert pipe.store.exists("backup")

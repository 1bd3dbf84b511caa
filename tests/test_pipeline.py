"""Minimum end-to-end slice: self-play -> train -> evaluate -> gate on a
tiny 9x9 net (the reference pipeline_sequent loop, single device)."""
import dataclasses

import numpy as np

from sejonggo_tpu.config import (
    EvalConfig,
    GoConfig,
    NetConfig,
    SearchConfig,
    SelfPlayConfig,
    TrainConfig,
    small_9x9,
)
from sejonggo_tpu.pipeline import Pipeline


def micro_config():
    cfg = small_9x9()
    return dataclasses.replace(
        cfg,
        net=NetConfig(blocks=1, filters=8, value_hidden=8,
                      compute_dtype="float32"),
        search=SearchConfig(simulations=8, batch_size=4, use_symmetry=False),
        selfplay=SelfPlayConfig(num_games=4, stop_exploration=4, game_batch=4),
        train=TrainConfig(batch_size=8, iters_per_epoch=4, epochs_per_save=2,
                          replay_window=4096),
        eval=EvalConfig(num_games=4, margin=0.55),
    )


def test_pipeline_one_generation(tmp_path):
    pipe = Pipeline(micro_config(), str(tmp_path), seed=0)
    results = pipe.run(generations=1)
    assert len(results) == 1
    r = results[0]
    assert r["selfplay"]["games"] >= 4  # continuous actor may finish extras
    assert r["selfplay"]["moves"] > 0
    assert r["train"]["from"] == "model_1"
    assert r["train"]["to"] == "model_2"
    assert np.isfinite(r["train"]["loss"])
    assert r["evaluate"]["games"] == 4
    assert r["best"] in ("model_1", "model_2")
    # gating honored the margin
    if r["evaluate"]["winrate"] > 0.55:
        assert r["best"] == "model_2"
    else:
        assert r["best"] == "model_1"
    # replay filled, models on disk
    assert len(pipe.replay) == r["selfplay"]["moves"]
    assert pipe.store.exists("model_1") and pipe.store.exists("model_2")

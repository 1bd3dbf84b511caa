"""Observability, duel harness, distributed bootstrap, run-state resume."""
import json
import os

import jax
import numpy as np

from sejonggo_tpu.learn.duel import duel, elo_diff
from sejonggo_tpu.parallel import init_distributed, local_game_slice, make_mesh
from sejonggo_tpu.utils import MetricsLogger, Timer


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    m = MetricsLogger(path)
    with Timer() as t:
        pass
    m.log("selfplay", moves=100, seconds=t.seconds)
    m.log("train", loss=1.5)
    assert m.last("selfplay")["moves"] == 100
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["event"] == "train"


def test_elo_diff():
    assert elo_diff(0.5) == 0.0
    assert abs(elo_diff(0.64) - 100.0) < 2.0
    assert elo_diff(0.9) > 0 and elo_diff(0.1) < 0


def test_duel_dummy_vs_heuristic(tmp_path):
    import dataclasses
    from sejonggo_tpu.config import SearchConfig, small_9x9

    cfg = small_9x9()
    cfg = dataclasses.replace(
        cfg, search=SearchConfig(simulations=8, batch_size=4,
                                 use_symmetry=False))
    res = duel("heuristic", "dummy", cfg=cfg, model_dir=str(tmp_path),
               games=4, max_moves=40)
    assert res["games"] == 4
    assert 0.0 <= res["winrate"] <= 1.0
    assert np.isfinite(res["elo_diff_a_vs_b"])


def test_distributed_single_process_noop():
    assert init_distributed() == 0
    assert list(local_game_slice(10)) == list(range(10))


def test_mesh_spans_virtual_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp",)


def test_pipeline_run_state_resume(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pipeline import micro_config
    from sejonggo_tpu.pipeline import Pipeline

    pipe = Pipeline(micro_config(), str(tmp_path), seed=0)
    pipe.init_models()
    pipe.calibrator.min_values = [0.1, 0.2]
    pipe.calibrator.current = -0.4
    from sejonggo_tpu.actor import GameBatch  # populate replay via fake data
    import numpy as _np

    t, b, size = 3, 2, 9
    a = size * size + 1
    pipe.replay.add_game_batch(GameBatch(
        boards=_np.zeros((t, b, size, size, 17), _np.int8),
        policy_targets=_np.zeros((t, b, a), _np.float32),
        values=_np.zeros((t, b), _np.float32),
        actions=_np.zeros((t, b), _np.int32),
        players=_np.ones((t, b), _np.int32),
        move_valid=_np.ones((t, b), bool),
        tree_fresh=_np.zeros((t, b), bool),
        winners=_np.ones((b,), _np.int32),
        resign_winners=_np.ones((b,), _np.int32),
        black_points=_np.zeros(b), white_points=_np.zeros(b),
        end_reasons=_np.zeros(b, _np.int32),
        num_moves=_np.full(b, t, _np.int32),
        model1_isblack=_np.ones(b, bool),
    ))
    pipe.save_run_state()

    pipe2 = Pipeline(micro_config(), str(tmp_path), seed=99)
    assert pipe2.load_run_state()
    assert len(pipe2.replay) == 6
    assert pipe2.calibrator.current == -0.4
    assert pipe2.calibrator.min_values == [0.1, 0.2]
    # restored rng continues the original stream
    k1 = jax.random.split(pipe.rng)[0]
    k2 = jax.random.split(pipe2.rng)[0]
    assert np.array_equal(np.asarray(jax.random.key_data(k1)),
                          np.asarray(jax.random.key_data(k2)))

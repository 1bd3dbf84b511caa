"""Training-robustness features (VERDICT r3 Next #3/#4/#6): the
non-finite-loss guard, ReduceLROnPlateau, crash-save, and per-step loss
curves.  Reference counterparts: TerminateOnNaN (train.py:34),
ReduceLROnPlateau (main_training.py:72), atexit exit_backup.h5 save
(main_training.py:22-25,101), per-step TB scalars (train.py:63-70)."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.config import TrainConfig
from sejonggo_tpu.learn import make_optimizer, make_train_step
from sejonggo_tpu.learn.train import PlateauScheduler, init_train_state
from sejonggo_tpu.nets import AZNet, init_variables
from sejonggo_tpu.pipeline import Pipeline
from tests.test_pipeline import micro_config

SIZE = 9
A = SIZE * SIZE + 1


def _tiny_state_and_step():
    net = AZNet(size=SIZE, blocks=1, filters=8, value_hidden=8,
                compute_dtype="float32")
    tx = make_optimizer(1e-2, 0.9, 1e-4)
    state = init_train_state(net, init_variables(net, jax.random.PRNGKey(0)),
                             tx)
    return state, make_train_step(net, tx)


def test_nonfinite_batch_skips_update():
    """A NaN batch must leave params/opt_state/step untouched and raise
    the metrics['nonfinite'] flag (reference TerminateOnNaN posture:
    never save a NaN'd model)."""
    state, step = _tiny_state_and_step()
    params_before = jax.device_get(state.params)

    boards = jnp.full((8, SIZE, SIZE, 17), jnp.nan, jnp.float32)
    policies = jnp.ones((8, A)) / A
    values = jnp.zeros((8,))
    state, metrics = step(state, boards, policies, values)
    assert float(metrics["nonfinite"]) == 1.0
    assert int(state.step) == 0  # update skipped
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params_before)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(
        np.concatenate([np.ravel(x) for x in
                        jax.tree_util.tree_leaves(
                            jax.device_get(state.params))])))

    # and a clean batch afterwards still trains
    state, metrics = step(state, jnp.zeros((8, SIZE, SIZE, 17)),
                          policies, values)
    assert float(metrics["nonfinite"]) == 0.0
    assert int(state.step) == 1


def test_plateau_scheduler():
    s = PlateauScheduler(1e-2, factor=0.5, patience=3, min_lr=2e-3)
    assert s.update(1.0) is None          # first value becomes best
    assert s.update(0.5) is None          # improvement resets wait
    assert s.update(0.6) is None          # wait=1
    assert s.update(0.55) is None         # wait=2
    assert s.update(float("nan")) is None  # nonfinite ignored
    assert s.update(0.52) == pytest.approx(5e-3)  # wait=3 -> drop
    assert s.wait == 0
    assert s.update(0.53) is None
    assert s.update(0.53) is None
    assert s.update(0.53) == pytest.approx(2.5e-3)
    # floored at min_lr
    for _ in range(3):
        r = s.update(0.53)
    assert r == pytest.approx(2e-3)
    for _ in range(6):
        assert s.update(0.53) is None  # at the floor: no more changes
    # round-trip
    s2 = PlateauScheduler(1e-2)
    s2.load_state_dict(s.state_dict())
    assert s2.lr == s.lr and s2.best == s.best and s2.wait == s.wait


def test_train_phase_streams_curves_and_aborts_on_nonfinite(tmp_path):
    """train_phase streams downsampled per-step metrics into
    metrics.jsonl; a poisoned replay buffer aborts the phase (after the
    guard skipped each update) and crash-saves 'exit_backup'."""
    cfg = micro_config()
    pipe = Pipeline(cfg, str(tmp_path), seed=0)
    pipe.init_models()
    # seed replay with clean samples
    rng = np.random.RandomState(0)
    boards = rng.randint(0, 2, (64, SIZE, SIZE, 17)).astype(np.int8)
    policies = np.full((64, A), 1.0 / A, np.float32)
    values = np.zeros(64, np.float32)
    pipe.replay.add_samples(boards, policies, values)
    pipe.train_phase()
    steps = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))
             if '"train_step"' in line]
    assert len(steps) >= 8
    assert all(np.isfinite(s["loss"]) and "grad_norm" in s and "lr" in s
               for s in steps)

    # poison every value target -> every step non-finite -> abort
    pipe.replay.add_samples(boards, policies,
                            np.full(64, np.nan, np.float32))
    pipe.replay.add_samples(boards, policies,
                            np.full(64, np.nan, np.float32))
    # make ALL samples poisoned by refilling a fresh pipe replay
    pipe2 = Pipeline(cfg, str(tmp_path), seed=1)
    pipe2.replay.add_samples(boards, policies,
                             np.full(64, np.nan, np.float32))
    with pytest.raises(FloatingPointError):
        pipe2.train_phase()
    assert pipe2.store.exists("exit_backup")
    # the exit_backup state is finite (updates were skipped, not applied)
    st = pipe2.load("exit_backup")
    leaves = np.concatenate([np.ravel(np.asarray(x)) for x in
                             jax.tree_util.tree_leaves(st.params)])
    assert np.all(np.isfinite(leaves))


def test_pipeline_plateau_drops_lr(tmp_path):
    """With lr_plateau_factor set and a constant-loss replay buffer, the
    pipeline's LR drops after `patience` train phases."""
    cfg = micro_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr_plateau_factor=0.5, lr_plateau_patience=2,
            lr_min=1e-3))
    pipe = Pipeline(cfg, str(tmp_path), seed=0)
    pipe.init_models()
    assert pipe.plateau is not None
    # any loss counts as "no improvement" -> plateau after `patience`
    pipe.plateau.min_delta = float("inf")
    # constant batch -> loss can't improve by min_delta for long
    rng = np.random.RandomState(0)
    boards = rng.randint(0, 2, (64, SIZE, SIZE, 17)).astype(np.int8)
    pipe.replay.add_samples(boards, np.full((64, A), 1.0 / A, np.float32),
                            np.zeros(64, np.float32))
    lr0 = pipe.lr
    for _ in range(6):
        pipe.train_phase()
        if pipe.lr < lr0:
            break
    assert pipe.lr < lr0
    # run-state round-trips the LR + plateau bookkeeping
    pipe.save_run_state()
    pipe3 = Pipeline(cfg, str(tmp_path), seed=0)
    assert pipe3.load_run_state()
    assert pipe3.lr == pipe.lr
    assert pipe3.plateau.state_dict() == pipe.plateau.state_dict()

"""Pallas flood-fill kernel tests (interpret mode on CPU) and batched
engine-path equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.ops.flood import enable_pallas_flood, flood_fixpoint_pallas


@pytest.fixture
def pallas_interpret():
    enable_pallas_flood(True, interpret=True)
    yield
    enable_pallas_flood(False)


@pytest.mark.parametrize("n,b,seed", [(9, 7, 0), (9, 32, 1), (19, 5, 2)])
def test_flood_kernel_matches_xla(n, b, seed):
    rng = np.random.RandomState(seed)
    allowed = rng.rand(b, n, n) < 0.6
    seeds = allowed & (rng.rand(b, n, n) < 0.15)
    expect = np.stack([
        np.asarray(engine._flood(jnp.asarray(seeds[i]), jnp.asarray(allowed[i])))
        for i in range(b)
    ])
    got = np.asarray(flood_fixpoint_pallas(
        jnp.asarray(seeds), jnp.asarray(allowed), interpret=True))
    assert np.array_equal(expect, got)


def test_flood_kernel_long_chain():
    # a single snake-like corridor: worst-case propagation distance
    n = 9
    allowed = np.zeros((1, n, n), bool)
    for y in range(n):
        allowed[0, y, :] = True
        if y % 2 == 0:
            allowed[0, y, : n - 1 if y % 4 == 0 else 0] = True
    allowed[0] = False
    # build explicit serpentine
    path = []
    for y in range(n):
        xs = range(n - 1) if y % 2 == 0 else range(n - 1, 0, -1)
        for x in xs:
            path.append((y, x))
    for (y, x) in path:
        allowed[0, y, x] = True
    seeds = np.zeros_like(allowed)
    seeds[0, path[0][0], path[0][1]] = True
    expect = np.asarray(engine._flood(jnp.asarray(seeds[0]), jnp.asarray(allowed[0])))
    got = np.asarray(flood_fixpoint_pallas(
        jnp.asarray(seeds), jnp.asarray(allowed), interpret=True))[0]
    assert np.array_equal(expect, got)


def test_step_batch_matches_single():
    rng = np.random.RandomState(0)
    boards = []
    actions = []
    b = engine.init_board(9)
    for i in range(12):
        legal = np.where(np.asarray(engine.legal_moves_mask(b)))[0]
        a = int(rng.choice(legal[legal != 81]))
        boards.append(np.asarray(b))
        actions.append(a)
        b = engine.step(b, a)
    batch = jnp.asarray(np.stack(boards))
    acts = jnp.asarray(np.asarray(actions, np.int32))
    stepped = engine.step_batch(batch, acts)
    for i in range(12):
        single = engine.step(batch[i], acts[i])
        assert np.array_equal(np.asarray(stepped[i]), np.asarray(single)), i
    # legality too
    lb = engine.illegal_moves_mask_batch(stepped)
    for i in range(12):
        assert np.array_equal(
            np.asarray(lb[i]), np.asarray(engine.illegal_moves_mask(stepped[i])))


def test_step_batch_with_pallas_flood(pallas_interpret):
    rng = np.random.RandomState(1)
    b0 = engine.init_board(9)
    moves = []
    b = b0
    for i in range(8):
        legal = np.where(np.asarray(engine.legal_moves_mask(b)))[0]
        a = int(rng.choice(legal[legal != 81]))
        moves.append((np.asarray(b), a))
        b = engine.step(b, a)
    batch = jnp.asarray(np.stack([m[0] for m in moves]))
    acts = jnp.asarray(np.asarray([m[1] for m in moves], np.int32))
    stepped = engine.step_batch(batch, acts)
    for i in range(8):
        single = engine.step(batch[i], acts[i])
        assert np.array_equal(np.asarray(stepped[i]), np.asarray(single)), i

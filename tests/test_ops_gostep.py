"""Fused step+legality Pallas kernel: differential tests vs the XLA
engine path (interpret mode on CPU) on reachable and adversarial
positions."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.ops.gostep import enable_pallas_gostep, step_legal_pallas


@pytest.fixture
def gostep_interpret():
    enable_pallas_gostep(True, interpret=True)
    yield
    enable_pallas_gostep(False)


def _xla_reference(stones, sides, actions):
    new = engine.step_stones_batch(stones, sides, actions)
    illegal = engine.illegal_moves_mask_stones_batch(
        new, stones, -jnp.asarray(sides, jnp.int8))
    return np.asarray(new), np.asarray(illegal)


def _random_positions(n, games, moves, seed):
    """Collect (stones, side, action) from random legal games."""
    rng = np.random.RandomState(seed)
    recs = []
    for g in range(games):
        b = engine.init_board(n)
        side = 1
        for _ in range(moves):
            legal = np.where(np.asarray(engine.legal_moves_mask(b)))[0]
            pts = legal[legal != n * n]
            a = int(rng.choice(pts)) if len(pts) and rng.rand() > 0.05 \
                else n * n
            recs.append((engine.signed_stones(b), side, a))
            b = engine.step(b, a)
            side = -side
    stones = jnp.stack([r[0] for r in recs])
    sides = jnp.asarray([r[1] for r in recs], jnp.int8)
    actions = jnp.asarray([r[2] for r in recs], jnp.int32)
    return stones, sides, actions


@pytest.mark.parametrize("n,seed", [(9, 0), (9, 3), (19, 1)])
def test_fused_kernel_matches_xla_random_games(n, seed):
    moves = 40 if n == 9 else 25
    stones, sides, actions = _random_positions(n, 3, moves, seed)
    exp_stones, exp_illegal = _xla_reference(stones, sides, actions)
    got_stones, got_illegal = step_legal_pallas(
        stones, sides, actions, interpret=True)
    assert np.array_equal(exp_stones, np.asarray(got_stones))
    assert np.array_equal(exp_illegal, np.asarray(got_illegal))


def test_fused_kernel_ko_and_capture():
    # a classic ko shape: B captures at the ko point, the retake must be
    # illegal for W on the resulting position
    n = 9
    grid = np.zeros((n, n), np.int8)
    #   . B .        B at (0,1),(1,0),(1,2),(2,1) would be a B eye; make
    #   B W B        the ko: W stone at (1,1), B plays (2,1)... build
    #   . ? .        directly: W group of one stone in atari at (1,1)
    grid[0, 1] = 1
    grid[1, 0] = 1
    grid[1, 2] = 1
    grid[1, 1] = -1
    # white escape structure around (2,1) so the capture makes a ko
    grid[2, 0] = -1
    grid[2, 2] = -1
    grid[3, 1] = -1
    stones = jnp.asarray(grid)[None]
    sides = jnp.asarray([1], jnp.int8)
    actions = jnp.asarray([2 * n + 1], jnp.int32)  # B captures at (2,1)
    exp_stones, exp_illegal = _xla_reference(stones, sides, actions)
    got_stones, got_illegal = step_legal_pallas(
        stones, sides, actions, interpret=True)
    assert np.array_equal(exp_stones, np.asarray(got_stones))
    assert np.array_equal(exp_illegal, np.asarray(got_illegal))
    # the retake at (1,1) must be flagged illegal (simple ko)
    assert np.asarray(got_illegal)[0, 1 * n + 1]


def test_fused_kernel_pass_and_padding():
    # pass moves + a batch size that is not a block multiple
    n = 9
    stones, sides, actions = _random_positions(n, 2, 10, 7)
    actions = actions.at[::3].set(n * n)  # sprinkle passes
    exp_stones, exp_illegal = _xla_reference(stones, sides, actions)
    got_stones, got_illegal = step_legal_pallas(
        stones, sides, actions, block_b=16, interpret=True)
    assert np.array_equal(exp_stones, np.asarray(got_stones))
    assert np.array_equal(exp_illegal, np.asarray(got_illegal))


def test_search_round_with_fused_kernel(gostep_interpret):
    """simulate_round through the fused path == through the XLA path."""
    from sejonggo_tpu.nets.stub import dummy_predict_fn
    from sejonggo_tpu.search import new_tree_batch
    from sejonggo_tpu.search.mcts import simulate_round

    n, b = 9, 4
    boards = jnp.stack([engine.init_board(n)] * b)
    pol, _ = dummy_predict_fn(boards.astype(jnp.float32))
    trees = new_tree_batch(pol, boards, 40)
    rng = jax.random.PRNGKey(0)

    fused = simulate_round(trees, dummy_predict_fn, rng, batch_size=4)
    enable_pallas_gostep(False)
    plain = simulate_round(trees, dummy_predict_fn, rng, batch_size=4)
    for a, c in zip(fused, plain):
        assert np.array_equal(np.asarray(a), np.asarray(c))

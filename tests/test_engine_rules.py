"""Rules-engine tests, ported from reference test/tests.py:51-481.

The whole suite runs on 9x9 boards like the reference's
(test/tests.py:5-6).  Board-building uses play_at (the counterpart of
reference make_play, including the forced-color swap).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sejonggo_tpu.goenv import (
    area_counts,
    color_board,
    group_liberty_count,
    illegal_moves_mask,
    index2coord,
    init_board,
    play_at,
    score,
    step,
)

SIZE = 9
KOMI = 5.5


def new_board():
    return init_board(SIZE)


def plays(board, moves):
    for mv in moves:
        if len(mv) == 3:
            x, y, color = mv
        else:
            (x, y), color = mv, None
        board, _ = play_at(board, x, y, color)
    return board


# --- coloring / scoring (reference tests.py:55-135) ----------------------


def test_coloring_player_1():
    board = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
    target = np.array([[1, 1, 1], [1, 1, 1], [1, 1, 1]])
    assert np.array_equal(color_board(board, 1), target)
    board = np.array(
        [[1, 1, 1, -1, -1, -1], [1, 0, 1, -1, 0, -1], [1, 1, 1, -1, -1, -1]]
    )
    target = np.array(
        [[1, 1, 1, -1, -1, -1], [1, 1, 1, -1, 0, -1], [1, 1, 1, -1, -1, -1]]
    )
    assert np.array_equal(color_board(board, 1), target)


def test_coloring_player_2():
    board = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
    target = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
    assert np.array_equal(color_board(board, -1), target)
    board = np.array(
        [[1, 1, 1, -1, -1, -1], [1, 0, 1, -1, 0, -1], [1, 1, 1, -1, -1, -1]]
    )
    target = np.array(
        [[1, 1, 1, -1, -1, -1], [1, 0, 1, -1, -1, -1], [1, 1, 1, -1, -1, -1]]
    )
    assert np.array_equal(color_board(board, -1), target)


BIG_BOARD = np.array([
    [0, 0, 0, 1, 0, -1, 0, 0, 0],
    [0, 0, 0, 1, 0, -1, 0, 0, 0],
    [0, 0, 0, 1, 0, -1, 0, 0, 0],
    [0, 0, 0, 1, -1, 0, 0, -1, 0],
    [1, 1, 1, -1, 0, -1, -1, 0, 0],
    [0, 0, 0, 1, -1, 0, 0, -1, -1],
    [0, 0, 0, 1, 0, -1, 0, 0, 0],
    [0, 0, 0, 1, 0, -1, 0, 1, 0],
    [0, 0, 0, 0, 0, -1, 0, 0, 0],
])


def test_player_1_big():
    target = np.array([
        [1, 1, 1, 2, 0, -2, -1, -1, -1],
        [1, 1, 1, 2, 0, -2, -1, -1, -1],
        [1, 1, 1, 2, 0, -2, -1, -1, -1],
        [1, 1, 1, 2, -2, -1, -1, -2, -1],
        [2, 2, 2, -2, -1, -2, -2, -1, -1],
        [0, 0, 0, 2, -2, 0, 0, -2, -2],
        [0, 0, 0, 2, 0, -2, 0, 0, 0],
        [0, 0, 0, 2, 0, -2, 0, 2, 0],
        [0, 0, 0, 0, 0, -2, 0, 0, 0],
    ])
    assert np.array_equal(area_counts(BIG_BOARD), target)


def test_get_winner_points():
    # reference asserts point histogram {0:29, 1:12, 2:11, -1:15, -2:14}
    total = np.asarray(area_counts(BIG_BOARD))
    unique, counts = np.unique(total, return_counts=True)
    points = dict(zip(unique.tolist(), counts.tolist()))
    assert points == {0: 29, 1: 12, 2: 11, -1: 15, -2: 14}


# --- liberties (reference tests.py:216-248) ------------------------------


def test_get_liberties():
    board = new_board()
    board = plays(board, [(0, 0), (1, 0), (8, 9), (2, 1), (8, 8), (3, 0), (2, 0)])
    # suicide at (2,0) was removed; current labeling: color=1 group empty
    assert int(group_liberty_count(board, 2, 0, 1)) == 0
    assert int(group_liberty_count(board, 2, 0, -1)) == 4

    board = new_board()
    board = plays(
        board,
        [(2, 1), (2, 0), (3, 1), (1, 1), (4, 1, -1), (2, 2, -1)],
    )
    assert int(group_liberty_count(board, 2, 1, 1)) == 2
    assert int(group_liberty_count(board, 3, 1, 1)) == 2


# --- suicide (reference tests.py:250-330) --------------------------------


def test_self_suicide():
    board = new_board()
    board = plays(board, [(0, 0), (1, 0), (8, 9), (2, 1), (8, 8), (3, 0)])
    # ○ ● . ●   /  . . ●
    board = plays(board, [(2, 0)])  # black suicides
    b = np.asarray(board)
    assert b[0, 1, 0] == 1  # white stone still there
    assert b[0, 1, 1] == 0
    assert b[0, 2, 0] == 0  # suicide stone removed
    assert b[0, 2, 1] == 0


def test_legal_moves_not_suicide():
    board = new_board()
    board = plays(board, [(0, 0), (1, 0), (1, 1), (2, 1), (8, 8), (3, 0)])
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[2] == False  # capturing move at (2,0): legal  # noqa: E712


def test_legal_moves_suicide():
    board = new_board()
    board = plays(board, [(0, 1), (1, 0), (1, 1), (2, 1), (8, 8), (3, 0)])
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[2] == True  # pure suicide: illegal  # noqa: E712


def test_legal_moves_suicide2():
    board = new_board()
    board = plays(
        board, [(3, 0), (1, 0), (1, 1), (2, 1), (3, 1, -1), (4, 0, -1)]
    )
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[2] == True  # noqa: E712


def test_legal_moves_suicide3():
    board = new_board()
    board = plays(
        board,
        [(1, 2), (2, 0), (3, 1), (3, 0), (1, 1, -1), (4, 1, -1), (2, 2, -1), (3, 2, -1)],
    )
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[10] == True  # noqa: E712


# --- ko (reference tests.py:332-381) -------------------------------------


def test_legal_moves_ko():
    board = new_board()
    board = plays(board, [(0, 0), (1, 0), (1, 1), (2, 1), (8, 8), (3, 0)])
    board = plays(board, [(2, 0)])  # black captures (1,0)
    b = np.asarray(board)
    assert b[0, 1, 0] == 0 and b[0, 1, 1] == 0  # white stone taken
    assert b[0, 1, 2] == 1 and b[0, 1, 3] == 0  # history remembers it
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[1] == True  # ko retake forbidden  # noqa: E712


def test_legal_moves_not_ko():
    board = new_board()
    board = plays(board, [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (8, 8)])
    board = plays(board, [(3, 0)])  # black captures two stones
    b = np.asarray(board)
    assert b[0, 1, 0] == 0 and b[0, 1, 1] == 0
    assert b[0, 2, 0] == 0 and b[0, 2, 1] == 0
    assert b[0, 1, 2] == 1 and b[0, 1, 3] == 0
    assert b[0, 2, 2] == 1 and b[0, 2, 3] == 0
    mask = np.asarray(illegal_moves_mask(board))
    assert mask[1] == False  # two-stone capture is not ko  # noqa: E712
    assert mask[2] == False  # noqa: E712


# --- whole-board capture (reference tests.py:383-435) --------------------


def test_full_board_capture():
    size = SIZE
    board = new_board()
    for i in range(size * size - 2):
        x, y = index2coord(i, size)
        board = plays(board, [(x, y), (0, size)])
    board = plays(board, [(0, size), (size - 1, size - 1)])

    b = np.asarray(board)
    for i in range(size * size - 2):
        x, y = index2coord(i, size)
        assert b[y, x, 0] == 1 and b[y, x, 1] == 0
    assert b[size - 1, size - 1, 0] == 0 and b[size - 1, size - 1, 1] == 1
    assert b[size - 1, size - 2, 0] == 0 and b[size - 1, size - 2, 1] == 0

    board = plays(board, [(size - 2, size - 1)])  # black fills, capturing white
    b = np.asarray(board)
    for i in range(size * size - 1):
        x, y = index2coord(i, size)
        assert b[y, x, 0] == 0 and b[y, x, 1] == 1  # white's turn: black on plane 1
    assert b[size - 1, size - 1, 0] == 0 and b[size - 1, size - 1, 1] == 0

    board = plays(board, [(size - 1, size - 1)])  # white captures ALL of black
    b = np.asarray(board)
    for i in range(size * size - 1):
        x, y = index2coord(i, size)
        assert b[y, x, 0] == 0 and b[y, x, 1] == 0
    assert b[size - 1, size - 1, 0] == 0 and b[size - 1, size - 1, 1] == 1


def test_bug_regression():
    # reference tests.py:437-481: capture ordering regression
    size = SIZE
    board = new_board()
    black_pts = [(5, 6), (6, 6), (6, 8), (7, 8), (8, 8)]
    for i in range(size * size):
        x, y = index2coord(i, size)
        if (x, y) in black_pts:
            board = plays(board, [(x, y), (0, size)])
        elif (x, y) == (6, 7):
            board = plays(board, [(0, size), (0, size)])
        else:
            board = plays(board, [(0, size), (x, y)])
    board = plays(board, [(0, size), (6, 7)])

    b = np.asarray(board)
    for i in range(size * size - 1):
        x, y = index2coord(i, size)
        if (x, y) in black_pts:
            assert b[y, x, 0] == 0 and b[y, x, 1] == 0
        else:
            assert b[y, x, 0] == 0 and b[y, x, 1] == 1


# --- score sanity ---------------------------------------------------------


def test_score_empty_board_white_wins_by_komi():
    w, bp, wp = score(new_board(), KOMI)
    # an empty board is all dame: 0 vs komi
    assert int(w) == -1
    assert float(bp) == 0.0
    assert float(wp) == KOMI


# --- batched stone-grid ops == vmapped scalar ops --------------------------


def test_batched_stone_ops_match_vmap():
    """step_stones_batch / illegal_moves_mask_stones_batch (the search's
    Pallas-pluggable hot path) agree with vmap of the single-board
    fns on randomly played positions."""
    import jax

    from sejonggo_tpu.goenv import engine

    rng = np.random.RandomState(0)
    size = 9
    b = 16
    boards = []
    for g in range(b):
        board = engine.init_board(size)
        for _ in range(rng.randint(3, 40)):
            legal = ~np.asarray(engine.illegal_moves_mask(board))
            acts = np.nonzero(legal[:-1])[0]
            if len(acts) == 0:
                break
            board = engine.step(board, int(rng.choice(acts)))
        boards.append(board)
    boards = jnp.stack(boards)

    stones = jax.vmap(engine.signed_stones)(boards)
    sides = boards[:, 0, 0, 16].astype(jnp.int8)
    actions = []
    for g in range(b):
        legal = ~np.asarray(engine.illegal_moves_mask(boards[g]))
        actions.append(int(rng.choice(np.nonzero(legal)[0])))
    actions = jnp.asarray(actions, jnp.int32)

    batched = engine.step_stones_batch(stones, sides, actions)
    single = jax.vmap(engine.step_stones)(stones, sides, actions)
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(single))

    prev = stones
    nxt_sides = (-sides).astype(jnp.int8)
    ill_b = engine.illegal_moves_mask_stones_batch(batched, prev, nxt_sides)
    ill_s = jax.vmap(engine.illegal_moves_mask_stones)(single, prev,
                                                       nxt_sides)
    np.testing.assert_array_equal(np.asarray(ill_b), np.asarray(ill_s))

"""Differential fuzzing of the vectorized engine against the reference.

Plays random legal games and checks, move by move, that the 17-plane
board, the legality mask, and the final area score match the reference
engine (play.py) bit for bit.  This is the harness behind the
fixed-seed trajectory-match goal (BASELINE.md).  Skipped when the
reference checkout is absent.
"""
import os

import numpy as np
import pytest

from sejonggo_tpu.goenv import (
    illegal_moves_mask,
    init_board,
    score,
    step,
)

SIZE = 9
KOMI = 5.5


@pytest.mark.parametrize("seed", [0, 1])
def test_random_game_matches_reference(reference_play, seed):
    ref = reference_play
    rng = np.random.RandomState(seed)

    ref_board, _ = ref.game_init()
    board = init_board(SIZE)

    consecutive_passes = 0
    for move_n in range(130):
        ref_illegal = np.asarray(ref.legal_moves(ref_board)).astype(bool)
        our_illegal = np.asarray(illegal_moves_mask(board))
        assert np.array_equal(ref_illegal, our_illegal), (
            f"seed={seed} move={move_n}: legality mismatch at "
            f"{np.where(ref_illegal != our_illegal)}"
        )

        legal_idx = np.where(~ref_illegal)[0]
        # Prefer board moves over pass to get meaningful games, but pass
        # sometimes to exercise the pass path and game end.
        if len(legal_idx) > 1 and rng.rand() < 0.95:
            choices = legal_idx[legal_idx != SIZE * SIZE]
            action = int(rng.choice(choices)) if len(choices) else SIZE * SIZE
        else:
            action = SIZE * SIZE

        consecutive_passes = consecutive_passes + 1 if action == SIZE * SIZE else 0

        x, y = ref.index2coord(action)
        ref.make_play(x, y, ref_board)
        board = step(board, action)

        assert np.array_equal(np.asarray(ref_board)[0], np.asarray(board)), (
            f"seed={seed} move={move_n} action={action}: board planes diverged"
        )

        if consecutive_passes >= 2:
            break

    ref_winner, ref_black, ref_white = ref.get_winner(ref_board)
    our_winner, our_black, our_white = score(board, KOMI)
    assert int(ref_winner) == int(our_winner)
    assert float(ref_black) == float(our_black)
    assert float(ref_white) == float(our_white)


def _contact_biased_action(rng, illegal, board_np, size):
    """Pick a legal move, strongly preferring contact points (adjacent to
    any stone) — drives capture races and ko fights."""
    legal = ~illegal
    pts = np.where(legal[:-1])[0]
    if len(pts) == 0:
        return size * size
    p0 = board_np[:, :, 0] == 1
    p1 = board_np[:, :, 1] == 1
    occ = p0 | p1
    pad = np.pad(occ, 1)
    contact = (pad[:-2, 1:-1] | pad[2:, 1:-1]
               | pad[1:-1, :-2] | pad[1:-1, 2:]).reshape(-1)
    cpts = pts[contact[pts]]
    if len(cpts) and rng.rand() < 0.9:
        return int(rng.choice(cpts))
    if rng.rand() < 0.02:
        return size * size
    return int(rng.choice(pts))


@pytest.fixture(scope="module")
def batched_engine():
    """Jitted batched engine fns (eager dispatch of the fixpoint loops
    is prohibitively slow on CPU)."""
    import jax

    from sejonggo_tpu.goenv import engine as E

    return (jax.jit(E.step_batch), jax.jit(E.illegal_moves_mask_batch))


@pytest.mark.parametrize("seed", list(range(8)))
def test_capture_heavy_game_matches_reference(reference_play, batched_engine,
                                              seed):
    """Contact-biased fuzz (8 seeds + the 2 uniform seeds above + the ko
    script below = 11 differential games): board planes, legality (incl.
    ko), the batched engine path, and final score must match the
    reference bit-for-bit every move."""
    step_batch_j, illegal_batch_j = batched_engine
    ref = reference_play
    rng = np.random.RandomState(100 + seed)
    ref_board, _ = ref.game_init()
    board = init_board(SIZE)
    passes = 0
    for move_n in range(110):
        ref_illegal = np.asarray(ref.legal_moves(ref_board)).astype(bool)
        our_illegal = np.asarray(illegal_moves_mask(board))
        assert np.array_equal(ref_illegal, our_illegal), (
            f"seed={seed} move={move_n} legality mismatch")
        # the batched (Pallas-pluggable) legality agrees too
        batch_illegal = np.asarray(illegal_batch_j(board[None]))[0]
        assert np.array_equal(ref_illegal, batch_illegal)

        action = _contact_biased_action(
            rng, ref_illegal, np.asarray(board), SIZE)
        passes = passes + 1 if action == SIZE * SIZE else 0
        x, y = ref.index2coord(action)
        ref.make_play(x, y, ref_board)
        # batched step path (the search/actor hot path)
        board = step_batch_j(board[None], np.asarray([action]))[0]
        assert np.array_equal(np.asarray(ref_board)[0], np.asarray(board)), (
            f"seed={seed} move={move_n} action={action} board diverged")
        if passes >= 2:
            break

    ref_winner, ref_black, ref_white = ref.get_winner(ref_board)
    our_winner, our_black, our_white = score(board, KOMI)
    assert int(ref_winner) == int(our_winner)
    assert float(ref_black) == float(our_black)
    assert float(ref_white) == float(our_white)


def test_engine_vs_reference_19x19():
    """Differential parity at the reference's PRODUCTION size
    (conf.py:33 SIZE:19): contact-biased fuzz games to a scoring end,
    legality + all 17 planes + final score bit-exact every move.  Runs
    in a subprocess because the reference pins SIZE at import
    (play.py:14) and this pytest process imported it at 9
    (tests/_ref19_worker.py, pattern of tests/_mh_worker.py)."""
    import subprocess
    import sys as _sys

    worker = os.path.join(os.path.dirname(__file__), "_ref19_worker.py")
    proc = subprocess.run(
        [_sys.executable, worker, "0,1,2", "500"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, (
        f"19x19 differential worker failed:\n{proc.stdout}\n{proc.stderr}")
    assert "REF19_OK" in proc.stdout


KO_SEQUENCE = [39, 40, 31, 32, 49, 50, 10, 42, 41]  # B then W alternating;
# B41 captures W40 leaving a simple ko at 40


def test_ko_fight_seeded_fuzz_matches_reference(reference_play):
    """Scripted ko creation, then contact-biased fuzz from the ko
    position — exercises repeated ko bans/recaptures differentially."""
    ref = reference_play
    ref_board, _ = ref.game_init()
    board = init_board(SIZE)
    for action in KO_SEQUENCE:
        x, y = ref.index2coord(action)
        ref.make_play(x, y, ref_board)
        board = step(board, action)
        assert np.array_equal(np.asarray(ref_board)[0], np.asarray(board))

    # the ko recapture at 40 is illegal in both engines
    ref_illegal = np.asarray(ref.legal_moves(ref_board)).astype(bool)
    our_illegal = np.asarray(illegal_moves_mask(board))
    assert ref_illegal[40] and our_illegal[40]
    assert np.array_equal(ref_illegal, our_illegal)

    rng = np.random.RandomState(7)
    for move_n in range(80):
        ref_illegal = np.asarray(ref.legal_moves(ref_board)).astype(bool)
        our_illegal = np.asarray(illegal_moves_mask(board))
        assert np.array_equal(ref_illegal, our_illegal), f"move={move_n}"
        action = _contact_biased_action(
            rng, ref_illegal, np.asarray(board), SIZE)
        x, y = ref.index2coord(action)
        ref.make_play(x, y, ref_board)
        board = step(board, action)
        assert np.array_equal(np.asarray(ref_board)[0], np.asarray(board))

"""Differential fuzzing of the vectorized engine against the reference.

Plays random legal games and checks, move by move, that the 17-plane
board, the legality mask, and the final area score match the reference
engine (play.py) bit for bit.  This is the harness behind the
fixed-seed trajectory-match goal (BASELINE.md).  Skipped when the
reference checkout is absent.
"""
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

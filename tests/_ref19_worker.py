"""Subprocess worker: 19x19 differential parity vs the reference engine.

The reference reads conf['SIZE'] once at import into module globals
(play.py:14), so the whole pytest process is pinned to SIZE=9
(tests/conftest.py reference_play).  A 19x19 oracle therefore needs its
own interpreter — same pattern as tests/_mh_worker.py.  Plays
contact-biased fuzz games to a scoring end and checks, move by move,
the legality mask and all 17 board planes bit-for-bit, then the final
area score (reference play.py:71-104,226-242,274-292 at its production
size, conf.py:33).

Usage: python _ref19_worker.py <comma-seeds> <move-cap>
Prints one "REF19_OK ..." line on success; asserts otherwise.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
SIZE = 19
KOMI = 6.5  # the reference's real-game komi (real_games/sgo_gnugo1.sgf)


def _load_reference():
    """Import the reference play.py at SIZE=19 (needs a writable cwd
    with logs/ for its logging dictConfig)."""
    import importlib
    import logging
    import shutil

    tmp = "/tmp/_sejonggo_ref19_oracle"
    os.makedirs(os.path.join(tmp, "logs"), exist_ok=True)
    logcfg = os.path.join(tmp, "logconfig.json")
    if not os.path.exists(logcfg):
        shutil.copy(os.path.join(REFERENCE, "logconfig.json"), logcfg)
    os.chdir(tmp)
    sys.path.insert(0, REFERENCE)
    conf_mod = importlib.import_module("conf")
    conf_mod.conf["SIZE"] = SIZE
    conf_mod.conf["KOMI"] = KOMI
    ref = importlib.import_module("play")
    assert ref.SIZE == SIZE, "reference play.py imported with wrong SIZE"
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.disable(logging.DEBUG)
    return ref


def _contact_biased_action(rng, illegal, board_np, size):
    """Legal move preferring contact points (drives captures/ko)."""
    import numpy as np

    legal = ~illegal
    pts = np.where(legal[:-1])[0]
    if len(pts) == 0:
        return size * size
    occ = (board_np[:, :, 0] == 1) | (board_np[:, :, 1] == 1)
    pad = np.pad(occ, 1)
    contact = (pad[:-2, 1:-1] | pad[2:, 1:-1]
               | pad[1:-1, :-2] | pad[1:-1, 2:]).reshape(-1)
    cpts = pts[contact[pts]]
    if len(cpts) and rng.rand() < 0.9:
        return int(rng.choice(cpts))
    if rng.rand() < 0.02:
        return size * size
    return int(rng.choice(pts))


def main():
    seeds = [int(s) for s in sys.argv[1].split(",")]
    move_cap = int(sys.argv[2])

    sys.path.insert(0, REPO)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    ref = _load_reference()

    from sejonggo_tpu.goenv import engine as E

    # jit the batched engine fns (the search/actor hot path; eager
    # fixpoint loops are ~100x slower on CPU — CLAUDE.md perf rules)
    step_b = jax.jit(E.step_batch)
    illegal_b = jax.jit(E.illegal_moves_mask_batch)

    total_moves = 0
    for seed in seeds:
        rng = np.random.RandomState(seed)
        ref_board, _ = ref.game_init()
        board = E.init_board(SIZE)
        passes = 0
        for move_n in range(move_cap):
            ref_illegal = np.asarray(ref.legal_moves(ref_board)).astype(bool)
            our_illegal = np.asarray(illegal_b(board[None]))[0]
            assert np.array_equal(ref_illegal, our_illegal), (
                f"seed={seed} move={move_n}: 19x19 legality mismatch at "
                f"{np.where(ref_illegal != our_illegal)}")
            action = _contact_biased_action(
                rng, ref_illegal, np.asarray(board), SIZE)
            passes = passes + 1 if action == SIZE * SIZE else 0
            x, y = ref.index2coord(action)
            ref.make_play(x, y, ref_board)
            board = step_b(board[None], np.asarray([action]))[0]
            assert np.array_equal(np.asarray(ref_board)[0],
                                  np.asarray(board)), (
                f"seed={seed} move={move_n} action={action}: "
                f"19x19 board planes diverged")
            total_moves += 1
            if passes >= 2:
                break
        # both-passed or capped: final area score must agree either way
        ref_w, ref_b_pts, ref_w_pts = ref.get_winner(ref_board)
        our_w, our_b_pts, our_w_pts = E.score(board, KOMI)
        assert (int(ref_w), float(ref_b_pts), float(ref_w_pts)) == (
            int(our_w), float(our_b_pts), float(our_w_pts)), (
            f"seed={seed}: 19x19 score mismatch")

    print(f"REF19_OK seeds={seeds} moves={total_moves}", flush=True)


if __name__ == "__main__":
    main()

"""IO tests: SGF writer/parser roundtrip (reference SGFTestCase
tests.py:1139-1149), HDF5 sample layout (sgfsave.py:16-79), and the GTP
frontend command flow (sejonggo.py:71-160)."""
import io as _io
import os

import jax
import numpy as np

from sejonggo_tpu.actor import play_games
from sejonggo_tpu.config import SearchConfig
from sejonggo_tpu.goenv import engine, gtp_to_xy, xy_to_gtp
from sejonggo_tpu.io import (
    GTPFrontend,
    GoEngine,
    game_to_sgf,
    load_move_sample,
    parse_sgf,
    save_game_sgf,
    save_self_play_data,
)
from sejonggo_tpu.nets import dummy_actor_fn

SIZE = 9
SEARCH = SearchConfig(simulations=8, batch_size=4, use_symmetry=False)


def _play_batch(n_moves=6, b=1):
    return play_games(
        dummy_actor_fn, size=SIZE, komi=5.5, search=SEARCH, game_batch=b,
        rng=jax.random.PRNGKey(0), selfplay=True, stop_exploration=2,
        max_moves=n_moves)


def test_sgf_roundtrip():
    moves = [(1, 2, 3), (-1, 4, 5), (1, 0, SIZE)]  # incl. pass
    text = game_to_sgf(SIZE, 5.5, moves, result="B+2.5", values=[0.1, -0.2, 0.3])
    parsed = parse_sgf(text)
    assert parsed["size"] == SIZE
    assert parsed["komi"] == 5.5
    assert parsed["result"] == "B+2.5"
    assert parsed["moves"] == moves


def test_sgf_handicap_and_setup():
    text = "(;GM[1]FF[4]SZ[19]KM[0.5]HA[2]AB[pd][dp];W[dd];B[pp])"
    parsed = parse_sgf(text)
    assert parsed["handicap"] == 2
    assert parsed["setup_black"] == [(15, 3), (3, 15)]
    assert parsed["moves"] == [(-1, 3, 3), (1, 15, 15)]


def test_save_game_sgf(tmp_path):
    games = _play_batch()
    path = save_game_sgf(str(tmp_path), "test_model", 0, size=SIZE, komi=5.5,
                         games=games, game_index=0)
    parsed = parse_sgf(open(path).read())
    assert len(parsed["moves"]) == int(games.num_moves[0])
    # moves match the recorded actions
    for t, (player, x, y) in enumerate(parsed["moves"]):
        assert player == int(games.players[t, 0])
        a = int(games.actions[t, 0])
        assert (y * SIZE + x if y < SIZE else SIZE * SIZE) == a


def test_h5_layout_roundtrip(tmp_path):
    games = _play_batch(n_moves=4)
    n = save_self_play_data(str(tmp_path), "model_x", games)
    assert n == int(games.num_moves.sum())
    d = os.path.join(str(tmp_path), "model_x", "game_00000", "move_000")
    board, policy, value = load_move_sample(d)
    assert board.shape == (SIZE, SIZE, 17)
    assert board.dtype == np.float32
    assert np.array_equal(board, games.boards[0, 0].astype(np.float32))
    assert policy.shape == (SIZE * SIZE + 1,)
    assert value.shape == ()


def test_gtp_vertex_conversion():
    # 'I' skipped: column 8 -> 'J' (reference sejonggo.py:119-126)
    assert xy_to_gtp(8, 0, 9) == "J9"
    assert gtp_to_xy("J9", 9) == (8, 0)
    assert xy_to_gtp(0, 8, 9) == "A1"
    assert gtp_to_xy("A1", 9) == (0, 8)
    assert gtp_to_xy("pass", 9) == (0, 9)
    for x in range(9):
        for y in range(9):
            assert gtp_to_xy(xy_to_gtp(x, y, 9), 9) == (x, y)


def test_gtp_frontend_flow():
    eng = GoEngine(dummy_actor_fn, None, size=SIZE, komi=5.5, search=SEARCH)
    gtp = GTPFrontend(eng)
    assert gtp.parse_command("protocol_version") == "= 2\n\n"
    assert gtp.parse_command("boardsize 9") == "=\n\n"
    assert gtp.parse_command("komi 5.5") == "=\n\n"
    out = gtp.parse_command("genmove B")
    assert out.startswith("= ")
    vertex = out[2:].strip()
    x, y = gtp_to_xy(vertex, SIZE)
    board = np.asarray(eng.board)
    if y < SIZE:
        assert board[y, x, 1] == 1  # stone played; white to move now
    assert gtp.parse_command("play W D4") == "=\n\n"
    x, y = gtp_to_xy("D4", SIZE)
    assert np.asarray(eng.board)[y, x, 1] == 1  # white stone, black to move
    out2 = gtp.parse_command("genmove B")
    assert out2.startswith("= ")
    # id-tagged commands and unknown-command errors
    assert gtp.parse_command("7 protocol_version") == "=7 2\n\n"
    assert gtp.parse_command("bogus_cmd").startswith("?")
    assert gtp.parse_command("boardsize 13").startswith("?")
    # GTP v2 capability probe
    assert gtp.parse_command("known_command genmove") == "= true\n\n"
    assert gtp.parse_command("known_command bogus_cmd") == "= false\n\n"
    # clear resets
    gtp.parse_command("clear_board")
    assert np.asarray(eng.board)[:, :, 0].sum() == 0
    # scripted session through run()
    eng2 = GoEngine(dummy_actor_fn, None, size=SIZE, komi=5.5, search=SEARCH)
    gtp2 = GTPFrontend(eng2)
    inp = _io.StringIO("protocol_version\ngenmove B\ngenmove W\nfinal_score\nquit\n")
    outp = _io.StringIO()
    gtp2.run(inp, outp)
    chunks = [c for c in outp.getvalue().split("\n\n") if c.strip()]
    assert len(chunks) == 5
    assert all(c.startswith("=") for c in chunks)

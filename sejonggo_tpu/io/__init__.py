from sejonggo_tpu.io.sgf import parse_sgf, game_to_sgf, save_game_sgf
from sejonggo_tpu.io.h5data import save_self_play_data, load_move_sample
from sejonggo_tpu.io.gtp import GoEngine, GTPFrontend

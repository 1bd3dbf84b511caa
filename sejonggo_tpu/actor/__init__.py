from sejonggo_tpu.actor.selfplay import GameBatch, play_games
from sejonggo_tpu.actor.resign import ResignCalibrator

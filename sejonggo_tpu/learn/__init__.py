from sejonggo_tpu.learn.replay import (ReplayBuffer, game_samples,
                                       load_segment, save_segment)
from sejonggo_tpu.learn.train import TrainState, make_train_step, make_optimizer
from sejonggo_tpu.learn.evaluate import evaluate_models
from sejonggo_tpu.learn.checkpoint import CheckpointStore

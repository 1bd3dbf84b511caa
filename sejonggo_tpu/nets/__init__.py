from sejonggo_tpu.nets.azero import AZNet, init_variables, make_predict_fn
from sejonggo_tpu.nets.losses import az_loss
from sejonggo_tpu.nets.stub import (
    as_actor_fn,
    dummy_actor_fn,
    dummy_predict_fn,
    make_constant_predict_fn,
)

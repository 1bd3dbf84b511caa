"""Training step (data-parallel over a device mesh).

Reference counterpart: train.py:24-72 (SGD lr 1e-2 momentum 0.9, batch
32, NUM_WORKERS=64 steps per epoch) and train.py:75-133's
keras.multi_gpu_model data parallelism.  Here data parallelism is a
sharded jit over a `Mesh` axis ('dp'): the batch is sharded, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI — no
parameter-server, no multi_gpu_model.

L2: the reference regularizes every conv/dense kernel AND bias with
keras l2(1e-4) (model.py:23-26), i.e. a d(loss)/dw contribution of
2e-4 * w; replicated here as decoupled weight decay 2e-4 masked to
exclude BatchNorm parameters (Keras does not regularize those).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from sejonggo_tpu.nets import az_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _decay_mask(params):
    def mask_one(path, _):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        in_bn = any("BatchNorm" in str(n) for n in names)
        return not in_bn

    return jax.tree_util.tree_map_with_path(mask_one, params)


def make_optimizer(lr: float = 1e-2, momentum: float = 0.9,
                   l2: float = 1e-4) -> optax.GradientTransformation:
    return optax.chain(
        optax.masked(optax.add_decayed_weights(2.0 * l2), _decay_mask),
        optax.sgd(learning_rate=lr, momentum=momentum),
    )


def init_train_state(net, variables, tx) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )


def make_train_step(net, tx, loss_mode: str = "agz",
                    mesh: Optional[jax.sharding.Mesh] = None,
                    dp_axis: str = "dp") -> Callable:
    """Build the jitted train step.

    With `mesh`, the batch is sharded over `dp_axis` and the state is
    replicated; gradients are all-reduced by XLA (the TPU-native form of
    reference train.py:96-99 multi_gpu_model).
    """

    def step_fn(state: TrainState, boards, policy_targets, value_targets):
        def loss_fn(params):
            (logits, values), mut = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                boards, train=True, mutable=["batch_stats"])
            total, metrics = az_loss(
                logits, values, policy_targets, value_targets, loss_mode)
            return total, (mut["batch_stats"], metrics)

        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    from sejonggo_tpu.utils.platform import donate_argnums

    if mesh is None:
        return jax.jit(step_fn, **donate_argnums(0))

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())          # replicated state
    data = NamedSharding(mesh, P(dp_axis))   # batch sharded over dp
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, data),
        **donate_argnums(0),
    )

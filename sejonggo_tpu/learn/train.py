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


class PlateauScheduler:
    """ReduceLROnPlateau (reference main_training.py:72, which monitors
    policy_out_acc; here the monitored metric is the per-phase mean
    training loss, mode=min).  After `patience` consecutive phases
    without improvement > `min_delta`, the LR is multiplied by `factor`
    (floored at `min_lr`) and the wait counter resets.

    Pure host-side bookkeeping: the caller rebuilds its optimizer /
    train step when `update()` returns a new LR (SGD's momentum trace is
    structurally independent of the LR, so optimizer state carries
    over and old checkpoints stay loadable).
    """

    def __init__(self, lr: float, factor: float = 0.5, patience: int = 8,
                 min_lr: float = 1e-4, min_delta: float = 1e-3):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.min_delta = min_delta
        self.best = float("inf")
        self.wait = 0

    def update(self, metric: float) -> Optional[float]:
        """Feed one phase's metric; returns the new LR if it changed."""
        import math

        if not math.isfinite(metric):
            return None  # nonfinite phases don't count toward plateau
        if metric < self.best - self.min_delta:
            self.best = metric
            self.wait = 0
            return None
        self.wait += 1
        if self.wait < self.patience or self.lr <= self.min_lr:
            return None
        self.lr = max(self.lr * self.factor, self.min_lr)
        self.wait = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "wait": self.wait}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.wait = d["wait"]


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

        (total, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # Non-finite guard (reference TerminateOnNaN, train.py:34): a
        # NaN/inf loss or gradient skips the whole update — params,
        # batch stats and optimizer state keep their old values — and is
        # reported in metrics['nonfinite'] so the caller can count and
        # abort after K consecutive poisoned batches.
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
        keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_state = TrainState(
            keep(new_params, state.params),
            keep(new_stats, state.batch_stats),
            keep(new_opt, state.opt_state),
            state.step + ok.astype(jnp.int32))
        metrics = dict(metrics, grad_norm=gnorm,
                       nonfinite=(~ok).astype(jnp.float32))
        return new_state, metrics

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

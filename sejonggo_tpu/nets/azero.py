"""AlphaZero residual policy/value network in flax.

Functional parity target: reference model.py:55-95 — 3x3 conv(256)+BN+
ReLU stem, N residual blocks (two 3x3 conv(256)+BN with skip-add), a
policy head (1x1 conv(2)+BN+ReLU -> Dense(N^2+1) softmax) and a value
head (1x1 conv(2)+BN+ReLU -> Dense(256) ReLU -> Dense(1) tanh).

TPU-native differences:
- returns policy LOGITS (softmax applied by callers/losses) so training
  uses a numerically-stable cross-entropy;
- compute dtype is configurable (bfloat16 on the MXU by default at
  scale), parameters stay float32;
- L2 regularization (reference keras l2(1e-4) on every kernel/bias,
  model.py:23-26) is applied in the optimizer as decoupled weight decay
  (see learn/train.py), not baked into the module;
- BatchNorm uses Keras-compatible defaults (momentum .99, eps 1e-3).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sejonggo_tpu.config import NetConfig


class ResBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        conv = partial(
            nn.Conv, features=self.filters, kernel_size=(3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        bn = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.99,
            epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32,
        )
        y = conv()(x)
        y = bn()(y)
        y = nn.relu(y)
        y = conv()(y)
        y = bn()(y)
        return nn.relu(y + x)


class AZNet(nn.Module):
    """Policy/value tower.  Input: (B, N, N, 17) feature planes."""

    size: int
    blocks: int = 20
    filters: int = 256
    value_hidden: int = 256
    policy_filters: int = 2
    value_filters: int = 2
    compute_dtype: str = "bfloat16"

    @classmethod
    def from_config(cls, size: int, cfg: NetConfig) -> "AZNet":
        return cls(
            size=size, blocks=cfg.blocks, filters=cfg.filters,
            value_hidden=cfg.value_hidden, policy_filters=cfg.policy_filters,
            value_filters=cfg.value_filters, compute_dtype=cfg.compute_dtype,
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.compute_dtype)
        x = x.astype(dtype)
        conv = partial(nn.Conv, dtype=dtype, param_dtype=jnp.float32)
        bn = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.99,
            epsilon=1e-3, dtype=dtype, param_dtype=jnp.float32,
        )
        dense = partial(nn.Dense, dtype=dtype, param_dtype=jnp.float32)

        h = conv(self.filters, (3, 3), padding="SAME")(x)
        h = bn()(h)
        h = nn.relu(h)
        for _ in range(self.blocks):
            h = ResBlock(self.filters, dtype)(h, train)

        # policy head (reference model.py:72-80)
        p = conv(self.policy_filters, (1, 1))(h)
        p = bn()(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        policy_logits = dense(self.size * self.size + 1, name="policy_out")(p)

        # value head (reference model.py:82-90)
        v = conv(self.value_filters, (1, 1))(h)
        v = bn()(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.relu(dense(self.value_hidden)(v))
        value = jnp.tanh(dense(1, name="value_out")(v))

        return policy_logits.astype(jnp.float32), value.astype(jnp.float32)


def init_variables(model: AZNet, rng) -> Any:
    """Initialize params + batch_stats with a dummy batch."""
    dummy = jnp.zeros((1, model.size, model.size, 17), jnp.float32)
    return model.init(rng, dummy, train=False)


def make_predict_fn(
    model: AZNet,
) -> Callable[[Any, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns predict(variables, boards) -> (policy_probs, values).

    The on-device counterpart of reference model.predict_on_batch
    (the whole predicting_queue_worker.py process layer collapses into
    this single traced call inside the actor loop).
    values has shape (B, 1) like the reference.
    """

    def predict(variables, boards):
        logits, values = model.apply(variables, boards.astype(jnp.float32), train=False)
        return jax.nn.softmax(logits, axis=-1), values

    return predict

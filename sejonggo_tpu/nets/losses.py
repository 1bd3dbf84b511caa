"""Loss functions.

Reference loss (model.py:49-52) applies `mse + categorical_crossentropy`
to BOTH heads.  For the scalar tanh value head, Keras's
categorical_crossentropy normalizes the prediction across its (single)
axis, so the CE term degenerates to zero and the value loss is
effectively MSE; the policy loss is MSE + CE.  'reference' mode
replicates that effective behavior; 'agz' is the AlphaGo-Zero paper
loss (CE policy + MSE value), the default for the TPU build.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def az_loss(policy_logits, values, policy_target, value_target, mode: str = "agz"):
    """Per-batch mean loss.

    policy_logits: (B, A); values: (B, 1) or (B,); policy_target: (B, A)
    (need not be normalized — the reference's prior-targets aren't);
    value_target: (B,) in [-1, 1].
    """
    values = values.reshape(-1)
    value_target = value_target.reshape(-1).astype(values.dtype)
    logp = jax.nn.log_softmax(policy_logits, axis=-1)
    ce = -jnp.sum(policy_target * logp, axis=-1)
    mse_v = jnp.square(values - value_target)
    if mode == "agz":
        total = ce + mse_v
    elif mode == "reference":
        probs = jnp.exp(logp)
        mse_p = jnp.mean(jnp.square(probs - policy_target), axis=-1)
        total = (mse_p + ce) + mse_v
    else:
        raise ValueError(f"unknown loss mode {mode!r}")
    return jnp.mean(total), {
        "loss": jnp.mean(total),
        "policy_ce": jnp.mean(ce),
        "value_mse": jnp.mean(mse_v),
    }

"""Deterministic stub predict functions for tests.

The reference tests search/self-play without a trained net via
DummyModel (test/tests.py:34-49: monotonically decreasing policy,
value = 1).  Here the same idea is an injectable, jax-traceable
predict_fn so the whole search stays jittable.
"""
from __future__ import annotations

import jax.numpy as jnp


def dummy_predict_fn(boards):
    """Reference DummyModel: policy[i] = (A - i) / sum, value = 1."""
    b = boards.shape[0]
    n = boards.shape[-3]
    a = n * n + 1
    ramp = jnp.arange(a, 0, -1, dtype=jnp.float32)
    policy = jnp.broadcast_to(ramp / jnp.sum(ramp), (b, a))
    return policy, jnp.ones((b, 1), jnp.float32)


def dummy_actor_fn(variables, boards):
    """Actor-level signature variant of dummy_predict_fn."""
    return dummy_predict_fn(boards)


def as_actor_fn(fn):
    """Adapt a stateless predict_fn(boards) to the actor-level
    (variables, boards) signature used by play_games."""

    def actor_fn(variables, boards):
        return fn(boards)

    return actor_fn


def make_constant_predict_fn(policy, value: float = 1.0):
    """predict_fn returning a fixed policy row and constant value."""
    policy = jnp.asarray(policy, jnp.float32)

    def predict(boards):
        b = boards.shape[0]
        return (
            jnp.broadcast_to(policy, (b, policy.shape[-1])),
            jnp.full((b, 1), value, jnp.float32),
        )

    return predict

"""Microbench _take_rows_mxu variants inside the real 4-round search at
the 9x9 bench point (B=3072): bf16 vs s8 one-hot matmuls and einsum
operand orders — the one-hot tensor is the round's largest intermediate
((B, 112, 82) per leaf-chain gather) and the trace shows the node table
bouncing between layouts around the einsum (copy.613/643,
runs/profile_breakdown_r3b.log).

Run: python scripts/ab_gather_variants.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variant_bf16(table, idx):
    import jax.numpy as jnp

    from sejonggo_tpu.search import mcts

    b, c = table.shape[0], table.shape[1]
    if c > mcts._MXU_GATHER_MAX_ROWS or not jnp.issubdtype(
            table.dtype, jnp.integer):
        return jnp.take_along_axis(
            table, idx.reshape(b, -1, *([1] * (table.ndim - 2))), axis=1)
    rows = table.reshape(b, c, -1)
    oh = (idx[..., None] == jnp.arange(c, dtype=idx.dtype)).astype(jnp.bfloat16)
    out = jnp.einsum("bgc,bcr->bgr", oh, rows.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(b, idx.shape[1], *table.shape[2:])


def _variant_s8(table, idx):
    import jax.numpy as jnp

    from sejonggo_tpu.search import mcts

    b, c = table.shape[0], table.shape[1]
    if c > mcts._MXU_GATHER_MAX_ROWS or not jnp.issubdtype(
            table.dtype, jnp.integer):
        return jnp.take_along_axis(
            table, idx.reshape(b, -1, *([1] * (table.ndim - 2))), axis=1)
    rows = table.reshape(b, c, -1)
    oh = (idx[..., None] == jnp.arange(c, dtype=idx.dtype)).astype(jnp.int8)
    out = jnp.einsum("bgc,bcr->bgr", oh, rows.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    return out.astype(table.dtype).reshape(b, idx.shape[1], *table.shape[2:])


def _variant_table_first(table, idx):
    """Contract with the table as LHS and the one-hot transposed so the
    (B, C, nn) table is read in its native layout."""
    import jax.numpy as jnp

    from sejonggo_tpu.search import mcts

    b, c = table.shape[0], table.shape[1]
    if c > mcts._MXU_GATHER_MAX_ROWS or not jnp.issubdtype(
            table.dtype, jnp.integer):
        return jnp.take_along_axis(
            table, idx.reshape(b, -1, *([1] * (table.ndim - 2))), axis=1)
    rows = table.reshape(b, c, -1)
    oh = (idx[:, None, :] == jnp.arange(c, dtype=idx.dtype)[:, None]).astype(
        jnp.bfloat16)  # (B, C, G)
    out = jnp.einsum("bcg,bcr->bgr", oh, rows.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(b, idx.shape[1], *table.shape[2:])


def main():
    import jax
    import jax.numpy as jnp

    from sejonggo_tpu.config import NetConfig, SearchConfig
    from sejonggo_tpu.goenv import engine
    from sejonggo_tpu.nets import AZNet, init_variables, make_predict_fn
    from sejonggo_tpu.search import mcts, new_tree_batch
    from sejonggo_tpu.search.mcts import run_search

    if jax.default_backend() != "cpu":
        from sejonggo_tpu.ops import enable_tpu_kernels

        enable_tpu_kernels(True)

    size, b, k, sims = 9, 3072, 16, 64
    search = SearchConfig(simulations=sims, batch_size=k, use_symmetry=True,
                          max_nodes=82)
    net = AZNet.from_config(size, NetConfig(
        blocks=4, filters=64, value_hidden=64, compute_dtype="bfloat16"))
    variables = init_variables(net, jax.random.PRNGKey(0))
    predict = make_predict_fn(net)
    boards = jnp.stack([engine.init_board(size)] * b)
    trees0 = new_tree_batch(jnp.zeros((b, size * size + 1), jnp.float32),
                            boards, search.capacity())

    out = {}
    ref = None
    for name, fn in (("bf16", _variant_bf16), ("s8", _variant_s8),
                     ("table_first", _variant_table_first)):
        mcts._take_rows_mxu = fn

        def sweep(t, r):
            return run_search(t, lambda x: predict(variables, x), r,
                              simulations=sims, batch_size=k,
                              use_symmetry=True)

        j = jax.jit(sweep)
        res = j(trees0, jax.random.PRNGKey(1))
        jax.block_until_ready(res)
        got = jnp.asarray(res.child_N[0, 0])
        if ref is None:
            ref = got
        else:
            assert (got == ref).all(), f"{name} diverged from bf16"
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            r = j(trees0, jax.random.PRNGKey(1))
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        steps = b * sims / best
        out[f"env_steps_per_s_search_{name}"] = round(steps, 1)
        print(f"[ab] {name}: {steps:,.0f} search-only env-steps/s",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

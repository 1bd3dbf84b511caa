"""Pallas TPU kernel: batched flood-fill fixpoint.

The Go engine's captures/scoring/legality are all flood fills — grow a
seed within an allowed region to a fixpoint (engine._flood).  The pure
XLA form iterates `dilate` with a whole-array convergence check, which
serializes every iteration against an HBM-visible reduction across the
ENTIRE batch: one long-chained board makes every board pay.

This kernel tiles the batch and keeps each block's masks resident in
VMEM: boards are flattened to padded 128-lane rows, the 4-neighbor
dilation becomes two lane-rolls (+-1 with column masks) and two
sublane-row rolls (+-N), and the convergence check is a cheap VMEM
reduction per block — blocks with short chains finish early instead of
marching to the global worst case.

Layout: (B, N, N) bool -> (B, L) int32 with L = ceil(N*N/128)*128.
Wrap-around from `pltpu.roll` is killed by the column/row validity
masks and the in-board mask (padding lanes are never `allowed`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _padded_lanes(n: int) -> int:
    return ((n * n + LANES - 1) // LANES) * LANES


def _flood_kernel(n: int, seed_ref, allowed_ref, out_ref):
    l = seed_ref.shape[-1]
    allowed = allowed_ref[:]
    cur = seed_ref[:] & allowed

    lane = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
    col = lane % n
    in_board = lane < n * n
    lmask = ((col > 0) & in_board).astype(jnp.int32)
    rmask = ((col < n - 1) & in_board).astype(jnp.int32)
    umask = ((lane >= n) & in_board).astype(jnp.int32)
    dmask = (lane < n * (n - 1)).astype(jnp.int32)

    def cond(state):
        return state[1]

    def body(state):
        cur, _ = state
        # pltpu.roll requires non-negative shifts: roll by l-s == -s
        nbr = (
            (pltpu.roll(cur, 1, 1) & lmask)
            | (pltpu.roll(cur, l - 1, 1) & rmask)
            | (pltpu.roll(cur, n, 1) & umask)
            | (pltpu.roll(cur, l - n, 1) & dmask)
        )
        nxt = cur | (allowed & nbr)
        return nxt, jnp.any(nxt != cur)

    cur, _ = lax.while_loop(cond, body, (cur, jnp.any(cur != 0)))
    out_ref[:] = cur


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def flood_fixpoint_pallas(seed, allowed, block_b: int = 128,
                          interpret: bool = False):
    """(B, N, N) bool masks -> (B, N, N) bool reached-region."""
    b, n, _ = seed.shape
    l = _padded_lanes(n)

    def to_lanes(m):
        flat = m.reshape(b, n * n).astype(jnp.int32)
        return jnp.pad(flat, ((0, 0), (0, l - n * n)))

    s = to_lanes(seed)
    a = to_lanes(allowed)
    bb = min(block_b, b)
    pad_b = (-b) % bb
    if pad_b:
        s = jnp.pad(s, ((0, pad_b), (0, 0)))
        a = jnp.pad(a, ((0, pad_b), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_flood_kernel, n),
        out_shape=jax.ShapeDtypeStruct(s.shape, jnp.int32),
        grid=(s.shape[0] // bb,),
        in_specs=[
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, a)
    return (out[:b, : n * n] != 0).reshape(b, n, n)


def enable_pallas_flood(enable: bool = True, interpret: bool = False) -> None:
    """Install the kernel as the engine's batched flood implementation
    (engine.step_batch / illegal_moves_mask_batch pick it up)."""
    from sejonggo_tpu.goenv import engine

    if not enable:
        engine.set_flood_impl(None)
        return

    def impl(seed, allowed):
        return flood_fixpoint_pallas(seed, allowed, interpret=interpret)

    engine.set_flood_impl(impl)

"""Fused Pallas TPU kernel: leaf env-step + next-move legality.

The search's hottest env work is stepping B*k leaf boards per round and
computing the resulting position's legality mask
(engine.step_stones_batch + engine.illegal_moves_mask_stones_batch,
reference semantics take_stones play.py:182-217 and legal_moves
play.py:71-104).  In pure XLA that is ~7 independent fixpoint loops
(capture floods, suicide floods, the distinct-liberty min/max fixpoint)
each of which round-trips every intermediate mask through HBM and
convergence-checks across the WHOLE batch — one long-chained board
makes every board pay every iteration.

This kernel runs the entire sequence per batch-block with every
intermediate mask resident in VMEM:

    place stone -> opponent-capture floods -> own-suicide floods
    -> new stones, then for the NEXT mover: simple-ko point,
    distinct-liberty min/max fixpoint, capturable-group dilation,
    legality mask

HBM traffic collapses to one read of the parent grids and one write of
(new grids, illegal mask); each block's fixpoints stop at that block's
own convergence.

Layout (shared with ops/flood.py): boards flatten to padded 128-lane
rows, 4-neighbor dilation = two lane-rolls with column masks + two
row-rolls; masks are 0/1 int32 in VMEM.
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


def _step_legal_kernel(n: int, stones_ref, side_ref, action_ref,
                       out_stones_ref, out_illegal_ref):
    l = stones_ref.shape[-1]
    inf = n * n

    lane = jax.lax.broadcasted_iota(jnp.int32, stones_ref.shape, 1)
    col = lane % n
    in_board = (lane < n * n).astype(jnp.int32)
    lmask = ((col > 0) & (lane < n * n)).astype(jnp.int32)
    rmask = ((col < n - 1) & (lane < n * n)).astype(jnp.int32)
    umask = ((lane >= n) & (lane < n * n)).astype(jnp.int32)
    dmask = (lane < n * (n - 1)).astype(jnp.int32)

    def dilate(m):
        # pltpu.roll requires non-negative shifts: l-s == -s
        return (
            (pltpu.roll(m, 1, 1) & lmask)
            | (pltpu.roll(m, l - 1, 1) & rmask)
            | (pltpu.roll(m, n, 1) & umask)
            | (pltpu.roll(m, l - n, 1) & dmask)
        )

    def flood(seed, allowed):
        seed = seed & allowed

        def cond(state):
            return state[1]

        def body(state):
            cur, _ = state
            nxt = cur | (allowed & dilate(cur))
            return nxt, jnp.any(nxt != cur)

        out, _ = lax.while_loop(cond, body, (seed, jnp.any(seed != 0)))
        return out

    stones = stones_ref[:]
    side = side_ref[:]          # (bb, 1) broadcasts against (bb, l)
    action = action_ref[:]      # (bb, 1)
    onehot = (lane == action).astype(jnp.int32)  # all-zero when pass

    own = (((stones == side) & (lane < n * n)).astype(jnp.int32)) | onehot
    opp = ((stones == -side) & (lane < n * n)).astype(jnp.int32)

    # opponent captures: only dead groups adjacent to the placed stone
    # are removed (take_stones play.py:185-199)
    empty = in_board & (1 - own) & (1 - opp)
    alive_opp = flood(opp & dilate(empty), opp)
    dead_opp = opp & (1 - alive_opp)
    removed_opp = flood(dead_opp & dilate(onehot), dead_opp)
    opp = opp & (1 - removed_opp)

    # own suicide: checked at the placed stone and its neighbors, after
    # opponent captures resolved (take_stones play.py:200-215)
    empty = in_board & (1 - own) & (1 - opp)
    alive_own = flood(own & dilate(empty), own)
    dead_own = own & (1 - alive_own)
    removed_own = flood(dead_own & (dilate(onehot) | onehot), dead_own)
    own = own & (1 - removed_own)

    out_stones_ref[:] = side * (own - opp)

    # --- legality of the RESULT for the next mover (side2 = -side):
    # own2/opp2 relabel the post-step masks; ko point = a stone of
    # side2's color on the PREVIOUS position that is no longer side2's
    # (illegal_moves_mask_stones: (prev == side2) & ~own2)
    own2, opp2 = opp, own
    prev_own2 = ((stones == -side) & (lane < n * n)).astype(jnp.int32)
    ko_pt = prev_own2 & (1 - own2)
    ko_n = jnp.sum(ko_pt, axis=1, keepdims=True)
    ko = ko_pt * (ko_n == 1).astype(jnp.int32)

    empty2 = in_board & (1 - own2) & (1 - opp2)

    # distinct-liberty min/max fixpoint over opp2 groups
    # (engine._group_minmax_lib): a group with mn >= mx has <= 1
    # distinct liberty -> capturable by the next mover
    def nbr_min(v):
        big = jnp.int32(inf)
        return jnp.minimum(
            jnp.minimum(
                jnp.where(lmask == 1, pltpu.roll(v, 1, 1), big),
                jnp.where(rmask == 1, pltpu.roll(v, l - 1, 1), big)),
            jnp.minimum(
                jnp.where(umask == 1, pltpu.roll(v, n, 1), big),
                jnp.where(dmask == 1, pltpu.roll(v, l - n, 1), big)),
        )

    def nbr_max(v):
        small = jnp.int32(-1)
        return jnp.maximum(
            jnp.maximum(
                jnp.where(lmask == 1, pltpu.roll(v, 1, 1), small),
                jnp.where(rmask == 1, pltpu.roll(v, l - 1, 1), small)),
            jnp.maximum(
                jnp.where(umask == 1, pltpu.roll(v, n, 1), small),
                jnp.where(dmask == 1, pltpu.roll(v, l - n, 1), small)),
        )

    is_opp = opp2 == 1
    lib_min = jnp.where(empty2 == 1, lane, inf)
    lib_max = jnp.where(empty2 == 1, lane, -1)
    mn = jnp.where(is_opp, nbr_min(lib_min), inf)
    mx = jnp.where(is_opp, nbr_max(lib_max), -1)

    def mcond(state):
        return state[2]

    def mbody(state):
        mn, mx, _ = state
        nmn = jnp.minimum(mn, nbr_min(jnp.where(is_opp, mn, inf)))
        nmx = jnp.maximum(mx, nbr_max(jnp.where(is_opp, mx, -1)))
        nmn = jnp.where(is_opp, nmn, inf)
        nmx = jnp.where(is_opp, nmx, -1)
        return nmn, nmx, jnp.any((nmn != mn) | (nmx != mx))

    mn, mx, _ = lax.while_loop(mcond, mbody, (mn, mx, jnp.array(True)))
    opp_capturable = opp2 & (mn >= mx).astype(jnp.int32)

    breath = dilate(empty2) | dilate(opp_capturable)
    legal = empty2 & (1 - ko) & breath
    out_illegal_ref[:] = 1 - legal


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def step_legal_pallas(stones, sides, actions, block_b: int = 256,
                      interpret: bool = False):
    """Fused leaf step + legality.

    stones: (B, N, N) int8 signed parent grids; sides: (B,) the mover
    (+1/-1); actions: (B,) int32 in [0, N*N] (N*N = pass).
    Returns (new_stones (B, N, N) int8,
             illegal (B, N*N+1) bool for the NEXT mover; pass legal).
    Exactly engine.step_stones_batch followed by
    engine.illegal_moves_mask_stones_batch(new, parent, -sides).
    """
    b, n, _ = stones.shape
    l = _padded_lanes(n)

    flat = stones.reshape(b, n * n).astype(jnp.int32)
    flat = jnp.pad(flat, ((0, 0), (0, l - n * n)))
    side = jnp.asarray(sides, jnp.int32).reshape(b, 1)
    action = jnp.asarray(actions, jnp.int32).reshape(b, 1)

    bb = min(block_b, b)
    pad_b = (-b) % bb
    if pad_b:
        flat = jnp.pad(flat, ((0, pad_b), (0, 0)))
        # padded rows: side 1 (avoid 0*0 == 0 degeneracies), pass move
        side = jnp.pad(side, ((0, pad_b), (0, 0)), constant_values=1)
        action = jnp.pad(action, ((0, pad_b), (0, 0)),
                         constant_values=n * n)

    nb = flat.shape[0] // bb
    out_stones, out_illegal = pl.pallas_call(
        functools.partial(_step_legal_kernel, n),
        out_shape=(
            jax.ShapeDtypeStruct(flat.shape, jnp.int32),
            jax.ShapeDtypeStruct(flat.shape, jnp.int32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(flat, side, action)

    new_stones = out_stones[:b, : n * n].astype(jnp.int8).reshape(b, n, n)
    illegal = out_illegal[:b, : n * n] != 0
    illegal = jnp.concatenate(
        [illegal, jnp.zeros((b, 1), bool)], axis=-1)
    return new_stones, illegal


def enable_pallas_gostep(enable: bool = True, interpret: bool = False) -> None:
    """Install the fused kernel as the engine's leaf step+legality path
    (engine.step_and_illegal_stones_batch picks it up — the search
    round's dominant env work, mcts.simulate_round)."""
    from sejonggo_tpu.goenv import engine

    if not enable:
        engine.set_step_legal_impl(None)
        return

    def impl(stones, sides, actions):
        return step_legal_pallas(stones, sides, actions,
                                 interpret=interpret)

    engine.set_step_legal_impl(impl)

"""D4 (dihedral) symmetries as table-driven gather permutations.

Functional parity target: reference symmetry.py — 7 transforms used in
SYMMETRIES (symmetry.py:117-125): identity, left diagonal (transpose),
vertical-axis flip, horizontal-axis flip, rotations 90/180/270; the
right diagonal (anti-transpose) completes the group and is included
here as index 7.

The reference implements each as an ad-hoc numpy board op paired with a
trig-derived inverse policy-index permutation (symmetry.py:12-42).  Here
both directions are precomputed flat gather indices, so a batch of
boards can be transformed on device with per-board symmetry ids in one
vectorized take — TPU-friendly (no data-dependent control flow).

Coordinate convention: a stone of the original board at (x, y) appears
at T(x, y) in the transformed board.  The policy permutation maps the
network's output on the transformed board back to original move
indices: policy_orig[i] = policy_net[fwd_flat(i)].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (name, T) with T(x, y, n) -> (x', y'); order matches reference
# SYMMETRIES (symmetry.py:117-125), right diagonal appended.
_TRANSFORMS = (
    ("identity", lambda x, y, n: (x, y)),
    ("left_diagonal", lambda x, y, n: (y, x)),
    ("vertical_axis", lambda x, y, n: (n - 1 - x, y)),
    ("horizontal_axis", lambda x, y, n: (x, n - 1 - y)),
    ("rotation_90", lambda x, y, n: (y, n - 1 - x)),
    ("rotation_180", lambda x, y, n: (n - 1 - x, n - 1 - y)),
    ("rotation_270", lambda x, y, n: (n - 1 - y, x)),
    ("right_diagonal", lambda x, y, n: (n - 1 - y, n - 1 - x)),
)

NUM_SYMMETRIES = len(_TRANSFORMS)
# Number used by the reference's random choice (symmetry.py:117-128).
NUM_REFERENCE_SYMMETRIES = 7


@functools.lru_cache(maxsize=None)
def symmetry_tables(size: int):
    """Returns (board_perm, policy_perm) numpy index tables.

    board_perm:  (S, size*size) int32 — flat spatial gather such that
                 transformed_flat = original_flat[board_perm[s]].
    policy_perm: (S, size*size + 1) int32 — gather mapping the net's
                 policy on the transformed board back to original move
                 order; the pass index is fixed.
    """
    n = size
    num = n * n
    board_perm = np.zeros((NUM_SYMMETRIES, num), np.int32)
    policy_perm = np.zeros((NUM_SYMMETRIES, num + 1), np.int32)
    for s, (_, t) in enumerate(_TRANSFORMS):
        for y in range(n):
            for x in range(n):
                tx, ty = t(x, y, n)
                # stone at (x,y) lands at (tx,ty): transformed[ty,tx] = orig[y,x]
                board_perm[s, ty * n + tx] = y * n + x
                policy_perm[s, y * n + x] = ty * n + tx
        policy_perm[s, num] = num  # pass is invariant
    return board_perm, policy_perm


def transform_board(board, sym: int):
    """Apply symmetry `sym` (static int) to one (N, N, C) board."""
    n = board.shape[-3]
    perm, _ = symmetry_tables(n)
    flat = board.reshape(n * n, board.shape[-1])
    return flat[jnp.asarray(perm[sym])].reshape(board.shape)


def inverse_policy(policy, sym: int):
    """Map a policy on the sym-transformed board back to original order."""
    n2 = policy.shape[-1] - 1
    n = int(np.sqrt(n2))
    _, pperm = symmetry_tables(n)
    return policy[..., jnp.asarray(pperm[sym])]


def transform_boards_batch(boards, sym_ids):
    """(B, N, N, C) boards, (B,) int32 symmetry ids -> transformed batch."""
    n = boards.shape[-3]
    perm, _ = symmetry_tables(n)
    perm = jnp.asarray(perm)[sym_ids]  # (B, n*n)
    flat = boards.reshape(boards.shape[0], n * n, boards.shape[-1])
    return jnp.take_along_axis(flat, perm[:, :, None], axis=1).reshape(boards.shape)


def inverse_policy_batch(policies, sym_ids):
    """(B, A) policies on transformed boards -> original move order."""
    a = policies.shape[-1]
    n = int(np.sqrt(a - 1))
    _, pperm = symmetry_tables(n)
    pperm = jnp.asarray(pperm)[sym_ids]  # (B, A)
    return jnp.take_along_axis(policies, pperm, axis=1)


def transform_flat_switch(x, sym, size: int):
    """Permute the flat spatial LAST axis of `x` ((..., size*size) or any
    trailing-flat layout) by symmetry id `sym` (traced scalar) via a
    static-permutation lax.switch — compiles to plain data movement, no
    dynamic gather.  Used to fuse the D4 transform into feature-source
    grids instead of the full feature tensor (mcts.leaf_features)."""
    bperm, _ = symmetry_tables(size)

    def br(s):
        return lambda: x[..., jnp.asarray(bperm[s])]

    return jax.lax.switch(sym, [br(s) for s in range(NUM_SYMMETRIES)])


def inverse_policy_switch(policy, sym):
    """Map a policy on the sym-transformed board (traced scalar id) back
    to original move order via a static-permutation switch."""
    n = int(np.sqrt(policy.shape[-1] - 1))
    _, pperm = symmetry_tables(n)

    def br(s):
        return lambda: policy[..., jnp.asarray(pperm[s])]

    return jax.lax.switch(sym, [br(s) for s in range(NUM_SYMMETRIES)])


def transform_flat_pergame(x, sym_ids, size: int):
    """Per-game variant of transform_flat_switch: `x` is (B, M, size*size)
    (flat spatial last axis), `sym_ids` is (B,) int32 — row b is permuted
    by its own symmetry.  A dynamic gather (vs. the switch's static data
    movement): used on EVALUATION paths where per-game decorrelation
    matters more than the hot-loop cost (see mcts.simulate_round
    per_game_symmetry)."""
    bperm, _ = symmetry_tables(size)
    perm = jnp.asarray(bperm)[sym_ids]          # (B, n*n)
    return jnp.take_along_axis(x, perm[:, None, :], axis=-1)


def random_symmetry_predict(predict_fn, boards, rng, num_symmetries: int = NUM_REFERENCE_SYMMETRIES):
    """Evaluate `predict_fn` under ONE random D4 symmetry for the whole
    batch — exactly the reference's behavior (random_symmetry_predict
    symmetry.py:127-132 draws a single transform per predict call).

    On device this is a lax.switch over static-permutation gathers,
    which compiles to plain data movement — measurably cheaper than the
    per-board dynamic gather (kept below as
    random_symmetry_predict_per_board for stronger decorrelation).
    """
    n = boards.shape[-3]
    bperm, pperm = symmetry_tables(n)
    sym = jax.random.randint(rng, (), 0, num_symmetries)
    flat = boards.reshape(boards.shape[0], n * n, boards.shape[-1])

    def tb(s):
        return lambda: flat[:, jnp.asarray(bperm[s])].reshape(boards.shape)

    transformed = jax.lax.switch(sym, [tb(s) for s in range(num_symmetries)])
    policies, values = predict_fn(transformed)

    def tp(s):
        return lambda: policies[:, jnp.asarray(pperm[s])]

    return (jax.lax.switch(sym, [tp(s) for s in range(num_symmetries)]),
            values)


def random_symmetry_predict_per_board(predict_fn, boards, rng,
                                      num_symmetries: int = NUM_REFERENCE_SYMMETRIES):
    """Per-board random symmetries (each board draws its own id) —
    stronger decorrelation than the reference's per-call draw, at the
    cost of a dynamic gather."""
    b = boards.shape[0]
    sym_ids = jax.random.randint(rng, (b,), 0, num_symmetries)
    policies, values = predict_fn(transform_boards_batch(boards, sym_ids))
    return inverse_policy_batch(policies, sym_ids), values

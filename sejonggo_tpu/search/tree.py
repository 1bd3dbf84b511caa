"""Array-backed MCTS tree state.

TPU-native replacement for the reference's nested-dict trees
(play.py:376-421: {index, count, value, mean_value, p, subtree, parent}).
A batch of B trees is a pytree of preallocated arrays with a leading
batch axis, so thousands of trees advance in lockstep per device step.

Statistics live on EDGES (parent node, action) rather than child nodes:
``child_N``/``child_W`` are the reference's per-child count/value,
``child_idx`` points to the child's node slot once that child has been
expanded (-1 before).  Node slots are allocated only for expanded nodes
(the reference's "subtree != {}" nodes); the root is slot 0 and carries
its own (count, value) in ``root_N``/``root_W``.

Node state is COMPACT: each node stores only its signed stone grid
(black-positive int8) and side to move — 81+1 bytes on 9x9 instead of
the 1377-byte 17-plane board.  The full plane stack exists only at the
tree root (``root_board``); a leaf's network features are reconstructed
from its ancestor chain of stone grids, falling back to the root's
history planes past the root (mcts.leaf_features).  This matters on
TPU: every expansion scatter and re-rooting gather scales with the
node payload, and the 17x shrink is a direct HBM-traffic win.  The
reference replays the whole move path per simulation instead
(self_play.py:41-66); here one env step from the parent's stored grid
expands a child.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sejonggo_tpu.goenv import engine


class Tree(NamedTuple):
    """One MCTS tree (batch via leading axis on every field).

    C = node capacity, A = actions (N*N+1).
    """

    root_board: jnp.ndarray   # (N, N, 17) int8 — full planes at the root
    node_stones: jnp.ndarray  # (C, N, N) int8 — signed stones per node
    node_side: jnp.ndarray    # (C,) int8 — side to move at the node
    node_P: jnp.ndarray       # (C, A) f32 — priors (raw masked policy)
    node_legal: jnp.ndarray   # (C, A) bool
    child_N: jnp.ndarray      # (C, A) i32 — edge visit counts
    child_W: jnp.ndarray      # (C, A) f32 — edge value sums
    child_idx: jnp.ndarray    # (C, A) i32 — child slot or -1
    parent: jnp.ndarray       # (C,) i32 — parent slot (root: 0)
    parent_action: jnp.ndarray  # (C,) i32 — action from parent (root: -1)
    n_nodes: jnp.ndarray      # () i32 — allocation high-water mark: live
    #   slots are a subset of [0, n_nodes).  Contiguous [0, n_nodes)
    #   after re-root compaction; run_search expands into the STATIC
    #   reserved region [capacity - simulations, capacity), leaving a
    #   dead gap behind (mcts._expand_backup slot_base)
    root_N: jnp.ndarray       # () i32 — root visit count
    root_W: jnp.ndarray       # () f32 — root value sum


def tree_capacity(simulations: int, batch_size: int) -> int:
    """Node slots: one per simulation for the current decision, plus a
    reuse budget of the same order for the subtree carried across moves
    (advance_root TRUNCATES survivors to whatever capacity remains
    after reserving a full decision's expansions — see
    mcts._advance_root, so smaller capacities stay correct and merely
    retain less of the reused subtree)."""
    return 2 * simulations + batch_size + 2


def _empty_tree(capacity: int, size: int) -> Tree:
    a = size * size + 1
    return Tree(
        root_board=jnp.zeros((size, size, engine.NUM_PLANES), jnp.int8),
        node_stones=jnp.zeros((capacity, size, size), jnp.int8),
        node_side=jnp.zeros((capacity,), jnp.int8),
        node_P=jnp.zeros((capacity, a), jnp.float32),
        node_legal=jnp.zeros((capacity, a), bool),
        child_N=jnp.zeros((capacity, a), jnp.int32),
        child_W=jnp.zeros((capacity, a), jnp.float32),
        child_idx=jnp.full((capacity, a), -1, jnp.int32),
        parent=jnp.zeros((capacity,), jnp.int32),
        parent_action=jnp.full((capacity,), -1, jnp.int32),
        n_nodes=jnp.asarray(1, jnp.int32),
        root_N=jnp.asarray(0, jnp.int32),
        root_W=jnp.asarray(0.0, jnp.float32),
    )


def _new_tree(policy, board, legal, capacity: int, noise, epsilon: float) -> Tree:
    """Fresh tree rooted at `board` with root priors from `policy`.

    Mirrors reference new_tree/new_subtree (play.py:376-421): priors are
    the raw policy (no renormalization after masking); when `noise` is
    given (self-play), root priors are (1-eps)*p + eps*Dirichlet over
    the full action vector (play.py:399-403).  Illegal actions keep a
    prior slot but are excluded from selection by node_legal.
    """
    size = board.shape[-3]
    tree = _empty_tree(capacity, size)
    p = policy
    if noise is not None:
        p = (1.0 - epsilon) * p + epsilon * noise
    return tree._replace(
        root_board=board.astype(jnp.int8),
        node_stones=tree.node_stones.at[0].set(engine.signed_stones(board)),
        node_side=tree.node_side.at[0].set(board[0, 0, 16].astype(jnp.int8)),
        node_P=tree.node_P.at[0].set(p),
        node_legal=tree.node_legal.at[0].set(legal),
    )


def new_tree_batch(policies, boards, capacity: int, rng=None,
                   dirichlet_alpha: float = 0.03, epsilon: float = 0.25) -> Tree:
    """Create B fresh trees; `rng` enables root Dirichlet noise (self-play)."""
    b = boards.shape[0]
    a = policies.shape[-1]
    legal = ~engine.illegal_moves_mask_batch(boards)
    if rng is not None:
        noise = jax.random.dirichlet(
            rng, jnp.full((a,), dirichlet_alpha, jnp.float32), (b,))
        return jax.vmap(
            lambda p, bd, lg, nz: _new_tree(p, bd, lg, capacity, nz, epsilon))(
            policies, boards, legal, noise)
    return jax.vmap(lambda p, bd, lg: _new_tree(p, bd, lg, capacity, None, epsilon))(
        policies, boards, legal)

"""Batched MCTS with the reference's frontier-batched search semantics.

Replicates reference ``simulate`` (self_play.py:28-120) on array trees:

1. descend from the root along the top-1 PUCT chain to the frontier —
   the first node whose best child is unexpanded (self_play.py:30-33 +
   the tail recursion at :117-120);
2. take the top-k PUCT actions AT the frontier (play.py:337-352);
3. walk each action through already-expanded children via top-1 PUCT
   (play.py:325-335, self_play.py:45-62) to its unexpanded leaf edge;
4. evaluate all k leaf boards in ONE batched network call
   (self_play.py:70) — across B games that's a single (B*k) device
   batch, which is what dissolves the reference's prediction-queue
   process layer (predicting_queue_worker.py);
5. expand each leaf (new_subtree, self_play.py:105) and back up
   count/value along its path (self_play.py:84-92,108-116).

PUCT: u = c_puct * P * sqrt(sum_b N_b) / (1 + N_a), score = Q + u with
Q = W/N (0 when unvisited), ties broken toward the lower action index —
matching the reference's stable insertion-ordered sort.

Value perspective: by default (negamax=False) values are backed up in
the ROOT player's perspective without per-level sign flips, exactly as
the reference does (self_play.py:100-116; pinned by its MCTS unit
tests).  negamax=True is the game-theoretically-standard AlphaZero
backup, available for strength-oriented configs.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search.tree import Tree


# capacity cutoff for the one-hot-matmul gather: the matmul reads all C
# table rows, so past some capacity the native gather's sparse reads win
# (A/B-tunable; see _take_rows_mxu docstring for the measurement)
_MXU_GATHER_MAX_ROWS = 4096

# separate cutoff for the matmul ancestor-chain hops in leaf_features
# (independently A/B-toggleable; same all-C-rows-read argument)
_MXU_CHAIN_MAX_ROWS = 4096


def _take_rows_mxu(table, idx):
    """Row gather as a one-hot matmul on the MXU: (B, C, R) table,
    (B, G) indices -> (B, G, R).

    Why: XLA lowers take_along_axis on the int8 stone/plane tables to a
    kCustom gather whose 81-byte rows each touch a full (8,128)x(4,1)
    tile — measured 3.6 ms for the (2048, 82, 81)-by-112-rows gather of
    the 9x9 bench round (41.7% of the round is such gathers,
    PROFILE_9x9.md) — while the equivalent one-hot matmul is a few
    GFLOP on a ~200 TFLOPS MXU reading the table linearly.

    Exact: the one-hot row has a single 1, so each output element is a
    single product — no accumulation, any dtype round-trips exactly
    (stone/plane values are {-1, 0, 1}).  Only worth it for small
    capacities (the matmul reads all C rows); large-C tables fall back
    to the native gather.
    """
    b, c = table.shape[0], table.shape[1]
    if c > _MXU_GATHER_MAX_ROWS or not jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.take_along_axis(
            table, idx.reshape(b, -1, *([1] * (table.ndim - 2))), axis=1)
    rows = table.reshape(b, c, -1)
    oh = (idx[..., None] == jnp.arange(c, dtype=idx.dtype)).astype(jnp.bfloat16)
    out = jnp.einsum("bgc,bcr->bgr", oh, rows.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(b, idx.shape[1], *table.shape[2:])


def _puct_scores_all(tree: Tree, c_puct: float):
    """(C, A) PUCT score table for EVERY node at once.

    PUCT per node row: u = c_puct * P * sqrt(sum_b N_b) / (1 + N_a),
    score = Q + u with Q = W/N (0 unvisited), illegal -> -inf.  The
    whole-table form exists because the tree is FROZEN during a round's
    leaf collection, so one vectorized pass replaces the per-iteration
    row gathers the descent while-loops used to issue (the two descent
    loops + their (C, A)-table layout copies were ~11% of a search
    round's device time, PROFILE_9x9.md)."""
    cn = tree.child_N.astype(jnp.float32)
    total = jnp.sqrt(jnp.sum(cn, axis=1, keepdims=True))
    total = jnp.where(total == 0, 1.0, total)
    q = jnp.where(cn > 0, tree.child_W / jnp.maximum(cn, 1.0), 0.0)
    u = c_puct * tree.node_P * total / (1.0 + cn)
    return jnp.where(tree.node_legal, q + u, -jnp.inf)


# capacity cutoff for the matrix-squaring descent: squaring a (C, C)
# one-hot is O(C^3 log C) MXU work — a rounding error at 9x9-class
# capacities, prohibitive at 19x19-class (C=2218: ~4 TFLOP per round)
# where the while-loop descent is noise under the 20-block network
_MXU_DESCENT_MAX_ROWS = 512

# capacity cutoff for the transitive-closure backup (same O(C^2)-memory
# squaring argument as the descent; the while-loop backup stays the
# 19x19-class path).  Requires static expansion slots (slot_base).
_CLOSURE_BACKUP_MAX_ROWS = 512

# matmul precision of the re-rooting compaction (see _advance_root).
# HIGHEST, deliberately: the A/B (scripts/ab_microsteps.py) measured
# Precision.HIGH as SLOWER on v5e (47.6 vs 44.0 ms isolated) and NOT
# bit-equal (bf16x3 does not split every f32 exactly) — the 6-pass
# cost is not what bounds re-rooting, its layout work is
_COMPACT_PRECISION = lax.Precision.HIGHEST


def _signed_reach(parent, negamax: bool):
    """(C, C) ancestor-or-self matrix M by permutation squaring:
    M[c, d] = 1 if d is an ancestor of c or c itself, else 0 — signed
    by (-1)^(depth(c) - depth(d)) when `negamax` (each parent hop
    contributes a factor -1, exactly the per-level value flip of the
    negamax backup).

    Exactness: parent chains are unique paths, so every nonzero entry
    of M@M is a same-sign multiplicity (< C, exact in the f32
    accumulator); jnp.sign renormalizes to {-1, 0, 1} (exact in bf16)
    after each squaring.  Row 0's hop is removed (the parent[0] == 0
    self-loop would create longer root walks of alternating sign and
    cancel entries in the signed case).

    PRECONDITION: acyclic tree with parent slots < child slots (same
    invariant as _collect_leaves_squaring; checked by
    tree_debug.check_consistency)."""
    c = parent.shape[0]
    iota = jnp.arange(c, dtype=jnp.int32)
    hop = (parent[:, None] == iota[None, :]) & (iota[:, None] != 0)
    sign = -1.0 if negamax else 1.0
    m = (jnp.eye(c, dtype=jnp.float32)
         + sign * hop.astype(jnp.float32)).astype(jnp.bfloat16)
    for _ in range(max(1, math.ceil(math.log2(max(c, 2))))):
        m = jnp.sign(lax.dot_general(
            m, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    return m


def _puct_scores(tree: Tree, n, c_puct: float):
    cn = tree.child_N[n].astype(jnp.float32)
    total = jnp.sqrt(jnp.sum(cn))
    total = jnp.where(total == 0, 1.0, total)
    q = jnp.where(cn > 0, tree.child_W[n] / jnp.maximum(cn, 1.0), 0.0)
    u = c_puct * tree.node_P[n] * total / (1.0 + cn)
    return jnp.where(tree.node_legal[n], q + u, -jnp.inf)


def _find_frontier(tree: Tree, c_puct: float):
    """First node along the top-1 PUCT chain whose best child is unexpanded."""

    def cond(state):
        return ~state[1]

    def body(state):
        n, _ = state
        a = jnp.argmax(_puct_scores(tree, n, c_puct)).astype(jnp.int32)
        c = tree.child_idx[n, a]
        return jnp.where(c < 0, n, c), c < 0

    n, _ = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return n


def _walk_to_leaf(tree: Tree, p, a, c_puct: float):
    """Descend through expanded children via top-1 PUCT until the edge
    (p, a) has no expanded child; that's the leaf to expand."""

    def cond(state):
        return ~state[2]

    def body(state):
        p, a, _ = state
        c = tree.child_idx[p, a]
        stop = c < 0
        cc = jnp.maximum(c, 0)
        a2 = jnp.argmax(_puct_scores(tree, cc, c_puct)).astype(jnp.int32)
        return (
            jnp.where(stop, p, cc),
            jnp.where(stop, a, a2),
            stop,
        )

    p, a, _ = lax.while_loop(cond, body, (p, a, jnp.asarray(False)))
    return p, a


def _collect_leaves_squaring(tree: Tree, k: int, c_puct: float):
    """Small-capacity descent by PERMUTATION-MATRIX SQUARING: with the
    tree frozen, each node's top-1 PUCT move is a static table best[n],
    so the reference's recursive descent (self_play.py:30-33, 45-62) is
    iterated application of g(n) = child_idx[n, best[n]] (parking at n
    when that child is unexpanded).  g as a (C, C) one-hot matrix P
    composes by matmul: P <- P @ P doubles the chase length, so
    ceil(log2(C)) MXU squarings reach every node's fixpoint at once.
    P stays exactly one-hot under squaring (function composition), so
    0/1 entries are exact in bf16 and fix = P @ iota is exact in the
    f32 accumulator.  The frontier is fix[0]; the top-k frontier
    actions' leaves are the edges (fix[c], best[fix[c]]) for expanded
    children c — exactly the old per-action top-1 walk, since both
    follow the same frozen best-chain.

    Why not gather-based pointer doubling (fix <- fix[fix]): TPU
    per-element dynamic gathers are latency-bound — measured 2.0 ms
    PER DOUBLING on the (3072, 82) table (~8 ns/element), 7x that lost
    the whole rework; the squaring runs the same chase as a few
    batched 82x82 matmuls.

    PRECONDITION (load-bearing): the tree is acyclic with children at
    strictly LARGER slot indices than their parent — child slots are
    allocated after their parents in _expand_backup and _advance_root's
    compaction is topological (parents first), so g is strictly
    increasing where it moves and every chase reaches its fixpoint
    within C-1 hops < 2^ceil(log2 C) squarings.  A future slot
    allocator that breaks parent<child (e.g. slot reuse) would make
    some chases cycle and this fixpoint argument silently wrong —
    check_consistency in tree_debug.py asserts the invariant."""
    scores = _puct_scores_all(tree, c_puct)                # (C, A)
    best = jnp.argmax(scores, axis=1).astype(jnp.int32)    # ties -> low action
    c, a_dim = scores.shape
    iota = jnp.arange(c, dtype=jnp.int32)
    # nxt[n] = child_idx[n, best[n]] as a compare+reduce (a (C, A) row
    # select lowers to another latency-bound per-element gather)
    nxt = jnp.sum(jnp.where(jnp.arange(a_dim, dtype=jnp.int32)[None, :]
                            == best[:, None], tree.child_idx, 0), axis=1)
    g = jnp.where(nxt < 0, iota, nxt)
    perm = (g[:, None] == iota[None, :]).astype(jnp.bfloat16)
    for _ in range(max(1, math.ceil(math.log2(max(c, 2))))):
        perm = (lax.dot_general(
            perm, perm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) > 0).astype(jnp.bfloat16)
    fix = lax.dot_general(
        perm, iota.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    f = fix[0]

    # Row/element selects as compare+reduce (each picks exactly one
    # entry, so the masked max/sum IS that entry — exact for floats and
    # ints alike): under the B-vmap these were five (B, k)-shaped
    # per-element gathers at ~8 ns/element (the same latency wall as
    # the pointer-doubling descent this function replaced).
    f_oh = iota == f                                            # (C,)
    fscores = jnp.max(jnp.where(f_oh[:, None], scores, -jnp.inf), axis=0)
    actions = jnp.argsort(-fscores)[:k].astype(jnp.int32)  # stable: ties -> low action
    act_oh = actions[:, None] == jnp.arange(a_dim, dtype=jnp.int32)[None, :]
    sel = jnp.sum(jnp.where(act_oh, fscores[None, :], 0.0), axis=1)
    active = sel > -jnp.inf
    row_ci = jnp.max(jnp.where(f_oh[:, None], tree.child_idx, -2), axis=0)
    ch = jnp.sum(jnp.where(act_oh, row_ci[None, :], 0), axis=1)   # (k,)
    t_oh = jnp.maximum(ch, 0)[:, None] == iota[None, :]           # (k, C)
    tgt = jnp.sum(jnp.where(t_oh, fix[None, :], 0), axis=1)
    b_oh = tgt[:, None] == iota[None, :]
    best_tgt = jnp.sum(jnp.where(b_oh, best[None, :], 0), axis=1)
    leaf_p = jnp.where(ch < 0, f, tgt)
    leaf_a = jnp.where(ch < 0, actions, best_tgt)
    return leaf_p, leaf_a, active


def _collect_leaves(tree: Tree, k: int, c_puct: float):
    """Phase 1 of a round: pick k leaf edges (boards are stepped in one
    batched call outside the per-game vmap — see simulate_round).
    Implementation chosen statically by capacity (see
    _collect_leaves_squaring)."""
    if tree.parent.shape[0] <= _MXU_DESCENT_MAX_ROWS:
        return _collect_leaves_squaring(tree, k, c_puct)
    f = _find_frontier(tree, c_puct)
    scores = _puct_scores(tree, f, c_puct)
    actions = jnp.argsort(-scores)[:k].astype(jnp.int32)  # stable: ties -> low action
    active = scores[actions] > -jnp.inf
    leaf_p, leaf_a = jax.vmap(lambda a: _walk_to_leaf(tree, f, a, c_puct))(actions)
    return leaf_p, leaf_a, active


def _expand_backup(tree: Tree, leaf_p, leaf_a, leaf_stones, leaf_side,
                   active, policies, values, legal, negamax: bool,
                   slot_base=None):
    """Phase 3: allocate nodes for the k leaves, set priors/legality,
    wire child pointers, and back up values along each path.

    slot_base: when given (a batch-uniform scalar — run_search passes
    ``capacity - simulations + round*k``), the k new nodes land at
    ``[slot_base, slot_base + k)`` via contiguous dynamic-update-slices
    instead of per-game scatters at ``n_nodes``.  A uniform offset turns
    six (B, k)-row scatters into plain strided stores — the expansion
    scatters plus the node-table layout copies they forced were ~12% of
    a search round's device time (PROFILE_9x9.md).  Valid because every
    production caller reserves exactly ``simulations`` slots at
    re-rooting time (advance_root truncates survivors to
    ``capacity - reserve``), so ``[capacity - simulations, capacity)``
    is free in every tree regardless of its survivor count."""
    k = leaf_p.shape[0]
    if slot_base is None:
        base = tree.n_nodes
        slots = base + jnp.arange(k, dtype=jnp.int32)
        node_stones = tree.node_stones.at[slots].set(leaf_stones)
        node_side = tree.node_side.at[slots].set(leaf_side)
        node_P = tree.node_P.at[slots].set(policies)
        node_legal = tree.node_legal.at[slots].set(legal & active[:, None])
        parent = tree.parent.at[slots].set(jnp.where(active, leaf_p, 0))
        parent_action = tree.parent_action.at[slots].set(
            jnp.where(active, leaf_a, -1))
        n_nodes = tree.n_nodes + k
    else:
        base = jnp.asarray(slot_base, jnp.int32)
        slots = base + jnp.arange(k, dtype=jnp.int32)
        dus = lax.dynamic_update_slice
        z = jnp.asarray(0, jnp.int32)
        node_stones = dus(tree.node_stones, leaf_stones, (base, z, z))
        node_side = dus(tree.node_side, leaf_side, (base,))
        node_P = dus(tree.node_P, policies, (base, z))
        node_legal = dus(tree.node_legal, legal & active[:, None], (base, z))
        parent = dus(tree.parent, jnp.where(active, leaf_p, 0), (base,))
        parent_action = dus(tree.parent_action,
                            jnp.where(active, leaf_a, -1), (base,))
        n_nodes = base + k
    child_idx = tree.child_idx.at[leaf_p, leaf_a].set(
        jnp.where(active, slots, tree.child_idx[leaf_p, leaf_a]))

    # value sign: reference self_play.py:100-102 — leaf value is flipped
    # into the root player's perspective by comparing side-to-move.
    root_player = tree.node_side[0]
    leaf_player = leaf_side
    v = values.reshape(k)
    if negamax:
        # edge value from the perspective of the mover at the edge's parent
        init_vals = -v
    else:
        init_vals = jnp.where(leaf_player == root_player, v, -v)

    cdim = parent.shape[0]
    if slot_base is not None and cdim <= _CLOSURE_BACKUP_MAX_ROWS:
        # CLOSURE BACKUP: the while-loop climb (max-depth iterations of
        # (k,)-wide scatter-adds + parent gathers — the 'while' + part
        # of the gather/fusion HLO categories, ~7-10% of a 9x9 round,
        # PROFILE_9x9.md) collapses into one reachability matrix.  The
        # loop adds (1, val*(-1)^d in negamax, else val) to the edge
        # into every ancestor x of the new leaf slot s (d = depth(s) -
        # depth(x)); node-centric that is dN[x] = sum_l |M[s_l, x]|,
        # dV[x] = sum_l val_l * M[s_l, x] with M the (signed) ancestor
        # matrix — then ONE C-wide scatter puts the node deltas on the
        # edges (parent[x], parent_action[x]).  Addend sets per edge are
        # identical to the loop's; only f32 summation order differs.
        # Requires static slots: the new leaves sit at
        # [slot_base, slot_base + k), so their M rows are a contiguous
        # static slice.
        rows = lax.dynamic_slice(
            _signed_reach(parent, negamax),
            (base, jnp.asarray(0, jnp.int32)), (k, cdim)
        ).astype(jnp.float32)                                   # (k, C)
        act_f = active.astype(jnp.float32)
        vals_m = jnp.where(active, init_vals, 0.0)
        d_n = jnp.sum(act_f[:, None] * jnp.abs(rows), axis=0)   # (C,)
        d_v = jnp.sum(vals_m[:, None] * rows, axis=0)           # (C,)
        # root (parent_action -1) and inactive slots route to an
        # out-of-bounds column and are dropped (negative indices would
        # WRAP under numpy semantics)
        a_dim = tree.child_N.shape[1]
        pa = jnp.where(parent_action < 0, a_dim, parent_action)
        cn = tree.child_N.at[parent, pa].add(
            d_n.astype(jnp.int32), mode="drop")
        cw = tree.child_W.at[parent, pa].add(d_v, mode="drop")
        rn = tree.root_N + jnp.sum(active.astype(jnp.int32))
        # negamax: the loop's root deposit is the depth-1 ancestor's
        # value = val*(-1)^(depth(s)-1) = -val*M[s, 0]
        rw = tree.root_W + (-d_v[0] if negamax else d_v[0])
        return tree._replace(
            node_stones=node_stones, node_side=node_side,
            node_P=node_P, node_legal=node_legal,
            child_N=cn, child_W=cw, child_idx=child_idx,
            parent=parent, parent_action=parent_action,
            n_nodes=n_nodes, root_N=rn, root_W=rw,
        )

    # All k leaves climb to the root in lockstep: one (k,)-wide
    # scatter-add per tree level instead of k sequential walks
    # (max-depth iterations, not sum-of-depths — the dominant cost of a
    # search round on TPU).  Additive updates commute, so this matches
    # the reference's sequential per-leaf backup exactly
    # (self_play.py:84-92,108-116).
    def cond(st):
        return jnp.any(st[0])

    def body(st):
        alive, p, a, val, cn, cw, rn, rw = st
        inc = alive.astype(jnp.int32)
        cn = cn.at[p, a].add(inc, mode="drop")
        cw = cw.at[p, a].add(jnp.where(alive, val, 0.0), mode="drop")
        at_root = alive & (p == 0)
        # reference backs the same value into the (parentless) root node
        # too (self_play.py:108-116); in negamax mode the root-edge value
        # IS the root-perspective value (one flip past the edge, flipped
        # back — see the scalar derivation in git history).
        rn = rn + jnp.sum(at_root.astype(jnp.int32))
        rw = rw + jnp.sum(jnp.where(at_root, val, 0.0))
        nval = -val if negamax else val
        return (alive & ~at_root, parent[p], parent_action[p], nval,
                cn, cw, rn, rw)

    st = (active, leaf_p, leaf_a, init_vals,
          tree.child_N, tree.child_W, tree.root_N, tree.root_W)
    _, _, _, _, cn, cw, rn, rw = lax.while_loop(cond, body, st)

    return tree._replace(
        node_stones=node_stones, node_side=node_side,
        node_P=node_P, node_legal=node_legal,
        child_N=cn, child_W=cw, child_idx=child_idx,
        parent=parent, parent_action=parent_action,
        n_nodes=n_nodes, root_N=rn, root_W=rw,
    )


def _draw_symmetry(rng, num_symmetries: int):
    """One D4 symmetry id per network call (reference
    random_symmetry_predict symmetry.py:127-132 draws a single transform
    per predict).  Module-level so tests can pin a fixed transform."""
    return jax.random.randint(rng, (), 0, num_symmetries)


def _draw_symmetry_batch(rng, num_symmetries: int, b: int):
    """One D4 symmetry id PER GAME (per_game_symmetry mode).  Module-
    level so tests can pin a fixed transform."""
    return jax.random.randint(rng, (b,), 0, num_symmetries)


def leaf_features(trees: Tree, leaf_p, leaf_stones, leaf_side, sym=None):
    """(B, k, N, N, 17) int8: reconstruct the reference 17-plane feature
    stack for each leaf from its ancestor chain of stone grids, falling
    back to the tree root's stored history planes past the root.

    Exactness: plane pair j of a position holds (the position's OWN
    side, its opponent) stones j positions ago — the history shift plus
    player swap re-express every pair in the new mover's colors each
    step (play.py:226-242,295-299 with SWAP_INDEX play.py:15).  So
    along the ancestor chain the pair for offset j is simply
    (stones == s, stones == -s) with s = leaf_side, and past the root
    (offset j = m + q where m = first chain step that hits the root
    slot) the root's pair q applies with its planes swapped iff m is
    odd (root side r = s * (-1)^m).  Verified bit-for-bit against
    engine.step chains in tests/test_mcts.py.

    Layout: everything runs on flat-spatial rows so the whole
    reconstruction is two row-gathers (ancestor stones from the node
    table, history pairs from the transposed root planes) plus
    elementwise compares — gathering full (N*N,) rows is the
    TPU-friendly gather shape; per-element plane gathers are ~5x
    slower (measured).

    `sym`: optional traced D4 symmetry id — a scalar (one transform for
    the whole batch, static-permutation switch) or a (B,) vector (one
    per game, dynamic gather; see simulate_round per_game_symmetry).
    The spatial permutation is applied to the (small) SOURCE grids —
    node-stone table, root planes, leaf grids — instead of the
    assembled feature tensor, so the random-symmetry evaluation costs
    ~1/4 of a post-hoc gather of the (B*k, N, N, 17) features.  The
    caller inverse-permutes the policy (symmetry.inverse_policy_switch
    / inverse_policy_batch).
    """
    b, k = leaf_p.shape
    n = leaf_stones.shape[-1]
    nn = n * n
    c = trees.node_stones.shape[1]

    leaf_flat = leaf_stones.reshape(b, k, nn)
    node_flat = trees.node_stones.reshape(b, c, nn)
    # (B, 17, nn): plane-major so history pairs gather as contiguous rows
    root_t = jnp.swapaxes(trees.root_board.reshape(b, nn, 17), 1, 2)
    if sym is not None:
        if jnp.ndim(sym) == 0:
            from sejonggo_tpu.goenv.symmetry import transform_flat_switch

            leaf_flat = transform_flat_switch(leaf_flat, sym, n)
            node_flat = transform_flat_switch(node_flat, sym, n)
            root_t = transform_flat_switch(root_t, sym, n)
        else:
            from sejonggo_tpu.goenv.symmetry import transform_flat_pergame

            leaf_flat = transform_flat_pergame(leaf_flat, sym, n)
            node_flat = transform_flat_pergame(node_flat, sym, n)
            root_t = transform_flat_pergame(root_t, sym, n)

    # ancestor chain a_j (j = 1..7): leaf's parent node, grandparent, ...
    # (parent[0] == 0, so the chain parks at the root slot)
    if c <= _MXU_CHAIN_MAX_ROWS:
        # one-hot matmul hops: the 7 parent chases are DEPENDENT
        # per-element gathers (~8 ns/element on this chip — a few ms
        # per round at B=3072, the biggest slice of the gather HLO
        # category).  As one-hot rows they are k x C @ C x C matmuls:
        # cur stays exactly one-hot (each hop row of the parent matrix
        # is one-hot, products/sums exact in bf16/f32), the root
        # self-loop parks chains like the gather did, and the stone
        # rows come out of the same matmul pipeline.
        iota_c = jnp.arange(c, dtype=jnp.int32)
        poh = (trees.parent[:, :, None] == iota_c[None, None, :]
               ).astype(jnp.bfloat16)                       # (B, C, C)
        cur = (leaf_p[:, :, None] == iota_c[None, None, :]
               ).astype(jnp.bfloat16)                       # (B, k, C)
        hops, hits = [], []
        for _ in range(7):
            hops.append(cur)
            hits.append(cur[:, :, 0] > 0.5)                 # at root?
            cur = jnp.einsum("bkc,bcd->bkd", cur, poh,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
        hit = jnp.stack(hits, axis=2)                       # (B, k, 7)
        # LEAF-major row order (leaf*7 + hop): the gathered stone rows
        # then reshape straight to (B, k, 7, nn).  The earlier
        # hop-major concat needed a post-einsum (B,7,k,nn)->(B,k,7,nn)
        # transpose plus a relayout of the (B, 7k, C) one-hot — ~1.2
        # ms/move of pure copies at the 9x9 bench point
        # (runs/trace_move_r5.log, copy.1544/1681/1545/1682)
        chain_oh = jnp.stack(hops, axis=2).reshape(b, k * 7, c)
        chain = jnp.einsum("bgc,bcr->bgr", chain_oh,
                           node_flat.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int8)
        chain = chain.reshape(b, k, 7, nn)
    else:
        idx = leaf_p
        chain_idx = []
        for _ in range(7):
            chain_idx.append(idx)
            idx = jnp.take_along_axis(trees.parent, idx, axis=1)
        a = jnp.stack(chain_idx, axis=2)  # (B, k, 7)
        hit = a == 0
        chain = _take_rows_mxu(node_flat, a.reshape(b, k * 7))
        chain = chain.reshape(b, k, 7, nn)

    # m = first chain step that is the root slot (8 = never within 7)
    m = jnp.where(hit.any(axis=2), 1 + jnp.argmax(hit, axis=2), 8)
    m = m.astype(jnp.int32)[:, :, None]  # (B, k, 1)

    jr = jnp.arange(1, 8, dtype=jnp.int32)[None, None, :]  # pair offset
    onchain = jr <= m                                       # (B, k, 7)
    q = jr - m                                              # root pair
    sw = m % 2
    own_pi = jnp.clip(2 * q + sw, 0, 15)
    opp_pi = jnp.clip(2 * q + 1 - sw, 0, 15)
    pidx = jnp.stack([own_pi, opp_pi], axis=-1).reshape(b, k * 14)
    rows = _take_rows_mxu(root_t, pidx)
    rows = rows.reshape(b, k, 7, 2, nn)

    s = leaf_side[:, :, None].astype(jnp.int8)              # (B, k, 1)
    oc = onchain[..., None]                                 # (B, k, 7, 1)
    s4 = s[:, :, None, :]
    own = jnp.where(oc, chain == s4, rows[:, :, :, 0] == 1)
    opp = jnp.where(oc, chain == -s4, rows[:, :, :, 1] == 1)

    planes = [leaf_flat == s, leaf_flat == -s]
    for j in range(7):
        planes.append(own[:, :, j])
        planes.append(opp[:, :, j])
    feats = jnp.stack(planes, axis=-1).astype(jnp.int8)     # (B, k, nn, 16)
    side_plane = jnp.broadcast_to(s[..., None], (b, k, nn, 1)).astype(jnp.int8)
    feats = jnp.concatenate([feats, side_plane], axis=-1)
    return feats.reshape(b, k, n, n, 17)


def simulate_round(trees: Tree, predict_fn: Callable, rng, *, batch_size: int,
                   c_puct: float = 1.0, negamax: bool = False,
                   use_symmetry: bool = False,
                   per_game_symmetry: bool = False, slot_base=None):
    """One search round over a batch of B trees: one network call and
    one batched env step for all B*k leaves.

    per_game_symmetry: each GAME draws its own D4 transform per round
    (dynamic per-row gather) instead of one shared transform per round
    (static-permutation switch).  The shared draw is the self-play fast
    path (games are already decorrelated by per-game Dirichlet noise);
    evaluation games have NO other stochasticity — greedy decisions, no
    noise — so a shared stream collapses a whole eval batch into 2
    distinct games (one per color) and gate winrates quantize to the
    color split.  The reference avoids this implicitly: every game
    process calls random_symmetry_predict with its own RNG
    (symmetry.py:127-132), which is exactly per-game symmetry."""
    k = batch_size
    leaf_p, leaf_a, active = jax.vmap(
        partial(_collect_leaves, k=k, c_puct=c_puct))(trees)
    b = leaf_p.shape[0]
    n = trees.node_stones.shape[-1]

    # step all leaves + legality in one fused batched call on compact
    # stone grids — this is ~98% of the env's flood work at typical
    # sims/batch settings; with ops.gostep enabled the whole
    # place/capture/suicide/ko/liberty sequence runs as one
    # VMEM-resident Pallas kernel (engine.step_and_illegal_stones_batch)
    parent_stones = _take_rows_mxu(trees.node_stones, leaf_p)
    parent_side = _take_rows_mxu(
        trees.node_side[:, :, None], leaf_p)[:, :, 0]
    flat_stones, flat_illegal = engine.step_and_illegal_stones_batch(
        parent_stones.reshape(b * k, n, n),
        parent_side.reshape(-1), leaf_a.reshape(-1))
    leaf_side = (-parent_side).astype(jnp.int8)
    leaf_stones = flat_stones.reshape(b, k, n, n)
    legal = (~flat_illegal).reshape(b, k, -1)

    # the random D4 symmetry (reference random_symmetry_predict,
    # symmetry.py:127-132) is fused into the feature reconstruction:
    # the spatial permutation rides the (small) source grids inside
    # leaf_features instead of a post-hoc gather of the full (B*k, N,
    # N, 17) tensor; only the policy needs the inverse permutation
    sym = None
    if use_symmetry:
        from sejonggo_tpu.goenv.symmetry import (NUM_REFERENCE_SYMMETRIES,
                                                 inverse_policy_batch,
                                                 inverse_policy_switch)

        if per_game_symmetry:
            sym = _draw_symmetry_batch(rng, NUM_REFERENCE_SYMMETRIES, b)
        else:
            sym = _draw_symmetry(rng, NUM_REFERENCE_SYMMETRIES)
    feats = leaf_features(trees, leaf_p, leaf_stones, leaf_side, sym=sym)
    flat_feats = feats.reshape(b * k, n, n, 17)
    policies, values = predict_fn(flat_feats)
    if sym is not None:
        if jnp.ndim(sym) == 0:
            policies = inverse_policy_switch(policies, sym)
        else:
            policies = inverse_policy_batch(policies, jnp.repeat(sym, k))
    policies = policies.reshape(b, k, -1)
    values = values.reshape(b, k)
    return jax.vmap(
        partial(_expand_backup, negamax=negamax, slot_base=slot_base))(
        trees, leaf_p, leaf_a, leaf_stones, leaf_side, active, policies,
        values, legal)


def run_search(trees: Tree, predict_fn: Callable, rng, *, simulations: int,
               batch_size: int, c_puct: float = 1.0, negamax: bool = False,
               use_symmetry: bool = False, per_game_symmetry: bool = False):
    """simulations/batch_size rounds (reference mcts_decision
    self_play.py:128-132).

    Few rounds are UNROLLED: freeing XLA from the fori_loop's uniform
    loop-carried buffer layout lets it fuse/overlap across round
    boundaries — measured 212ms -> 155ms for the 4-round 9x9 bench
    point on v5e.  Many-round configs (19x19: 16 rounds of a 20-block
    net) keep the fori_loop to bound compile time; they are
    network-dominated, where the loop overhead is noise.
    """
    rounds = simulations // batch_size

    # Uniform static expansion slots: every production caller reserves
    # `simulations` slots at re-rooting (advance_root truncates
    # survivors to capacity - reserve), so round r's k expansions can
    # always land at capacity - simulations + r*k — the same offset in
    # every tree of the batch, which turns the six expansion scatters
    # into contiguous stores (see _expand_backup).  Falls back to
    # per-game dynamic allocation when the reserved region doesn't
    # exist (capacity <= simulations can't happen via tree_capacity,
    # but direct simulate_round users build such trees in tests).
    capacity = trees.node_stones.shape[1]
    base0 = capacity - simulations if isinstance(simulations, int) else None
    if base0 is not None and base0 < 1:
        base0 = None

    # unrolling needs concrete Python ints (ADVICE r2: `rounds <= 8` /
    # `range(rounds)` fail on tracers); traced bounds take the fori_loop
    if isinstance(rounds, int) and rounds <= 8:
        for r in range(rounds):
            rng, sub = jax.random.split(rng)
            trees = simulate_round(
                trees, predict_fn, sub, batch_size=batch_size,
                c_puct=c_puct, negamax=negamax, use_symmetry=use_symmetry,
                per_game_symmetry=per_game_symmetry,
                slot_base=None if base0 is None else base0 + r * batch_size)
        return trees

    def body(r, carry):
        trees, rng = carry
        rng, sub = jax.random.split(rng)
        trees = simulate_round(
            trees, predict_fn, sub, batch_size=batch_size, c_puct=c_puct,
            negamax=negamax, use_symmetry=use_symmetry,
            per_game_symmetry=per_game_symmetry,
            slot_base=None if base0 is None else base0 + r * batch_size)
        return trees, rng

    trees, _ = lax.fori_loop(0, rounds, body, (trees, rng))
    return trees


def _decide(tree: Tree, greedy, rng):
    """Select the move at the root.

    temperature 1 (greedy=False): sample proportional to visit counts
    (reference self_play.py:138-149).  temperature 0 (greedy=True):
    lexicographic max over (count, mean_value, action) — largest action
    index wins ties, replicating reference self_play.py:151.
    """
    counts = tree.child_N[0]
    a = counts.shape[0]
    logits = jnp.where(counts > 0, jnp.log(counts.astype(jnp.float32)), -jnp.inf)
    sampled = jax.random.categorical(rng, logits).astype(jnp.int32)

    c = jnp.where(tree.node_legal[0], counts, -1)
    maxc = jnp.max(c)
    m1 = c == maxc
    mean = jnp.where(counts > 0, tree.child_W[0] / jnp.maximum(counts, 1), 0.0)
    mv = jnp.where(m1, mean, -jnp.inf)
    m2 = m1 & (mv == jnp.max(mv))
    greedy_a = jnp.max(jnp.where(m2, jnp.arange(a, dtype=jnp.int32), -1))

    sampled = jnp.where(jnp.max(counts) > 0, sampled, greedy_a)
    return jnp.where(greedy, greedy_a, sampled)


def decide_batch(trees: Tree, greedy, rng):
    """greedy: (B,) bool — per-game temperature-0 flag."""
    b = greedy.shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(_decide)(trees, greedy, rngs)


def policy_target_batch(trees: Tree, mode: str = "prior"):
    """Training policy target from the root.

    'prior' replicates the reference exactly (self_play.py:203-205
    records the child PRIORS — including root Dirichlet noise — not
    visit counts); 'visits' is the AlphaZero-standard normalized count
    target.
    """
    legal = trees.node_legal[:, 0]
    if mode == "prior":
        return jnp.where(legal, trees.node_P[:, 0], 0.0)
    counts = jnp.where(legal, trees.child_N[:, 0], 0).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(counts, -1, keepdims=True), 1.0)
    return counts / total


def _keep_subtree_closure(parent, nr):
    """keep[i] = "nr is an ancestor of i (or i itself)" via transitive
    closure by repeated squaring of the parent one-hot relation on the
    MXU: R starts as (parent edge | identity) and R <- clamp(R @ R)
    doubles the reachable path length each step.  Entries are 0/1 after
    every clamp and intermediate sums are small integers (< C), all
    exact in bf16.  Right for SMALL capacities (9x9-class, C <= ~512)
    where per-element pointer-chasing is latency-bound and slower
    (measured on v5e at C=146)."""
    c = parent.shape[0]
    idxs = jnp.arange(c, dtype=jnp.int32)
    par_oh = (parent[:, None] == idxs[None, :]) | (
        idxs[:, None] == idxs[None, :])
    reach = par_oh.astype(jnp.bfloat16)
    for _ in range(max(1, math.ceil(math.log2(max(c, 2))))):
        reach = (jax.lax.dot_general(
            reach, reach, (((1,), (0,)), ((), ()))) > 0).astype(jnp.bfloat16)
    return reach[:, nr] > 0


def _keep_subtree_doubling(parent, nr):
    """Same mask via pointer doubling on the keep VECTOR:
    keep <- keep | keep[anc], anc <- anc[anc].  O(C log C) gather work
    instead of the closure's O(C^3 log C) MXU work (which computes the
    whole reachability matrix for a single used column) — the only
    viable choice at 19x19-class reuse capacities (at C=2218 the
    closure would be ~4 TFLOP per B=16 re-root).  Correctness: after t
    iterations keep covers ancestors within distance 2^t and anc jumps
    2^t levels (parent[0] == 0 parks chains at the root), so log2(C)
    iterations cover any chain."""
    c = parent.shape[0]
    keep = jnp.arange(c, dtype=jnp.int32) == nr
    anc = parent
    for _ in range(max(1, math.ceil(math.log2(max(c, 2))))):
        keep = keep | keep[anc]
        anc = anc[anc]
    return keep


def _advance_root(tree: Tree, action, new_root_board, reserve: int = 0):
    """Re-root the tree at child `action` (reference tree reuse,
    self_play.py:224-238: step into the chosen child and cut the
    parent), compacting surviving nodes to the front of the arrays.

    `new_root_board`: the full 17-plane board after playing `action`
    on the old root position (the caller has it — it IS the new game
    board).  Required because compact nodes store only stone grids;
    the re-rooted tree's feature/history source must be refreshed
    (see tree.Tree.root_board).

    Returns (tree, valid); when the child was never expanded valid is
    False and the caller must build a fresh tree (reference
    self_play.py:195-196).

    `reserve`: node slots the next decision will allocate (its
    simulation count).  The surviving subtree is TRUNCATED to fit
    ``capacity - reserve`` slots: survivors are kept in node-index
    order (index order is topological — children are always allocated
    after their parent and compaction preserves relative order, so any
    index prefix is a valid tree), and edges into dropped nodes revert
    to unexpanded (child_idx=-1) while KEEPING their visit/value stats,
    so the next decision's PUCT still sees them and re-expands on
    demand.  The reference's dict trees grow without bound
    (play.py:376-421); truncation is the fixed-capacity array tree's
    price, paid as loss of the deepest/latest-expanded statistics
    rather than (as before) wholesale invalidation of the reused tree.
    """
    c = tree.parent.shape[0]
    a_dim = tree.node_P.shape[-1]
    nn = tree.node_stones.shape[-1] * tree.node_stones.shape[-2]
    budget = c - reserve  # static
    new_root = tree.child_idx[0, action]
    valid = new_root >= 0 if budget >= 1 else jnp.asarray(False)
    nr = jnp.maximum(new_root, 0)

    idxs = jnp.arange(c, dtype=jnp.int32)
    # keep[i] = "nr is an ancestor of i (or i itself)"; implementation
    # chosen statically by capacity (see _keep_subtree_*)
    if c <= 512:
        keep = _keep_subtree_closure(tree.parent, nr)
    else:
        keep = _keep_subtree_doubling(tree.parent, nr)

    rank = (jnp.cumsum(keep) - 1).astype(jnp.int32)
    # truncate: the new root nr has the smallest surviving index (its
    # descendants were all allocated later), so it is always rank 0
    keep = keep & (rank < max(budget, 1))
    new_idx = rank
    n_new = jnp.sum(keep).astype(jnp.int32)
    live = idxs < n_new

    # Compaction runs on the MXU: each per-node payload table is
    # multiplied by the one-hot permutation matrix
    # P[new, old] = keep[old] & (rank[old] == new).  A one-hot matmul
    # selects exactly one term per output, so it is EXACT for every
    # carried value at 3-pass f32 precision (counts < 2^24, indices
    # < C, stones in {-1,0,1}, priors/values f32; bf16x3 splits an f32
    # mantissa exactly) — and it replaces the short-row gather +
    # argsort that dominated re-rooting cost on TPU.  PER-TABLE
    # matmuls, deliberately: the earlier single (C, ~5A) wide-concat
    # variant forced XLA to materialize one buffer whose slices feed
    # consumers with conflicting layouts — the concat plus THREE
    # full-table relayout copies of f32[B, C, 412] were ~4.5 ms/move
    # at the 9x9 bench point (runs/trace_move_r5.log, copy.1785-1787),
    # the single largest copy cluster of the whole move program.
    # Separate single-use GEMM outputs take their consumer's layout
    # straight from the matmul epilogue.  child_idx is RECONSTRUCTED
    # by scattering each live node into its parent's edge instead of
    # relabeling the whole (C, A) table through a per-element gather
    # (~10x the rest of re-rooting, measured).
    perm = (jnp.where(keep, rank, -1)[None, :] == idxs[:, None]).astype(
        jnp.float32)  # (C_new, C_old) one-hot rows

    def compact(table):
        return jax.lax.dot_general(
            perm, table, (((1,), (0,)), ((), ())),
            precision=_COMPACT_PRECISION)

    node_P = compact(tree.node_P)
    child_N = compact(tree.child_N.astype(jnp.float32)).astype(jnp.int32)
    child_W = compact(tree.child_W)
    node_legal = compact(tree.node_legal.astype(jnp.float32)) != 0
    node_stones = compact(
        tree.node_stones.reshape(c, nn).astype(jnp.float32)
    ).astype(jnp.int8).reshape(tree.node_stones.shape)
    scal = compact(jnp.stack([
        tree.node_side.astype(jnp.float32),
        tree.parent.astype(jnp.float32),
        tree.parent_action.astype(jnp.float32),
    ], axis=1))
    node_side = scal[:, 0].astype(jnp.int8)
    parent_old = scal[:, 1].astype(jnp.int32)
    pa = scal[:, 2].astype(jnp.int32)

    par = jnp.where(live, new_idx[parent_old], 0).at[0].set(0)
    pa = jnp.where(live, pa, -1).at[0].set(-1)

    # child_idx from (parent, action) of each live non-root node; edges
    # whose child was truncated stay -1 (stats above are kept, so the
    # next decision's PUCT still sees them and re-expands on demand)
    scatter_ok = live & (idxs > 0)
    ci = jnp.full((c, a_dim), -1, jnp.int32)
    ci = ci.at[jnp.where(scatter_ok, par, 0),
               jnp.where(scatter_ok, pa, a_dim)].set(idxs, mode="drop")

    out = Tree(
        root_board=new_root_board.astype(jnp.int8),
        node_stones=node_stones,
        node_side=node_side,
        node_P=jnp.where(live[:, None], node_P, 0.0),
        node_legal=node_legal & live[:, None],
        child_N=jnp.where(live[:, None], child_N, 0),
        child_W=jnp.where(live[:, None], child_W, 0.0),
        child_idx=ci,
        parent=par,
        parent_action=pa,
        n_nodes=jnp.maximum(n_new, 1),
        root_N=tree.child_N[0, action],
        root_W=tree.child_W[0, action],
    )
    return out, valid


def advance_root_batch(trees: Tree, actions, new_root_boards,
                       reserve: int = 0):
    """new_root_boards: (B, N, N, 17) — the game boards after playing
    `actions` (move_step computes them anyway)."""
    return jax.vmap(partial(_advance_root, reserve=reserve))(
        trees, actions, new_root_boards)

"""Batched michi-style RAVE MCTS (the reference's second, model-free engine).

Reference counterpart: the self-contained heuristic searcher in mcts1/
(tree_search.py, tree_node.py, go_heuristics.py) — UCB1-RAVE tree
policy (rave_urgency tree_node.py:91-98), expansion at EXPAND_VISITS
with heuristic priors (TreeNode.expand tree_node.py:22-89), heuristic
Monte-Carlo playouts (mcplayout tree_search.py:177-220,
gen_playout_moves :141-174) and early-stop thresholds
(tree_search.py:127-130).  The reference runs one scalar playout per
process in a multiprocessing pool (P7, SURVEY.md §2.2); here B trees
advance in lockstep — descent, expansion, playouts and RAVE updates are
all batched array programs, so the playout pool disappears into the
batch axis.

Tree layout: statistics live on EDGES (parent node, action) —
``edge_v/edge_w`` are the reference child node's v/w, ``edge_pv/
edge_pw`` its priors, ``edge_av/edge_aw`` its AMAF stats.  Node slots
(with stored boards) are allocated only when an edge reaches
``expand_visits`` — exactly the reference's leaf set.

Deliberate deviations (each pinned by tests):
- the reference expands a node mid-descent and keeps descending into
  it (tree_search.py:37-38); here the simulation that triggers the
  expansion starts its playout at the freshly expanded node;
- playout move suggestions are class-gated (whole capture/pat3 class
  kept with the reference's per-suggestion probability) and self-atari
  rejection filters the class rather than resampling per suggestion;
- tie-breaking among equal urgencies uses per-descent random jitter
  instead of list shuffling.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from sejonggo_tpu.config import MichiConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import heuristics as H


class MichiTree(NamedTuple):
    """One RAVE tree (batch via a leading axis on every field).

    C = node capacity, A = N*N+1 (last action = pass).
    """

    node_board: jnp.ndarray     # (C, N, N, 17) int8
    node_playable: jnp.ndarray  # (C, A) bool — legal non-eye moves (+pass)
    edge_pv: jnp.ndarray        # (C, A) f32 — prior visits
    edge_pw: jnp.ndarray        # (C, A) f32 — prior wins
    edge_v: jnp.ndarray         # (C, A) i32 — visits
    edge_w: jnp.ndarray         # (C, A) f32 — wins (for just-played)
    edge_av: jnp.ndarray        # (C, A) i32 — AMAF visits
    edge_aw: jnp.ndarray        # (C, A) f32 — AMAF wins
    child_idx: jnp.ndarray      # (C, A) i32 — child slot or -1
    n_nodes: jnp.ndarray        # () i32
    root_v: jnp.ndarray         # () i32
    root_w: jnp.ndarray         # () f32


# ---------------------------------------------------------------------------
# expansion: playable mask + heuristic priors (TreeNode.expand parity)


def playable_mask(board):
    """(A,) bool: legal moves that don't fill an own true eye; pass is
    playable only when nothing else is (reference expand() falls back
    to a lone pass child, tree_node.py:87-89)."""
    n = board.shape[-3]
    legal = ~engine.illegal_moves_mask(board)
    pts = legal[: n * n] & ~H.own_true_eye_mask(board).reshape(-1)
    has_pts = jnp.any(pts)
    return jnp.concatenate([pts, ~has_pts[None]])


def michi_priors(board, last_action, cfg: MichiConfig, pattern_lut=None):
    """(pv, pw): (A,) f32 heuristic priors, reference
    TreeNode.expand tree_node.py:22-89 vectorized over all moves.

    last_action: flat index of the move that created this position
    (the parent's edge action), or -1/pass for "no locality prior"
    (reference: cfg_map is None when pos.last is None).
    pattern_lut: optional (4^8,) f32 small-radius gridcular pattern
    table (search/pattern_lut.py) — the device-side form of the
    reference's large-pattern prior AT EVERY EXPANSION
    (tree_node.py:81-86); wider diameters stay host/root-side."""
    n = board.shape[-3]
    nn = n * n
    own = board[:, :, 0] == 1
    opp = board[:, :, 1] == 1
    analysis = H.closure_analysis(own, opp)
    sa_grid = H.self_atari_from(analysis)
    pv = jnp.full((nn,), float(cfg.prior_even), jnp.float32)
    pw = jnp.full((nn,), cfg.prior_even / 2.0, jnp.float32)

    def bump(pv, pw, mask, dv, dw):
        m = mask.reshape(-1).astype(jnp.float32)
        return pv + m * dv, pw + m * dw

    # capture / escape suggestions, sized by the analyzed group
    cap, many = H.capture_moves_from(analysis, self_atari=sa_grid)
    if cfg.use_ladders:
        lcap, lmany = H.ladder_capture_moves(board)
        cap, many = cap | lcap, many | lmany
    one = cap & ~many
    pv, pw = bump(pv, pw, one, cfg.prior_capture_one, cfg.prior_capture_one)
    pv, pw = bump(pv, pw, cap & many,
                  cfg.prior_capture_many, cfg.prior_capture_many)

    # 3x3 patterns
    pv, pw = bump(pv, pw, H.pat3_mask_from(own, opp), cfg.prior_pat3,
                  cfg.prior_pat3)

    # CFG locality (d = 1..3), only when a last move exists
    has_last = (last_action >= 0) & (last_action < nn)
    cfgd = H.cfg_distances(
        board, jnp.where(has_last, last_action, 0), cap=4)
    for d, w in enumerate(cfg.prior_cfg, start=1):
        pv, pw = bump(pv, pw, (cfgd == d) & has_last, w, w)

    # line height on empty areas: 1st/2nd line negative, 3rd positive
    height = H.line_height_grid(n)
    ea = H.empty_area_mask(board)
    pv, pw = bump(pv, pw, ea & (height <= 1), cfg.prior_empty_area, 0.0)
    pv, pw = bump(pv, pw, ea & (height == 2),
                  cfg.prior_empty_area, cfg.prior_empty_area)

    # self-atari: negative prior
    pv, pw = bump(pv, pw, sa_grid, cfg.prior_selfatari, 0.0)

    # device-side small-radius large-pattern prior at every expansion
    # (tree_node.py:81-86: pv/pw += PRIOR_LARGEPATTERN * sqrt(prob))
    if pattern_lut is not None:
        from sejonggo_tpu.search.pattern_lut import lut_bonus_from

        bonus = (lut_bonus_from(own, opp, pattern_lut).reshape(-1)
                 * cfg.prior_largepattern)
        pv = pv + bonus
        pw = pw + bonus

    base = jnp.asarray([float(cfg.prior_even)], jnp.float32)
    return (jnp.concatenate([pv, base]),
            jnp.concatenate([pw, base / 2.0]))


def _empty_tree(capacity: int, size: int) -> MichiTree:
    a = size * size + 1
    return MichiTree(
        node_board=jnp.zeros((capacity, size, size, engine.NUM_PLANES),
                             jnp.int8),
        node_playable=jnp.zeros((capacity, a), bool),
        edge_pv=jnp.zeros((capacity, a), jnp.float32),
        edge_pw=jnp.zeros((capacity, a), jnp.float32),
        edge_v=jnp.zeros((capacity, a), jnp.int32),
        edge_w=jnp.zeros((capacity, a), jnp.float32),
        edge_av=jnp.zeros((capacity, a), jnp.int32),
        edge_aw=jnp.zeros((capacity, a), jnp.float32),
        child_idx=jnp.full((capacity, a), -1, jnp.int32),
        n_nodes=jnp.asarray(1, jnp.int32),
        root_v=jnp.asarray(0, jnp.int32),
        root_w=jnp.asarray(0.0, jnp.float32),
    )


def new_michi_tree(board, cfg: MichiConfig, last_action=-1,
                   root_bonus=None, pattern_lut=None) -> MichiTree:
    """Fresh tree rooted at `board` with the root pre-expanded
    (tree_search.py:67-68).  root_bonus: optional (A,) extra prior
    added to pv AND pw (the large-pattern term, patterns.py —
    tree_node.py:81-86 applies it at every expansion; the host-side
    string matcher can only reach the root here)."""
    capacity = cfg.node_capacity()
    size = board.shape[-3]
    t = _empty_tree(capacity, size)
    pv, pw = michi_priors(board, jnp.asarray(last_action, jnp.int32), cfg,
                          pattern_lut=pattern_lut)
    if root_bonus is not None:
        bonus = jnp.asarray(root_bonus, jnp.float32)
        pv, pw = pv + bonus, pw + bonus
    return t._replace(
        node_board=t.node_board.at[0].set(board),
        node_playable=t.node_playable.at[0].set(playable_mask(board)),
        edge_pv=t.edge_pv.at[0].set(pv),
        edge_pw=t.edge_pw.at[0].set(pw),
    )


def new_michi_tree_batch(boards, cfg: MichiConfig, last_actions=None,
                         pattern_lut=None):
    """last_actions: (B,) flat index of the move that created each
    position (drives the CFG-distance locality prior, the reference's
    largest prior weights — tree_node.py:61-63 via pos.last); -1 = no
    last move."""
    if last_actions is None:
        b = boards.shape[0]
        last_actions = jnp.full((b,), -1, jnp.int32)
    return jax.vmap(partial(new_michi_tree, cfg=cfg,
                            pattern_lut=pattern_lut))(
        boards, last_action=jnp.asarray(last_actions, jnp.int32))


# ---------------------------------------------------------------------------
# descent


def rave_urgency(tree: MichiTree, node, rave_equiv: float):
    """(A,) edge urgencies (reference rave_urgency tree_node.py:91-98)."""
    v = tree.edge_v[node].astype(jnp.float32) + tree.edge_pv[node]
    v = jnp.maximum(v, 1e-9)
    expectation = (tree.edge_w[node] + tree.edge_pw[node]) / v
    av = tree.edge_av[node].astype(jnp.float32)
    rave = tree.edge_aw[node] / jnp.maximum(av, 1.0)
    beta = av / (av + v + v * av / rave_equiv)
    mixed = jnp.where(av > 0, beta * rave + (1.0 - beta) * expectation,
                      expectation)
    return jnp.where(tree.node_playable[node], mixed, -jnp.inf)


def _descend(tree: MichiTree, rng, active, cfg: MichiConfig):
    """One simulation's tree walk — STATS ONLY.  Board stepping,
    expansion priors and the playout all happen batched at round level
    (michi_search_batch); the while body is pure (C, A) arithmetic so
    k descents per round cost microseconds, not board floods.

    Returns (tree, stop_parent, stop_act, stop_child, path_n, path_a,
    depth, amaf): the stop edge is (stop_parent, stop_act);
    stop_child >= 0 when the walk ended AT an existing node
    (terminal/depth stop), -1 when it ended at an unexpanded edge.
    """
    size = tree.node_board.shape[-3]
    a_dim = tree.node_playable.shape[-1]
    max_depth = cfg.max_depth(size)
    inc = active.astype(jnp.int32)

    path_n = jnp.zeros((max_depth,), jnp.int32)
    path_a = jnp.full((max_depth,), -1, jnp.int32)
    amaf = jnp.zeros((a_dim,), jnp.int8)

    def cond(st):
        return ~st[0]["stop"]

    def body(st):
        s, tree = st
        node = s["node"]
        rng, sub = jax.random.split(s["rng"])
        urg = rave_urgency(tree, node, cfg.rave_equiv)
        urg = urg + jax.random.uniform(sub, urg.shape, maxval=1e-6)
        act = jnp.argmax(urg).astype(jnp.int32)

        depth = s["depth"]
        path_n = s["path_n"].at[depth].set(node)
        path_a = s["path_a"].at[depth].set(act)
        # the visit increment doubles as the virtual loss that
        # decorrelates the round's later descents (reference
        # tree_descend comment, tree_search.py:35)
        tree = tree._replace(edge_v=tree.edge_v.at[node, act].add(inc))
        mover = tree.node_board[node][0, 0, 16].astype(jnp.int8)
        amaf = s["amaf"]
        is_pt = act < a_dim - 1
        amaf = amaf.at[act].set(
            jnp.where(is_pt & (amaf[act] == 0), mover, amaf[act]))
        passes = jnp.where(is_pt, 0, s["passes"] + 1)

        child = tree.child_idx[node, act]
        has_child = child >= 0
        terminal = passes >= 2
        deep = depth + 1 >= max_depth
        stop = ~has_child | terminal | deep

        ns = dict(
            node=jnp.where(has_child, child, node),
            depth=depth + 1, passes=passes, rng=rng,
            path_n=path_n, path_a=path_a, amaf=amaf,
            stop=stop,
            stop_parent=jnp.where(stop, node, s["stop_parent"]),
            stop_act=jnp.where(stop, act, s["stop_act"]),
            stop_child=jnp.where(
                stop, jnp.where(has_child, child, -1), s["stop_child"]),
        )
        return ns, tree

    st0 = dict(
        node=jnp.asarray(0, jnp.int32), depth=jnp.asarray(0, jnp.int32),
        passes=jnp.asarray(0, jnp.int32), rng=rng,
        path_n=path_n, path_a=path_a, amaf=amaf,
        stop=jnp.asarray(False),
        stop_parent=jnp.asarray(0, jnp.int32),
        stop_act=jnp.asarray(a_dim - 1, jnp.int32),
        stop_child=jnp.asarray(-1, jnp.int32),
    )
    s, tree = lax.while_loop(cond, body, (st0, tree))
    tree = tree._replace(root_v=tree.root_v + inc)
    return (tree, s["stop_parent"], s["stop_act"], s["stop_child"],
            s["path_n"], s["path_a"], s["depth"], s["amaf"])


def _expand_game(tree: MichiTree, parent, act, stop_child, pv, pw,
                 playable, stepped, active, expand_visits: int):
    """Attach one expansion candidate to one game's tree (round-level
    replacement of the old in-descent expansion; the edge must still be
    unexpanded — two same-round descents can stop at the same edge).
    Returns (tree, leaf_node) with leaf_node the playout's AMAF target:
    the existing stop node, the fresh slot, or -1."""
    child_now = tree.child_idx[parent, act]
    do = (active
          & (stop_child < 0)
          & (child_now < 0)
          & (tree.edge_v[parent, act] >= expand_visits)
          & (tree.n_nodes < tree.node_playable.shape[0]))
    slot = tree.n_nodes

    def expand(tree):
        return tree._replace(
            node_board=tree.node_board.at[slot].set(stepped),
            node_playable=tree.node_playable.at[slot].set(playable),
            edge_pv=tree.edge_pv.at[slot].set(pv),
            edge_pw=tree.edge_pw.at[slot].set(pw),
            child_idx=tree.child_idx.at[parent, act].set(slot),
            n_nodes=tree.n_nodes + 1,
        )

    tree = lax.cond(do, expand, lambda t: t, tree)
    leaf = jnp.where(do, slot,
                     jnp.where(stop_child >= 0, stop_child,
                               jnp.where(child_now >= 0, child_now, -1)))
    return tree, leaf


# ---------------------------------------------------------------------------
# heuristic playout (mcplayout parity)


def _dilate8(m):
    """8-neighborhood dilation (orthogonal + diagonal)."""
    from sejonggo_tpu.goenv.engine import _shift_fill
    out = m
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                out = out | _shift_fill(m, dy, dx, False)
    return out


def _playout_choose(stones, side, illegal, last, last2, rngs,
                    cfg: MichiConfig):
    """Batched move choice for one playout step.

    Mirrors mcplayout's move preference: local capture suggestions
    (prob_capture), local pat3 (prob_pat3), then random non-eye-filling
    moves, with probabilistic self-atari rejection
    (tree_search.py:177-210).  All group facts come from ONE MXU
    closure (heuristics.closure_analysis) instead of the sort-based
    fixpoints — the rewrite that took the playout step from ~0.3 ms to
    microseconds of device throughput per board."""
    b, n = stones.shape[0], stones.shape[-1]
    nn = n * n
    own = stones == side[:, None, None]
    opp = stones == -side[:, None, None]
    analysis = jax.vmap(H.closure_analysis)(own, opp)
    sa = jax.vmap(H.self_atari_from)(analysis).reshape(b, nn)
    cap_g, _ = jax.vmap(
        lambda a_, s_: H.capture_moves_from(a_, self_atari=s_))(
        analysis, sa.reshape(b, n, n))
    playable = (~illegal[:, :nn]) & ~jax.vmap(H.own_true_eye_from)(
        own, opp).reshape(b, nn)
    p3_g = jax.vmap(H.pat3_mask_from)(own, opp).reshape(b, nn)

    # locality: the last two moves and their 8-neighborhoods
    def loc_window(lm1, lm2):
        loc = jnp.zeros((nn,), bool)
        for lm in (lm1, lm2):
            pt = (jnp.arange(nn) == lm) & (lm >= 0)
            loc = loc | pt | _dilate8(pt.reshape(n, n)).reshape(-1)
        return loc

    loc = jax.vmap(loc_window)(last, last2)
    cap_m = cap_g.reshape(b, nn) & loc & playable
    p3_m = p3_g & loc & playable

    def choose(cap, p3, rnd_full, sam, rng):
        r = jax.random.split(rng, 6)
        cap = jnp.where(
            jax.random.bernoulli(r[0], cfg.prob_ssareject), cap & ~sam, cap)
        cap = cap & jax.random.bernoulli(r[1], cfg.prob_capture)
        p3 = jnp.where(
            jax.random.bernoulli(r[2], cfg.prob_ssareject), p3 & ~sam, p3)
        p3 = p3 & jax.random.bernoulli(r[3], cfg.prob_pat3)
        rnd_nosa = rnd_full & ~sam
        use_nosa = jax.random.bernoulli(r[4], cfg.prob_rsareject) & jnp.any(
            rnd_nosa)
        rnd = jnp.where(use_nosa, rnd_nosa, rnd_full)
        mask = jnp.where(jnp.any(cap), cap, jnp.where(jnp.any(p3), p3, rnd))
        any_move = jnp.any(mask)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        return jnp.where(any_move, jax.random.categorical(r[5], logits),
                         nn).astype(jnp.int32)

    return jax.vmap(choose)(cap_m, p3_m, playable, sa, rngs)


def mc_playout_batch(boards, amaf, rng, cfg: MichiConfig, last=None,
                     last2=None):
    """Batched heuristic playouts to the end; returns (scores, amaf)
    with scores in {-1,+1} for each board's side to move at entry
    (mcplayout's return convention, tree_search.py:216-219).

    last/last2: the two moves preceding the playout (reference
    mcplayout seeds its capture/pat3 locality window from pos.last and
    pos.last2, tree_search.py:181-199); -1 = none.

    Runs on signed stone grids: the step goes through the fused
    step+legality path (engine.step_and_illegal_stones_batch — the
    ops/gostep Pallas kernel on TPU), threading each step's
    next-mover legality into the next iteration, and the move masks
    come from the MXU closure analysis.  Plane-board semantics
    (incl. the first step's simple-ko from the history planes) are
    preserved exactly."""
    b, n = boards.shape[0], boards.shape[-3]
    nn = n * n
    to_move = boards[:, 0, 0, 16].astype(jnp.int32)
    side = boards[:, 0, 0, 16].astype(jnp.int8)
    stones = jax.vmap(engine.signed_stones)(boards)
    # previous position's grid for the first step's ko test: plane pair
    # 1 holds the current side's/opponent's stones one position ago
    prev = ((boards[..., 2].astype(jnp.int8)
             - boards[..., 3].astype(jnp.int8)) * side[:, None, None])
    illegal = engine.illegal_moves_mask_stones_batch(stones, prev, side)
    if last is None:
        last = jnp.full((b,), -1, jnp.int32)
    last = jnp.asarray(last, jnp.int32)
    if last2 is None:
        last2 = jnp.full((b,), -1, jnp.int32)
    last2 = jnp.asarray(last2, jnp.int32)
    passes = jnp.zeros((b,), jnp.int32)
    max_steps = cfg.playout_cap(n)
    rows = jnp.arange(b)

    def body(carry, rng_step):
        stones, illegal, side, amaf, passes, last, last2 = carry
        done = passes >= 2
        rngs = jax.random.split(rng_step, b)
        actions = _playout_choose(stones, side, illegal, last, last2,
                                  rngs, cfg)
        any_move = actions < nn
        cur = amaf[rows, actions]
        upd = any_move & (cur == 0) & ~done
        amaf = amaf.at[rows, actions].set(
            jnp.where(upd, side, cur), mode="drop")
        new_passes = jnp.where(any_move, 0, passes + 1)
        ends_now = new_passes >= 2
        # the game-ending second pass is not stepped (stones unchanged
        # by a pass anyway; matches the plane-board playout exactly)
        step_actions = jnp.where(done | ends_now, nn, actions)
        new_stones, new_illegal = engine.step_and_illegal_stones_batch(
            stones, side, step_actions)
        frozen = done | ends_now
        stones = jnp.where(frozen[:, None, None], stones, new_stones)
        illegal = jnp.where(frozen[:, None], illegal, new_illegal)
        side = jnp.where(frozen, side, -side)
        passes = jnp.where(done, passes, new_passes)
        new_last2 = jnp.where(done, last2, last)
        new_last = jnp.where(done, last, actions)
        return (stones, illegal, side, amaf, passes, new_last,
                new_last2), None

    rngs = jax.random.split(rng, max_steps)
    (stones, _, side, amaf, _, _, _), _ = lax.scan(
        body, (stones, illegal, side, amaf, passes, last, last2), rngs)
    # minimal plane boards for area scoring (planes 0/1/16 only)
    fb = jnp.zeros((b, n, n, engine.NUM_PLANES), jnp.int8)
    fb = fb.at[..., 0].set((stones == side[:, None, None]).astype(jnp.int8))
    fb = fb.at[..., 1].set((stones == -side[:, None, None]).astype(jnp.int8))
    fb = fb.at[..., 16].set(side[:, None, None])
    winners = jax.vmap(lambda bd: engine.score(bd, cfg.komi)[0])(fb)
    scores = jnp.where(winners == to_move, 1.0, -1.0).astype(jnp.float32)
    scores = jnp.where(winners == 0, 0.0, scores)
    return scores, amaf


# ---------------------------------------------------------------------------
# backup (tree_update parity)


def _update(tree: MichiTree, path_n, path_a, depth, leaf_node, score, amaf,
            active):
    """Store one simulation: wins along the path (for just-played) and
    AMAF stats on every expanded path node (tree_update
    tree_search.py:43-60)."""
    max_depth = path_n.shape[0]
    inc = active.astype(jnp.int32)
    finc = active.astype(jnp.float32)

    def amaf_row(tree, x, sx):
        mover = tree.node_board[x][0, 0, 16].astype(jnp.int8)
        m = (amaf == mover) & tree.node_playable[x]
        av = tree.edge_av.at[x].add(m.astype(jnp.int32) * inc)
        aw = tree.edge_aw.at[x].add(
            m.astype(jnp.float32) * (sx > 0) * finc)
        return tree._replace(edge_av=av, edge_aw=aw)

    # leaf node AMAF (if expanded); score at leaf = score
    tree = lax.cond(
        leaf_node >= 0,
        lambda t: amaf_row(t, jnp.maximum(leaf_node, 0), score),
        lambda t: t, tree)

    def climb(i, carry):
        tree, s = carry
        # process edges leaf->root: index depth-1-i
        j = depth - 1 - i
        valid = (i < depth)
        p = path_n[jnp.clip(j, 0, max_depth - 1)]
        a = path_a[jnp.clip(j, 0, max_depth - 1)]
        g = jnp.where(valid, 1.0, 0.0) * finc
        # edge child's to-play score is s; w counts wins for just-played
        tree = tree._replace(
            edge_w=tree.edge_w.at[p, a].add((s < 0) * g))
        # AMAF at the parent node p with score for p's to-play = -s
        tree = lax.cond(valid & active,
                        lambda t: amaf_row(t, p, -s), lambda t: t, tree)
        s = jnp.where(valid, -s, s)
        return tree, s

    tree, s_root = lax.fori_loop(0, max_depth, climb, (tree, score))
    tree = tree._replace(root_w=tree.root_w + (s_root < 0) * finc)
    return tree


# ---------------------------------------------------------------------------
# search driver


def best_root_stats(tree: MichiTree):
    """(action, winrate) of the most visited root child
    (best_move/winrate tree_node.py:100-105)."""
    v = jnp.where(tree.node_playable[0], tree.edge_v[0], -1)
    act = jnp.argmax(v).astype(jnp.int32)
    vv = tree.edge_v[0, act].astype(jnp.float32)
    wr = jnp.where(vv > 0, tree.edge_w[0, act] / jnp.maximum(vv, 1.0),
                   jnp.nan)
    return act, wr


def michi_search_batch(trees: MichiTree, rng, cfg: MichiConfig,
                       n_sims: Optional[int] = None, *, active=None,
                       sims_done=0, total_sims: Optional[int] = None,
                       pattern_lut=None):
    """Run up to n_sims simulations per tree with the reference's
    early-stop rule (tree_search.py:127-130): stop a game's search when
    its best winrate exceeds fastplay5/fastplay20 past 5%/20% of the
    budget.

    Playout parallelism (cfg.playout_parallel = k > 1): each round
    makes k descents — a descent's edge_v increments double as the
    virtual loss, so the k paths decorrelate exactly like the
    reference's in-flight pool simulations (tree_descend comment
    tree_search.py:35) — then runs ALL k*B playouts as one batched
    program (the TPU-native pool of tree_search.py:81-107), then
    applies the k updates.  Early stop is evaluated once per round,
    the reference's dispatch-batch granularity.

    Chunking (for the axon TPU tunnel, which kills device programs
    running longer than ~1 min — CLAUDE.md): pass a small ``n_sims``
    plus the running ``sims_done``/``total_sims`` and thread the
    returned ``active`` back in, so one logical search spans several
    short device calls with the fastplay thresholds still computed
    against the TOTAL budget.

    Returns (trees, active).
    """
    n = cfg.n_sims if n_sims is None else n_sims
    total = cfg.n_sims if total_sims is None else total_sims
    k = max(1, int(cfg.playout_parallel))
    b = trees.node_playable.shape[0]
    if active is None:
        active = jnp.ones((b,), bool)
    sims_done = jnp.asarray(sims_done, jnp.int32)

    def cond(st):
        i, _, active, _ = st
        return (i < n) & jnp.any(active)

    def body(st):
        i, rng, active, trees = st
        rng, r1, r2 = jax.random.split(rng, 3)

        def desc_one(trees, rj):
            rjs = jax.random.split(rj, b)
            trees, sp, sa_, sc, pn, pa, d, amaf = jax.vmap(
                partial(_descend, cfg=cfg))(trees, rjs, active)
            return trees, (sp, sa_, sc, pn, pa, d, amaf)

        trees, (SP, SA, SC, pn, pa, d, amaf) = lax.scan(
            desc_one, trees, jax.random.split(r1, k))

        # boards at the far end of every stop edge: ONE batched plane
        # step for all k*B candidates (was: one step per descent
        # iteration inside the walk)
        gidx = jnp.arange(b)[None, :]
        kb = k * b
        parent_boards = trees.node_board[gidx, SP]       # (k, B, n, n, 17)
        board_shape = parent_boards.shape[2:]
        stepped = engine.step_batch(
            parent_boards.reshape((kb,) + board_shape), SA.reshape(kb))

        # round-level expansion (was: in-descent, where the prior
        # computation — ladder reads included — executed on every walk
        # iteration under vmap'd lax.cond): priors/playable for all
        # candidates in one batch, then a sequential attach that
        # resolves same-edge conflicts in descent order
        pv, pw = jax.vmap(lambda bd, la: michi_priors(
            bd, la, cfg, pattern_lut=pattern_lut))(stepped, SA.reshape(kb))
        playable = jax.vmap(playable_mask)(stepped)
        a_dim = amaf.shape[-1]

        def expand_one(trees, xs):
            sp, sa_, sc, pvj, pwj, plj, stj = xs
            trees, leaf = jax.vmap(
                partial(_expand_game, expand_visits=cfg.expand_visits))(
                trees, sp, sa_, sc, pvj, pwj, plj, stj, active)
            return trees, leaf

        stepped = stepped.reshape((k, b) + board_shape)
        trees, LEAF = lax.scan(
            expand_one, trees,
            (SP, SA, SC, pv.reshape(k, b, a_dim), pw.reshape(k, b, a_dim),
             playable.reshape(k, b, a_dim), stepped))

        # playout boards: the stop node's stored board when the walk
        # ended at an existing node, else the stepped edge board
        child_boards = trees.node_board[gidx, jnp.maximum(SC, 0)]
        leaf_b = jnp.where((SC >= 0)[..., None, None, None],
                           child_boards, stepped)

        # playout locality seeds per (k, B) leaf: the last two tree
        # moves of that descent (reference pos.last/pos.last2)
        last = jnp.take_along_axis(
            pa, jnp.maximum(d - 1, 0)[..., None], axis=2)[..., 0]
        last2 = jnp.where(
            d >= 2,
            jnp.take_along_axis(
                pa, jnp.maximum(d - 2, 0)[..., None], axis=2)[..., 0],
            -1)
        scores, amaf = mc_playout_batch(
            leaf_b.reshape((kb,) + board_shape),
            amaf.reshape(kb, a_dim), r2, cfg,
            last=last.reshape(-1), last2=last2.reshape(-1))
        scores = scores.reshape(k, b)
        amaf = amaf.reshape(k, b, a_dim)

        def upd_one(trees, xs):
            pn_j, pa_j, d_j, leaf_j, s_j, am_j = xs
            return jax.vmap(_update)(trees, pn_j, pa_j, d_j, leaf_j, s_j,
                                     am_j, active), None

        trees, _ = lax.scan(upd_one, trees,
                            (pn, pa, d, LEAF, scores, amaf))
        _, wr = jax.vmap(best_root_stats)(trees)
        i1 = i + k
        done_total = (sims_done + i1).astype(jnp.float32)
        fast5 = (done_total > total * 0.05) & (wr > cfg.fastplay5)
        fast20 = (done_total > total * 0.20) & (wr > cfg.fastplay20)
        active = active & ~(fast5 | fast20)
        return i1, rng, active, trees

    _, _, active, trees = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), rng, active, trees))
    return trees, active


def michi_genmove_batch(boards, rng, cfg: MichiConfig, root_bonus=None,
                        last_actions=None, pattern_lut=None):
    """(actions, winrates): search each board and pick the most visited
    move; callers may resign below cfg.resign_thres (conf.py:89).
    root_bonus: optional (B, A) large-pattern prior (patterns.py).
    last_actions: (B,) move that created each root position, feeding the
    CFG-distance locality prior at the root (reference pos.last)."""
    if last_actions is None:
        last_actions = jnp.full((boards.shape[0],), -1, jnp.int32)
    else:
        last_actions = jnp.asarray(last_actions, jnp.int32)
    if root_bonus is None:
        trees = new_michi_tree_batch(boards, cfg, last_actions,
                                     pattern_lut=pattern_lut)
    else:
        trees = jax.vmap(
            lambda b, la, rb: new_michi_tree(b, cfg, last_action=la,
                                             root_bonus=rb,
                                             pattern_lut=pattern_lut))(
            boards, last_actions, jnp.asarray(root_bonus, jnp.float32))
    trees, _ = michi_search_batch(trees, rng, cfg, pattern_lut=pattern_lut)
    return jax.vmap(best_root_stats)(trees)


class MichiSearcher:
    """Host-chunked michi search: one bounded jitted chunk per device
    call, tree state carried across calls.  Required on the axon TPU
    tunnel (single device programs >~1 min crash the worker and a full
    1400-sim search is minutes); behavior-identical to the one-shot
    ``michi_genmove_batch`` — the fastplay thresholds see the total
    budget and the per-game ``active`` flags persist across chunks.
    The per-chunk host fetch doubles as the silent-failure check the
    tunnel needs (utils/platform.py)."""

    def __init__(self, cfg: MichiConfig, chunk_sims: int = 256,
                 pattern_lut=None):
        k = max(1, int(cfg.playout_parallel))
        self.cfg = cfg
        self.chunk = max(k, min(chunk_sims, cfg.n_sims))
        self.pattern_lut = (None if pattern_lut is None
                            else jnp.asarray(pattern_lut, jnp.float32))
        self._new = jax.jit(
            lambda boards, last: new_michi_tree_batch(
                boards, cfg, last, pattern_lut=self.pattern_lut))
        self._chunk_fn = jax.jit(
            lambda t, r, a, sd: michi_search_batch(
                t, r, cfg, n_sims=self.chunk, active=a, sims_done=sd,
                pattern_lut=self.pattern_lut))
        self._best = jax.jit(
            lambda t: jax.vmap(best_root_stats)(t))

    def search(self, boards, rng, last_actions=None, root_bonus=None,
               active=None):
        """Full cfg.n_sims search; returns the final trees.  `active`:
        optional (B,) bool — games to actually search (e.g. ~done in a
        duel); inactive games keep their fresh root untouched."""
        b = boards.shape[0]
        if last_actions is None:
            last_actions = jnp.full((b,), -1, jnp.int32)
        else:
            last_actions = jnp.asarray(last_actions, jnp.int32)
        if root_bonus is None:
            trees = self._new(boards, last_actions)
        else:
            trees = jax.vmap(
                lambda bd, la, rb: new_michi_tree(
                    bd, self.cfg, last_action=la, root_bonus=rb,
                    pattern_lut=self.pattern_lut))(
                boards, last_actions, jnp.asarray(root_bonus, jnp.float32))
        active = (jnp.ones((b,), bool) if active is None
                  else jnp.asarray(active, bool))
        done = 0
        while done < self.cfg.n_sims:
            rng, sub = jax.random.split(rng)
            trees, active = self._chunk_fn(
                trees, sub, active, jnp.asarray(done, jnp.int32))
            done += self.chunk
            # host fetch: chunk boundary sync + verification; also the
            # all-stopped early exit
            if not bool(np_any_host(active)):
                break
        return trees

    def genmove(self, boards, rng, last_actions=None, root_bonus=None):
        """(actions, winrates) — chunked equivalent of
        michi_genmove_batch."""
        trees = self.search(boards, rng, last_actions, root_bonus)
        return self._best(trees)


def np_any_host(x) -> bool:
    import numpy as _np

    return bool(_np.asarray(x).any())

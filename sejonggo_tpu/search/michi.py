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


def michi_priors(board, last_action, cfg: MichiConfig):
    """(pv, pw): (A,) f32 heuristic priors, reference
    TreeNode.expand tree_node.py:22-89 vectorized over all moves.

    last_action: flat index of the move that created this position
    (the parent's edge action), or -1/pass for "no locality prior"
    (reference: cfg_map is None when pos.last is None)."""
    n = board.shape[-3]
    nn = n * n
    pv = jnp.full((nn,), float(cfg.prior_even), jnp.float32)
    pw = jnp.full((nn,), cfg.prior_even / 2.0, jnp.float32)

    def bump(pv, pw, mask, dv, dw):
        m = mask.reshape(-1).astype(jnp.float32)
        return pv + m * dv, pw + m * dw

    # capture / escape suggestions, sized by the analyzed group
    cap, many = H.capture_moves(board)
    if cfg.use_ladders:
        lcap, lmany = H.ladder_capture_moves(board)
        cap, many = cap | lcap, many | lmany
    one = cap & ~many
    pv, pw = bump(pv, pw, one, cfg.prior_capture_one, cfg.prior_capture_one)
    pv, pw = bump(pv, pw, cap & many,
                  cfg.prior_capture_many, cfg.prior_capture_many)

    # 3x3 patterns
    pv, pw = bump(pv, pw, H.pat3_mask(board), cfg.prior_pat3, cfg.prior_pat3)

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
    pv, pw = bump(pv, pw, H.self_atari_mask(board), cfg.prior_selfatari, 0.0)

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
                   root_bonus=None) -> MichiTree:
    """Fresh tree rooted at `board` with the root pre-expanded
    (tree_search.py:67-68).  root_bonus: optional (A,) extra prior
    added to pv AND pw (the large-pattern term, patterns.py —
    tree_node.py:81-86 applies it at every expansion; the host-side
    string matcher can only reach the root here)."""
    capacity = cfg.node_capacity()
    size = board.shape[-3]
    t = _empty_tree(capacity, size)
    pv, pw = michi_priors(board, jnp.asarray(last_action, jnp.int32), cfg)
    if root_bonus is not None:
        bonus = jnp.asarray(root_bonus, jnp.float32)
        pv, pw = pv + bonus, pw + bonus
    return t._replace(
        node_board=t.node_board.at[0].set(board),
        node_playable=t.node_playable.at[0].set(playable_mask(board)),
        edge_pv=t.edge_pv.at[0].set(pv),
        edge_pw=t.edge_pw.at[0].set(pw),
    )


def new_michi_tree_batch(boards, cfg: MichiConfig, last_actions=None):
    """last_actions: (B,) flat index of the move that created each
    position (drives the CFG-distance locality prior, the reference's
    largest prior weights — tree_node.py:61-63 via pos.last); -1 = no
    last move."""
    if last_actions is None:
        b = boards.shape[0]
        last_actions = jnp.full((b,), -1, jnp.int32)
    return jax.vmap(partial(new_michi_tree, cfg=cfg))(
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
    """One simulation's tree walk.  Returns (tree, leaf_board,
    leaf_node, path_nodes, path_actions, depth)."""
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
        tree = tree._replace(edge_v=tree.edge_v.at[node, act].add(inc))
        mover = tree.node_board[node][0, 0, 16].astype(jnp.int8)
        amaf = s["amaf"]
        is_pt = act < a_dim - 1
        amaf = amaf.at[act].set(
            jnp.where(is_pt & (amaf[act] == 0), mover, amaf[act]))
        passes = jnp.where(is_pt, 0, s["passes"] + 1)

        child = tree.child_idx[node, act]
        has_child = child >= 0
        can_expand = (
            (tree.edge_v[node, act] >= cfg.expand_visits)
            & (tree.n_nodes < tree.node_playable.shape[0])
            & active
        )
        # board at the far end of the edge (for expansion / playout)
        stepped = engine.step(tree.node_board[node], act)

        def expand(tree):
            slot = tree.n_nodes
            pv, pw = michi_priors(stepped, act, cfg)
            return tree._replace(
                node_board=tree.node_board.at[slot].set(stepped),
                node_playable=tree.node_playable.at[slot].set(
                    playable_mask(stepped)),
                edge_pv=tree.edge_pv.at[slot].set(pv),
                edge_pw=tree.edge_pw.at[slot].set(pw),
                child_idx=tree.child_idx.at[node, act].set(slot),
                n_nodes=tree.n_nodes + 1,
            ), slot

        def no_expand(tree):
            return tree, jnp.asarray(-1, jnp.int32)

        tree, new_slot = lax.cond(~has_child & can_expand, expand,
                                  no_expand, tree)
        terminal = passes >= 2
        deep = depth + 1 >= max_depth
        stop = ~has_child | terminal | deep
        leaf_node = jnp.where(
            has_child & ~terminal & ~deep, -1,
            jnp.where(has_child, child, new_slot))
        leaf_board = jnp.where(has_child, tree.node_board[
            jnp.maximum(child, 0)], stepped)

        ns = dict(
            node=jnp.where(has_child, child, node),
            depth=depth + 1, passes=passes, rng=rng,
            path_n=path_n, path_a=path_a, amaf=amaf,
            stop=stop, leaf_board=jnp.where(stop, leaf_board,
                                            s["leaf_board"]),
            leaf_node=jnp.where(stop, leaf_node, s["leaf_node"]),
        )
        return ns, tree

    st0 = dict(
        node=jnp.asarray(0, jnp.int32), depth=jnp.asarray(0, jnp.int32),
        passes=jnp.asarray(0, jnp.int32), rng=rng,
        path_n=path_n, path_a=path_a, amaf=amaf,
        stop=jnp.asarray(False),
        leaf_board=tree.node_board[0], leaf_node=jnp.asarray(0, jnp.int32),
    )
    s, tree = lax.while_loop(cond, body, (st0, tree))
    tree = tree._replace(root_v=tree.root_v + inc)
    return (tree, s["leaf_board"], s["leaf_node"], s["path_n"], s["path_a"],
            s["depth"], s["amaf"])


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


def _playout_step(board, amaf, passes, last, last2, rng, cfg: MichiConfig):
    """One heuristic playout move for one board (vmapped over games).

    Mirrors mcplayout's move preference: local capture suggestions
    (prob_capture), local pat3 (prob_pat3), then random non-eye-filling
    moves, with probabilistic self-atari rejection
    (tree_search.py:177-210)."""
    n = board.shape[-3]
    nn = n * n
    r = jax.random.split(rng, 6)

    legal = ~engine.illegal_moves_mask(board)
    playable = legal[:nn] & ~H.own_true_eye_mask(board).reshape(-1)
    sa = H.self_atari_mask(board).reshape(-1)

    # locality: the last two moves and their 8-neighborhoods
    loc = jnp.zeros((nn,), bool)
    for lm in (last, last2):
        pt = (jnp.arange(nn) == lm) & (lm >= 0)
        loc = loc | pt
        loc = loc | _dilate8(pt.reshape(n, n)).reshape(-1)

    cap, _ = H.capture_moves(board)
    cap = cap.reshape(-1) & loc & playable
    cap = jnp.where(
        jax.random.bernoulli(r[0], cfg.prob_ssareject), cap & ~sa, cap)
    cap = cap & jax.random.bernoulli(r[1], cfg.prob_capture)

    p3 = H.pat3_mask(board).reshape(-1) & loc & playable
    p3 = jnp.where(
        jax.random.bernoulli(r[2], cfg.prob_ssareject), p3 & ~sa, p3)
    p3 = p3 & jax.random.bernoulli(r[3], cfg.prob_pat3)

    rnd = playable
    rnd_nosa = rnd & ~sa
    use_nosa = jax.random.bernoulli(r[4], cfg.prob_rsareject) & jnp.any(
        rnd_nosa)
    rnd = jnp.where(use_nosa, rnd_nosa, rnd)

    mask = jnp.where(jnp.any(cap), cap, jnp.where(jnp.any(p3), p3, rnd))
    any_move = jnp.any(mask)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    act = jnp.where(any_move, jax.random.categorical(r[5], logits),
                    nn).astype(jnp.int32)

    mover = board[0, 0, 16].astype(jnp.int8)
    amaf = amaf.at[act].set(
        jnp.where((act < nn) & (amaf[act] == 0), mover, amaf[act]),
        mode="drop")
    new_passes = jnp.where(any_move, 0, passes + 1)
    done = new_passes >= 2
    new_board = jnp.where(done, board, engine.step(board, act))
    return new_board, amaf, new_passes, act, last


def mc_playout_batch(boards, amaf, rng, cfg: MichiConfig, last=None,
                     last2=None):
    """Batched heuristic playouts to the end; returns (scores, amaf)
    with scores in {-1,+1} for each board's side to move at entry
    (mcplayout's return convention, tree_search.py:216-219).

    last/last2: the two moves preceding the playout (reference
    mcplayout seeds its capture/pat3 locality window from pos.last and
    pos.last2, tree_search.py:181-199); -1 = none."""
    b, n = boards.shape[0], boards.shape[-3]
    nn = n * n
    to_move = boards[:, 0, 0, 16].astype(jnp.int32)
    if last is None:
        last = jnp.full((b,), -1, jnp.int32)
    if last2 is None:
        last2 = jnp.full((b,), -1, jnp.int32)
    last2 = jnp.asarray(last2, jnp.int32)
    passes = jnp.zeros((b,), jnp.int32)
    max_steps = cfg.playout_cap(n)

    def body(carry, rng_step):
        boards, amaf, passes, last, last2 = carry
        rngs = jax.random.split(rng_step, b)
        done = passes >= 2
        nb, namaf, np_, nlast, nlast2 = jax.vmap(
            partial(_playout_step, cfg=cfg))(boards, amaf, passes, last,
                                             last2, rngs)
        boards = jnp.where(done[:, None, None, None], boards, nb)
        amaf = jnp.where(done[:, None], amaf, namaf)
        passes = jnp.where(done, passes, np_)
        last = jnp.where(done, last, nlast)
        last2 = jnp.where(done, last2, nlast2)
        return (boards, amaf, passes, last, last2), None

    rngs = jax.random.split(rng, max_steps)
    (final, amaf, _, _, _), _ = lax.scan(
        body, (boards, amaf, passes, last, last2), rngs)
    winners = jax.vmap(lambda bd: engine.score(bd, cfg.komi)[0])(final)
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
                       n_sims: Optional[int] = None):
    """Run up to n_sims simulations per tree with the reference's
    early-stop rule (tree_search.py:127-130): stop a game's search when
    its best winrate exceeds fastplay5/fastplay20 past 5%/20% of the
    budget."""
    n = cfg.n_sims if n_sims is None else n_sims
    b = trees.node_playable.shape[0]

    def cond(st):
        i, _, active, _ = st
        return (i < n) & jnp.any(active)

    def body(st):
        i, rng, active, trees = st
        rng, r1, r2 = jax.random.split(rng, 3)
        r1s = jax.random.split(r1, b)
        trees, leaf_boards, leaf_nodes, path_n, path_a, depth, amaf = (
            jax.vmap(partial(_descend, cfg=cfg))(trees, r1s, active))
        rows = jnp.arange(b)
        scores, amaf = mc_playout_batch(
            leaf_boards, amaf, r2, cfg,
            last=path_a[rows, jnp.maximum(depth - 1, 0)],
            # second-to-last tree move extends the first playout step's
            # locality window to two moves, as in the reference
            # (pos.last2); -1 when the descent was a single edge
            last2=jnp.where(depth >= 2,
                            path_a[rows, jnp.maximum(depth - 2, 0)], -1))
        trees = jax.vmap(_update)(trees, path_n, path_a, depth, leaf_nodes,
                                  scores, amaf, active)
        _, wr = jax.vmap(best_root_stats)(trees)
        i1 = i + 1
        fast5 = (i1 > n * 0.05) & (wr > cfg.fastplay5)
        fast20 = (i1 > n * 0.20) & (wr > cfg.fastplay20)
        active = active & ~(fast5 | fast20)
        return i1, rng, active, trees

    active = jnp.ones((b,), bool)
    _, _, _, trees = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), rng, active, trees))
    return trees


def michi_genmove_batch(boards, rng, cfg: MichiConfig, root_bonus=None,
                        last_actions=None):
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
        trees = new_michi_tree_batch(boards, cfg, last_actions)
    else:
        trees = jax.vmap(
            lambda b, la, rb: new_michi_tree(b, cfg, last_action=la,
                                             root_bonus=rb))(
            boards, last_actions, jnp.asarray(root_bonus, jnp.float32))
    trees = michi_search_batch(trees, rng, cfg)
    return jax.vmap(best_root_stats)(trees)

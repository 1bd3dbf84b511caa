"""Tests for the batched michi-style RAVE engine (search/michi.py).

Counterpart of the reference's untested mcts1/ engine (SURVEY.md §4:
"the legacy heuristic engine has no tests" — these pin the rebuilt
behavior: rave_urgency math, expand priors, playouts, early stop)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sejonggo_tpu.config import MichiConfig
from sejonggo_tpu.goenv import engine
from sejonggo_tpu.search import michi as M
from sejonggo_tpu.search import heuristics as H


def board_from_ascii(rows, to_move=1):
    n = len(rows)
    b = np.zeros((n, n, engine.NUM_PLANES), np.int8)
    for y, row in enumerate(rows):
        for x, ch in enumerate(row):
            if ch == "X":
                b[y, x, 0 if to_move == 1 else 1] = 1
            elif ch == "O":
                b[y, x, 1 if to_move == 1 else 0] = 1
    b[:, :, 16] = to_move
    return jnp.asarray(b)


ATARI_ROWS = [
    ".........",
    ".........",
    "...X.....",
    "..XO.....",
    "...X.....",
    ".........",
    ".........",
    ".........",
    ".........",
]
CAPTURE_A = 3 * 9 + 4  # (3,4): the white stone's last liberty


def test_rave_urgency_matches_reference_formula():
    """urgency = beta*aw/av + (1-beta)*(w+pw)/(v+pv) with
    beta = av/(av + v + v*av/RAVE_EQUIV) (tree_node.py:91-98)."""
    cfg = MichiConfig(n_sims=16, use_ladders=False)
    t = M.new_michi_tree(engine.init_board(9), cfg)
    a = 40
    t = t._replace(
        edge_v=t.edge_v.at[0, a].set(6),
        edge_w=t.edge_w.at[0, a].set(4.0),
        edge_av=t.edge_av.at[0, a].set(10),
        edge_aw=t.edge_aw.at[0, a].set(7.0),
    )
    urg = np.asarray(M.rave_urgency(t, 0, cfg.rave_equiv))
    pv = float(t.edge_pv[0, a])
    pw = float(t.edge_pw[0, a])
    v = 6 + pv
    expectation = (4.0 + pw) / v
    beta = 10 / (10 + v + v * 10 / cfg.rave_equiv)
    expected = beta * (7.0 / 10) + (1 - beta) * expectation
    assert urg[a] == pytest.approx(expected, rel=1e-5)
    # unvisited edges fall back to the prior expectation pw/pv
    b_ = 0
    assert urg[b_] == pytest.approx(
        float(t.edge_pw[0, b_]) / float(t.edge_pv[0, b_]), rel=1e-5)


def test_expand_priors_capture_pat3_cfg_selfatari():
    """Prior sizing per TreeNode.expand (tree_node.py:43-89)."""
    cfg = MichiConfig(use_ladders=False)
    b = board_from_ascii(ATARI_ROWS)
    pv, pw = M.michi_priors(b, jnp.asarray(-1, jnp.int32), cfg)
    pv, pw = np.asarray(pv), np.asarray(pw)
    # capture of a single stone: +PRIOR_CAPTURE_ONE on pv and pw
    assert pv[CAPTURE_A] >= cfg.prior_even + cfg.prior_capture_one
    assert pw[CAPTURE_A] >= cfg.prior_even / 2 + cfg.prior_capture_one
    # far empty corner on the 1st line: empty-area negative prior
    far = 8 * 9 + 8
    assert pv[far] == cfg.prior_even + cfg.prior_empty_area
    assert pw[far] == cfg.prior_even / 2  # pw += 0 -> negative prior

    # cfg locality: with last move at the white stone, its neighbors
    # at cfg-distance 1 get +prior_cfg[0]
    last = 3 * 9 + 3
    pv2, _ = M.michi_priors(b, jnp.asarray(last, jnp.int32), cfg)
    pv2 = np.asarray(pv2)
    assert pv2[CAPTURE_A] - pv[CAPTURE_A] == pytest.approx(cfg.prior_cfg[0])

    # self-atari: playing inside the opponent's one-point gap
    rows = [
        "XX.......",
        "OO.......",
        ".........",
        ".........",
        ".........",
        ".........",
        ".........",
        ".........",
        ".........",
    ]
    b2 = board_from_ascii(rows, to_move=1)
    # (0,2) extends the X pair: fine.  White playing... use white view:
    b3 = board_from_ascii(rows, to_move=-1)  # 'O' side to move
    sa = np.asarray(H.self_atari_mask(b3)).reshape(-1)
    pv3, pw3 = M.michi_priors(b3, jnp.asarray(-1, jnp.int32), cfg)
    pv3, pw3 = np.asarray(pv3), np.asarray(pw3)
    for a in np.nonzero(sa)[0]:
        assert pv3[a] - pw3[a] * 2 >= cfg.prior_selfatari - 1e-4


def test_genmove_finds_capture():
    cfg = MichiConfig(n_sims=40, use_ladders=False,
                      fastplay5=2.0, fastplay20=2.0)  # no early stop
    boards = jnp.stack([board_from_ascii(ATARI_ROWS)])
    acts, wrs = jax.jit(
        lambda bd, r: M.michi_genmove_batch(bd, r, cfg))(
        boards, jax.random.PRNGKey(1))
    assert int(acts[0]) == CAPTURE_A
    assert 0.0 <= float(wrs[0]) <= 1.0


def test_early_stop_freezes_search():
    """With fastplay thresholds at 0 the search stops right after the
    5% mark; with thresholds at 2.0 it runs the full budget
    (tree_search.py:127-130).  playout_parallel=1 pins the strictly
    sequential per-sim granularity."""
    boards = jnp.stack([board_from_ascii(ATARI_ROWS)])
    full_cfg = MichiConfig(n_sims=24, use_ladders=False, playout_parallel=1,
                           fastplay5=2.0, fastplay20=2.0)
    fast_cfg = MichiConfig(n_sims=24, use_ladders=False, playout_parallel=1,
                           fastplay5=-1.0, fastplay20=-1.0)

    def run(cfg):
        trees = M.new_michi_tree_batch(boards, cfg)
        trees, _ = M.michi_search_batch(trees, jax.random.PRNGKey(0), cfg)
        return int(trees.root_v[0])

    assert run(full_cfg) == 24
    assert run(fast_cfg) <= 3  # stops once i > 24*0.05 = 1.2


def test_parallel_playouts_match_budget_and_chunking():
    """playout_parallel=k rounds record k sims each (the reference's
    playout pool, tree_search.py:81-107); a host-chunked search (the
    axon-tunnel driver) reaches the same total budget and carries the
    active flags across chunks."""
    boards = jnp.stack([engine.init_board(9)] * 2)
    cfg = MichiConfig(n_sims=24, use_ladders=False, playout_parallel=8,
                      fastplay5=2.0, fastplay20=2.0)
    trees = M.new_michi_tree_batch(boards, cfg)
    trees, active = M.michi_search_batch(trees, jax.random.PRNGKey(0), cfg)
    assert trees.root_v.tolist() == [24, 24]
    assert active.tolist() == [True, True]

    searcher = M.MichiSearcher(cfg, chunk_sims=8)
    t2 = searcher.search(boards, jax.random.PRNGKey(0))
    assert t2.root_v.tolist() == [24, 24]
    acts, wrs = searcher.genmove(boards, jax.random.PRNGKey(0))
    assert acts.shape == (2,)

    # early stop persists across chunks: thresholds below zero stop
    # every game in the first chunk; later chunks add nothing
    fast = MichiConfig(n_sims=24, use_ladders=False, playout_parallel=8,
                       fastplay5=-1.0, fastplay20=-1.0)
    t3 = M.MichiSearcher(fast, chunk_sims=8).search(
        boards, jax.random.PRNGKey(0))
    assert int(t3.root_v[0]) <= 8


def test_search_accumulates_rave_stats_and_expands():
    cfg = MichiConfig(n_sims=40, expand_visits=4, use_ladders=False,
                      fastplay5=2.0, fastplay20=2.0)
    boards = jnp.stack([engine.init_board(9)] * 2)
    trees = M.new_michi_tree_batch(boards, cfg)
    trees, _ = jax.jit(lambda t, r: M.michi_search_batch(t, r, cfg))(
        trees, jax.random.PRNGKey(2))
    assert int(trees.n_nodes[0]) > 1            # expanded beyond the root
    assert int(trees.edge_av[0].sum()) > 0      # AMAF stats accumulated
    assert int(trees.edge_v[0].sum()) >= 40     # all sims recorded
    # wins bounded by visits per edge
    v = np.asarray(trees.edge_v[0])
    w = np.asarray(trees.edge_w[0])
    assert (w <= v + 1e-6).all()
    aw = np.asarray(trees.edge_aw[0])
    av = np.asarray(trees.edge_av[0])
    assert (aw <= av + 1e-6).all()


def test_playout_scores_decided_position():
    """A board where black owns everything: playouts must score +1 for
    black to move."""
    rows = [
        ".XXXXXXX.",
        "XXXXXXXXX",
        "XXXXXXXXX",
        "XXXXXXXXX",
        "XXXXXXXXX",
        "XXXXXXXXX",
        "XXXXXXXXX",
        "XXXXXXXXX",
        ".XXXXXXX.",
    ]
    cfg = MichiConfig(use_ladders=False)
    b = board_from_ascii(rows)
    amaf = jnp.zeros((1, 82), jnp.int8)
    scores, _ = M.mc_playout_batch(
        jnp.stack([b]), amaf, jax.random.PRNGKey(0), cfg)
    assert float(scores[0]) == 1.0


def test_root_cfg_prior_from_last_action():
    """Plumbing pin: passing last_actions into the batched tree builder
    applies the CFG-distance locality prior at the ROOT (reference
    TreeNode.expand via pos.last, tree_node.py:61-63) — previously the
    root silently searched without the engine's largest prior weights."""
    cfg = MichiConfig(use_ladders=False)
    b = engine.init_board(9)
    last = 4 * 9 + 4  # center
    boards = jnp.stack([b])
    t_with = M.new_michi_tree_batch(boards, cfg,
                                    last_actions=jnp.asarray([last]))
    t_without = M.new_michi_tree_batch(boards, cfg)
    pv_w = np.asarray(t_with.edge_pv[0, 0])
    pv_wo = np.asarray(t_without.edge_pv[0, 0])
    # direct-distance-1 point gets the d=1 CFG bump
    nbr = 4 * 9 + 5
    assert pv_w[nbr] - pv_wo[nbr] == pytest.approx(cfg.prior_cfg[0])
    # far corner is outside the capped distance window: no bump
    assert pv_w[0] == pytest.approx(pv_wo[0])
    # scalar path agrees with the batch path
    t_scalar = M.new_michi_tree(b, cfg, last_action=last)
    np.testing.assert_allclose(np.asarray(t_scalar.edge_pv[0]), pv_w)


def test_genmove_batch_accepts_last_actions():
    cfg = MichiConfig(n_sims=8, use_ladders=False,
                      fastplay5=2.0, fastplay20=2.0)
    boards = jnp.stack([board_from_ascii(ATARI_ROWS)])
    acts, wrs = jax.jit(
        lambda bd, r, la: M.michi_genmove_batch(bd, r, cfg,
                                                last_actions=la))(
        boards, jax.random.PRNGKey(1), jnp.asarray([CAPTURE_A - 1]))
    assert acts.shape == (1,)


def test_playout_last2_window():
    """mc_playout_batch accepts last2; with both locality seeds the
    capture remains findable (smoke: values stay valid)."""
    cfg = MichiConfig(use_ladders=False)
    b = board_from_ascii(ATARI_ROWS)
    amaf = jnp.zeros((1, 82), jnp.int8)
    scores, _ = M.mc_playout_batch(
        jnp.stack([b]), amaf, jax.random.PRNGKey(0), cfg,
        last=jnp.asarray([CAPTURE_A]), last2=jnp.asarray([3 * 9 + 3]))
    assert float(scores[0]) in (-1.0, 0.0, 1.0)

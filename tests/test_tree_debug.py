"""Array-tree introspection tests (VERDICT r3 Next #8; reference
tree_depth/show_tree play.py:355-374)."""
import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.nets import dummy_predict_fn
from sejonggo_tpu.search import (advance_root_batch, decide_batch,
                                 new_tree_batch, run_search)
from sejonggo_tpu.search.tree_debug import (check_consistency, extract_tree,
                                            live_nodes, principal_variation,
                                            show_tree, tree_depth)

SIZE = 9
A = SIZE * SIZE + 1
CAP = 64


def _searched_trees(b=3, sims=24, k=8, seed=0):
    boards = jnp.stack([engine.init_board(SIZE)] * b)
    policies, _ = dummy_predict_fn(boards)
    trees = new_tree_batch(policies, boards, CAP)
    return run_search(trees, dummy_predict_fn, jax.random.PRNGKey(seed),
                      simulations=sims, batch_size=k)


def test_searched_tree_is_consistent():
    trees = _searched_trees()
    for g in range(3):
        t = extract_tree(trees, g)
        assert check_consistency(t) == []
        assert t.root_N == 24
        live = live_nodes(t)
        assert 0 in live and len(live) >= 2
        assert tree_depth(t) >= 1
        pv = principal_variation(t, SIZE)
        assert pv and pv[0][1] == max(int(n) for n in t.child_N[0])
        dump = show_tree(t, SIZE, max_depth=2, top_k=3)
        assert "root: N=24" in dump and "N=" in dump.splitlines()[1]


def test_consistency_after_reroot():
    """Re-rooting compacts survivors to the slot prefix; the compacted
    tree must stay structurally consistent and keep the acyclicity
    invariant (children at larger slots) that the MXU squaring descent
    relies on."""
    trees = _searched_trees(b=2, sims=32, k=8)
    actions = decide_batch(trees, jnp.asarray([True, True]),
                           jax.random.PRNGKey(1))
    boards = jnp.stack([engine.init_board(SIZE)] * 2)
    new_boards = jax.vmap(engine.step)(boards, actions)
    trees2, valid = advance_root_batch(trees, actions, new_boards,
                                       reserve=32)
    for g in range(2):
        if not bool(valid[g]):
            continue
        t = extract_tree(trees2, g)
        assert check_consistency(t) == []


def test_detects_broken_backpointer_and_cycle():
    trees = _searched_trees(b=1)
    t = extract_tree(trees, 0)
    # corrupt a backpointer
    live = [n for n in live_nodes(t) if n != 0]
    child = live[0]
    t_bad = t._replace(parent=t.parent.copy())
    t_bad.parent[child] = child
    assert any("backpointer" in p for p in check_consistency(t_bad))
    # forge a cycle: point an expanded child edge back at slot 0
    p = int(t.parent[child])
    a = int(t.parent_action[child])
    t_cyc = t._replace(child_idx=t.child_idx.copy())
    t_cyc.child_idx[p, a] = 0
    assert any("acyclicity" in m or "out of range" in m
               for m in check_consistency(t_cyc))


def test_gtp_showtree_command():
    from sejonggo_tpu.config import SearchConfig
    from sejonggo_tpu.io.gtp import GoEngine, GTPFrontend
    from sejonggo_tpu.nets import dummy_actor_fn

    eng = GoEngine(dummy_actor_fn, None, size=SIZE, komi=5.5,
                   search=SearchConfig(simulations=16, batch_size=8,
                                       use_symmetry=False))
    gtp = GTPFrontend(eng)
    assert "no tree" in gtp.parse_command("sg_showtree")
    gtp.parse_command("genmove B")
    out = gtp.parse_command("sg_showtree 2 3")
    assert out.startswith("=") and "root: N=" in out and "pv:" in out
    assert "INCONSISTENT" not in out

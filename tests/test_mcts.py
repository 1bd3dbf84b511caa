"""MCTS tests, ported from reference test/tests.py:684-1068 (hand-built
trees + simulate assertions) onto the array-backed batched tree.

The reference's dict trees with explicit children map onto array trees
whose root priors put the same mass on the same actions; children the
reference omits from the dict appear here with prior 0 and are only
selected on exact score ties (stable order -> lowest action), which
reproduces the reference's insertion-order behavior for these cases.
"""
import jax
import jax.numpy as jnp
import numpy as np

from sejonggo_tpu.goenv import engine
from sejonggo_tpu.nets import dummy_predict_fn
from sejonggo_tpu.search import (
    Tree,
    advance_root_batch,
    decide_batch,
    new_tree_batch,
    policy_target_batch,
    run_search,
    simulate_round,
)
from sejonggo_tpu.search.mcts import _collect_leaves


def collect_with_boards(tree, k):
    """Leaf positions as full 17-plane boards, RECONSTRUCTED through
    mcts.leaf_features — asserting these equal engine.step chains pins
    the compact-node feature reconstruction bit-for-bit."""
    from sejonggo_tpu.search.mcts import leaf_features

    leaf_p, leaf_a, active = jax.vmap(
        lambda t: _collect_leaves(t, k, 1.0))(tree)
    b = leaf_p.shape[0]
    n = tree.node_stones.shape[-1]
    ps = jnp.take_along_axis(
        tree.node_stones, leaf_p[:, :, None, None], axis=1)
    pside = jnp.take_along_axis(tree.node_side, leaf_p, axis=1)
    stones = jax.vmap(engine.step_stones)(
        ps.reshape(b * k, n, n), pside.reshape(-1), leaf_a.reshape(-1))
    boards = leaf_features(tree, leaf_p, stones.reshape(b, k, n, n),
                           (-pside).astype(jnp.int8))
    return leaf_p, leaf_a, boards, active

SIZE = 9
A = SIZE * SIZE + 1
CAP = 64


def _scatter_policy(pairs):
    p = np.zeros(A, np.float32)
    for action, prob in pairs.items():
        p[action] = prob
    return jnp.asarray(p)


def build_tree(root_children, board=None, capacity=CAP):
    """Build a (B=1) tree from {action: (p, {action: p, ...})} specs:
    root children with priors, each optionally expanded with its own
    children priors (stats all zero, like the reference's fixtures)."""
    if board is None:
        board = engine.init_board(SIZE)
    policies = _scatter_policy({a: v[0] for a, v in root_children.items()})[None]
    tree = new_tree_batch(policies, board[None], capacity)
    # expand requested children manually
    slot = 1
    for action, (p, sub) in root_children.items():
        if sub is None:
            continue
        child_board = engine.step(board, action)
        legal = ~engine.illegal_moves_mask(child_board)
        tree = tree._replace(
            node_stones=tree.node_stones.at[0, slot].set(
                engine.signed_stones(child_board)),
            node_side=tree.node_side.at[0, slot].set(
                child_board[0, 0, 16].astype(jnp.int8)),
            node_P=tree.node_P.at[0, slot].set(_scatter_policy(sub)),
            node_legal=tree.node_legal.at[0, slot].set(legal),
            parent=tree.parent.at[0, slot].set(0),
            parent_action=tree.parent_action.at[0, slot].set(action),
            child_idx=tree.child_idx.at[0, 0, action].set(slot),
            n_nodes=tree.n_nodes.at[0].set(slot + 1),
        )
        slot += 1
    return tree


def one_round(tree, batch_size, predict_fn=dummy_predict_fn):
    return simulate_round(
        tree, predict_fn, jax.random.PRNGKey(0), batch_size=batch_size)


def test_leaf():
    # reference tests.py:731-745
    tree = build_tree({0: (1.0, None), 1: (0.0, None)})
    tree = one_round(tree, batch_size=2)
    assert int(tree.child_N[0, 0, 0]) == 1
    assert int(tree.child_N[0, 0, 1]) == 1
    assert float(tree.child_W[0, 0, 0]) == -1
    assert float(tree.child_W[0, 0, 1]) == -1
    assert int(tree.root_N[0]) == 2
    assert float(tree.root_W[0]) == -2


def test_model_evaluation_boards():
    # reference tests.py:747-774: exactly boards [move 0, move 1] reach the net
    tree = build_tree({0: (1.0, None), 1: (0.0, None)})
    leaf_p, leaf_a, leaf_boards, active = collect_with_boards(tree, 2)
    b0 = engine.step(engine.init_board(SIZE), 0)
    b1 = engine.step(engine.init_board(SIZE), 1)
    assert np.array_equal(np.asarray(leaf_boards[0, 0]), np.asarray(b0))
    assert np.array_equal(np.asarray(leaf_boards[0, 1]), np.asarray(b1))
    assert np.all(np.asarray(active))


def test_model_evaluation_nested_boards():
    # reference tests.py:776-850: frontier inside child 0; leaves are
    # [move0+move1, move0+move2] in that order
    tree = build_tree({0: (1.0, {1: 1.0, 2: 0.0}), 1: (0.0, None)})
    _, _, leaf_boards, active = collect_with_boards(tree, 2)
    b01 = engine.step(engine.step(engine.init_board(SIZE), 0), 1)
    b02 = engine.step(engine.step(engine.init_board(SIZE), 0), 2)
    assert np.array_equal(np.asarray(leaf_boards[0, 0]), np.asarray(b01))
    assert np.array_equal(np.asarray(leaf_boards[0, 1]), np.asarray(b02))


def test_model_evaluation_other_nested_boards():
    # reference tests.py:852-924: leaves [move0, move1+move0]
    tree = build_tree({0: (1.0, None), 1: (0.0, {0: 0.0, 2: 1.0})})
    _, _, leaf_boards, _ = collect_with_boards(tree, 2)
    b0 = engine.step(engine.init_board(SIZE), 0)
    b12 = engine.step(engine.step(engine.init_board(SIZE), 1), 2)
    assert np.array_equal(np.asarray(leaf_boards[0, 0]), np.asarray(b0))
    assert np.array_equal(np.asarray(leaf_boards[0, 1]), np.asarray(b12))


def test_small_batch_size():
    # reference tests.py:926-938
    tree = build_tree({0: (1.0, None), 1: (0.0, None)})
    tree = one_round(tree, batch_size=1)
    assert int(tree.child_N[0, 0, 0]) == 1
    assert float(tree.child_W[0, 0, 0]) == -1
    assert int(tree.child_idx[0, 0, 0]) >= 0  # expanded
    assert int(tree.child_N[0, 0, 1]) == 0
    assert float(tree.child_W[0, 0, 1]) == 0
    assert int(tree.child_idx[0, 0, 1]) < 0  # not expanded


def test_nested_selected():
    # reference tests.py:940-996
    tree = build_tree({0: (1.0, {1: 0.0, 2: 1.0}), 1: (0.0, None)})
    tree = one_round(tree, batch_size=2)
    node0 = int(tree.child_idx[0, 0, 0])
    assert int(tree.child_N[0, 0, 0]) == 2
    assert int(tree.child_N[0, node0, 1]) == 1
    assert int(tree.child_N[0, node0, 2]) == 1
    assert int(tree.child_N[0, 0, 1]) == 0
    assert float(tree.child_W[0, 0, 0]) == 2
    assert float(tree.child_W[0, 0, 0]) / int(tree.child_N[0, 0, 0]) == 1
    assert float(tree.child_W[0, 0, 1]) == 0


def test_nested_other_leaves():
    # reference tests.py:998-1068
    tree = build_tree(
        {0: (0.75, None), 1: (0.25, {0: 1.0, 2: 0.0}), 2: (0.0, None)})
    tree = one_round(tree, batch_size=2)
    node1 = int(tree.child_idx[0, 0, 1])
    assert int(tree.child_N[0, 0, 0]) == 1
    assert float(tree.child_W[0, 0, 0]) == -1
    assert float(tree.child_W[0, 0, 1]) == 1
    assert int(tree.child_N[0, 0, 1]) == 1
    assert int(tree.child_N[0, node1, 0]) == 1
    assert float(tree.child_W[0, node1, 0]) == 1
    assert int(tree.child_N[0, node1, 2]) == 0
    assert int(tree.root_N[0]) == 2
    assert float(tree.root_W[0]) == 0
    assert int(tree.child_N[0, 0, 2]) == 0
    assert int(tree.child_idx[0, 0, 2]) < 0


def test_run_search_visit_budget():
    """After R rounds of batch k from a fresh tree the root has R*k
    visits (the reference's 1 + sims/batch NN-call contract is the
    per-round single predict in simulate_round)."""
    boards = jnp.stack([engine.init_board(SIZE)] * 2)
    policies, _ = dummy_predict_fn(boards)
    tree = new_tree_batch(policies, boards, CAP)
    tree = run_search(tree, dummy_predict_fn, jax.random.PRNGKey(1),
                      simulations=16, batch_size=4)
    assert np.all(np.asarray(tree.root_N) == 16)
    assert np.all(np.asarray(tree.child_N[:, 0].sum(-1)) == 16)
    # run_search expands into the reserved static region
    # [capacity - simulations, capacity): n_nodes is the allocation
    # high-water mark, and exactly 16 slots carry live expansions
    assert np.all(np.asarray(tree.n_nodes) == CAP)
    live = np.asarray(tree.parent_action[0]) >= 0
    assert live.sum() == 16


def test_decide_greedy_and_sampling():
    tree = build_tree({0: (1.0, None), 1: (0.0, None)})
    tree = one_round(tree, batch_size=2)
    # make child 1 strictly better-visited
    tree = tree._replace(child_N=tree.child_N.at[0, 0, 1].set(10))
    greedy = jnp.array([True])
    a = decide_batch(tree, greedy, jax.random.PRNGKey(0))
    assert int(a[0]) == 1
    # sampling only ever returns visited children
    for s in range(5):
        a = decide_batch(tree, jnp.array([False]), jax.random.PRNGKey(s))
        assert int(a[0]) in (0, 1)


def test_greedy_tie_breaks_by_mean_then_action():
    tree = build_tree({0: (1.0, None), 1: (0.0, None)})
    # equal counts, child 0 higher mean -> choose 0
    tree = tree._replace(
        child_N=tree.child_N.at[0, 0, :2].set(jnp.array([5, 5])),
        child_W=tree.child_W.at[0, 0, :2].set(jnp.array([3.0, 1.0])),
    )
    a = decide_batch(tree, jnp.array([True]), jax.random.PRNGKey(0))
    assert int(a[0]) == 0
    # equal counts and means -> larger action index (reference
    # max((count, mean_value, a)) self_play.py:151)
    tree = tree._replace(child_W=tree.child_W.at[0, 0, :2].set(jnp.array([1.0, 1.0])))
    a = decide_batch(tree, jnp.array([True]), jax.random.PRNGKey(0))
    assert int(a[0]) == 1


def test_policy_target_modes():
    boards = jnp.stack([engine.init_board(SIZE)])
    policies, _ = dummy_predict_fn(boards)
    tree = new_tree_batch(policies, boards, CAP)
    tree = run_search(tree, dummy_predict_fn, jax.random.PRNGKey(0),
                      simulations=8, batch_size=4)
    prior = np.asarray(policy_target_batch(tree, "prior"))
    visits = np.asarray(policy_target_batch(tree, "visits"))
    assert np.allclose(prior[0], np.asarray(policies[0]))  # no noise here
    assert np.isclose(visits.sum(), 1.0)
    assert np.all(visits >= 0)


def test_advance_root_reuse():
    """Tree reuse: stats of the chosen child become the new root's and
    its subtree survives compaction (reference self_play.py:224-238)."""
    boards = jnp.stack([engine.init_board(SIZE)])
    policies, _ = dummy_predict_fn(boards)
    tree = new_tree_batch(policies, boards, CAP)
    tree = run_search(tree, dummy_predict_fn, jax.random.PRNGKey(0),
                      simulations=16, batch_size=4)
    counts = np.asarray(tree.child_N[0, 0])
    action = int(counts.argmax())
    old_child_count = int(tree.child_N[0, 0, action])
    old_child_node = int(tree.child_idx[0, 0, action])
    old_grandchildren = np.asarray(tree.child_N[0, old_child_node])

    expected = engine.step(engine.init_board(SIZE), action)
    new_tree, valid = advance_root_batch(tree, jnp.array([action]),
                                         expected[None])
    assert bool(valid[0])
    assert int(new_tree.root_N[0]) == old_child_count
    assert np.array_equal(np.asarray(new_tree.child_N[0, 0]), old_grandchildren)
    # root position advanced by the action (compact grid + full planes)
    assert np.array_equal(np.asarray(new_tree.node_stones[0, 0]),
                          np.asarray(engine.signed_stones(expected)))
    assert np.array_equal(np.asarray(new_tree.root_board[0]),
                          np.asarray(expected))
    # search continues to work on the re-rooted tree
    new_tree = run_search(new_tree, dummy_predict_fn, jax.random.PRNGKey(2),
                          simulations=8, batch_size=4)
    assert int(new_tree.root_N[0]) == old_child_count + 8


def test_advance_root_truncates_to_reserve_budget():
    """When survivors exceed capacity - reserve, the reused tree is
    TRUNCATED (index-prefix of the surviving subtree) instead of
    dropped: root stats survive, edges into dropped nodes revert to
    unexpanded but keep their visit counts, and search continues."""
    from sejonggo_tpu.nets import make_constant_predict_fn

    # policy mass concentrated on action 0 -> the search digs a deep
    # chain under the root's action-0 child, so that child's surviving
    # subtree is much larger than the post-reserve budget
    concentrated = make_constant_predict_fn(
        np.eye(A, dtype=np.float32)[0], value=1.0)
    boards = jnp.stack([engine.init_board(SIZE)])
    policies, _ = concentrated(boards)
    tree = new_tree_batch(policies, boards, CAP)
    tree = run_search(tree, concentrated, jax.random.PRNGKey(0),
                      simulations=48, batch_size=8)
    counts = np.asarray(tree.child_N[0, 0])
    action = int(counts.argmax())
    old_child_count = int(tree.child_N[0, 0, action])
    old_child_node = int(tree.child_idx[0, 0, action])
    old_grandchildren = np.asarray(tree.child_N[0, old_child_node])
    # true survivor count: all descendants of the chosen child
    parent = np.asarray(tree.parent[0])
    n_alloc = int(tree.n_nodes[0])

    def is_desc(i):
        while i != 0:
            if i == old_child_node:
                return True
            i = int(parent[i])
        return False

    survivors = sum(is_desc(i) for i in range(1, n_alloc)) + (
        1 if old_child_node == 0 else 0)
    reserve = 48
    budget = CAP - reserve  # = 16
    assert budget >= 2

    expected = engine.step(engine.init_board(SIZE), action)
    new_tree, valid = advance_root_batch(
        tree, jnp.array([action]), expected[None], reserve=reserve)
    assert bool(valid[0])
    n_nodes = int(new_tree.n_nodes[0])
    assert n_nodes <= budget
    # root stats survive truncation
    assert int(new_tree.root_N[0]) == old_child_count
    # edge stats of the new root survive even where children dropped
    assert np.array_equal(np.asarray(new_tree.child_N[0, 0]),
                          old_grandchildren)
    # all child pointers stay inside the live prefix
    ci = np.asarray(new_tree.child_idx[0])
    assert ci.max() < n_nodes
    live_parents = np.asarray(new_tree.parent[0])[:n_nodes]
    assert (live_parents < n_nodes).all()
    # search keeps working on the truncated tree and re-expands edges
    new_tree = run_search(new_tree, concentrated, jax.random.PRNGKey(2),
                          simulations=reserve, batch_size=8)
    assert int(new_tree.n_nodes[0]) <= CAP
    assert int(new_tree.root_N[0]) == old_child_count + reserve
    # the truncation actually triggered
    assert survivors > budget
    assert n_nodes < survivors


def test_advance_root_unexpanded_is_invalid():
    boards = jnp.stack([engine.init_board(SIZE)])
    policies, _ = dummy_predict_fn(boards)
    tree = new_tree_batch(policies, boards, CAP)
    _, valid = advance_root_batch(
        tree, jnp.array([5]), engine.step(engine.init_board(SIZE), 5)[None])
    assert not bool(valid[0])


def test_dirichlet_noise_applied_at_root():
    boards = jnp.stack([engine.init_board(SIZE)] * 2)
    policies, _ = dummy_predict_fn(boards)
    noisy = new_tree_batch(policies, boards, CAP, rng=jax.random.PRNGKey(0))
    clean = new_tree_batch(policies, boards, CAP)
    assert not np.allclose(np.asarray(noisy.node_P[:, 0]), np.asarray(clean.node_P[:, 0]))
    # mixing: (1-eps)*p + eps*noise stays a distribution over all actions
    assert np.allclose(np.asarray(noisy.node_P[:, 0].sum(-1)), 1.0, atol=1e-5)
    # different games draw different noise
    assert not np.allclose(np.asarray(noisy.node_P[0, 0]), np.asarray(noisy.node_P[1, 0]))


def test_keep_subtree_impls_agree():
    """_advance_root's survivor mask has two capacity-selected
    implementations (MXU transitive closure for small trees, pointer
    doubling for 19x19-class reuse capacities) — they must agree on
    random topological forests."""
    from sejonggo_tpu.search.mcts import (_keep_subtree_closure,
                                          _keep_subtree_doubling)

    rng = np.random.RandomState(0)
    for c in (2, 7, 64, 146, 600):
        for _ in range(5):
            # topological parents (children allocated after parents;
            # parent[0]=0 parks chains at the root, tree.py invariant)
            parent = np.zeros(c, np.int32)
            for i in range(1, c):
                parent[i] = rng.randint(0, i)
            nr = int(rng.randint(0, c))
            pj = jnp.asarray(parent)
            a = np.asarray(_keep_subtree_closure(pj, jnp.asarray(nr)))
            b = np.asarray(_keep_subtree_doubling(pj, jnp.asarray(nr)))
            assert np.array_equal(a, b), (c, nr)
            assert a[nr]


def test_collect_leaves_paths_bit_identical(monkeypatch):
    """The squaring descent (capacity <= _MXU_DESCENT_MAX_ROWS) and the
    while-loop descent (the 19x19-class fallback) must pick bit-identical
    (leaf_p, leaf_a, active) on the same frozen tree (ADVICE r3: the
    suite's CAP=64 exercised only the squaring path)."""
    import sejonggo_tpu.search.mcts as mcts_mod

    for cap in (64, 82, 146):
        for k in (1, 4, 16):
            boards = jnp.stack([engine.init_board(SIZE)] * 2)
            policies, _ = dummy_predict_fn(boards)
            trees = new_tree_batch(policies, boards, cap)
            trees = run_search(trees, dummy_predict_fn,
                               jax.random.PRNGKey(cap + k),
                               simulations=24, batch_size=8)

            def collect(t, kk):
                return jax.jit(jax.vmap(
                    lambda tr: _collect_leaves(tr, kk, 1.0)))(t)

            p1, a1, act1 = collect(trees, k)
            monkeypatch.setattr(mcts_mod, "_MXU_DESCENT_MAX_ROWS", 0)
            p2, a2, act2 = collect(trees, k)
            monkeypatch.undo()
            assert np.array_equal(np.asarray(p1), np.asarray(p2)), (cap, k)
            assert np.array_equal(np.asarray(a1), np.asarray(a2)), (cap, k)
            assert np.array_equal(np.asarray(act1), np.asarray(act2))


def test_closure_backup_matches_loop_backup(monkeypatch):
    """The transitive-closure backup (static-slot path) must produce
    the same tree as the while-loop climb: identical child_N /
    child_idx / root_N, child_W equal up to f32 summation order, in
    both backup modes (reference and negamax)."""
    import sejonggo_tpu.search.mcts as mcts_mod

    for negamax in (False, True):
        for cap, sims, k in ((64, 24, 8), (146, 32, 16)):
            boards = jnp.stack([engine.init_board(SIZE)] * 3)
            policies, _ = dummy_predict_fn(boards)

            def search():
                trees = new_tree_batch(policies, boards, cap)
                return run_search(trees, dummy_predict_fn,
                                  jax.random.PRNGKey(cap + k),
                                  simulations=sims, batch_size=k,
                                  negamax=negamax)

            t_closure = search()
            monkeypatch.setattr(mcts_mod, "_CLOSURE_BACKUP_MAX_ROWS", 0)
            t_loop = search()
            monkeypatch.undo()
            assert np.array_equal(np.asarray(t_closure.child_N),
                                  np.asarray(t_loop.child_N)), (negamax, cap)
            assert np.array_equal(np.asarray(t_closure.child_idx),
                                  np.asarray(t_loop.child_idx))
            assert np.array_equal(np.asarray(t_closure.root_N),
                                  np.asarray(t_loop.root_N))
            assert np.allclose(np.asarray(t_closure.child_W),
                               np.asarray(t_loop.child_W), atol=1e-5)
            assert np.allclose(np.asarray(t_closure.root_W),
                               np.asarray(t_loop.root_W), atol=1e-5)


def test_advance_root_large_capacity_doubling_path():
    """Re-rooting at a capacity above the closure/doubling switch
    (C>512) goes through _keep_subtree_doubling; semantics must match
    the small-capacity path: chosen child becomes root slot 0 with its
    stats carried over."""
    big_cap = 600
    boards = jnp.stack([engine.init_board(SIZE)])
    policies, _ = dummy_predict_fn(boards)
    trees = new_tree_batch(policies, boards, big_cap)
    trees = run_search(trees, dummy_predict_fn, jax.random.PRNGKey(0),
                       simulations=16, batch_size=4)
    action = int(jnp.argmax(trees.child_N[0, 0]))
    child = int(trees.child_idx[0, 0, action])
    child_n = int(trees.child_N[0, 0, action])
    new_board = engine.step(engine.init_board(SIZE), action)
    adv, valid = advance_root_batch(trees, jnp.asarray([action]),
                                    new_board[None], reserve=16)
    assert bool(valid[0])
    assert int(adv.root_N[0]) == child_n
    # the new root's stones are the stepped board's stones
    assert np.array_equal(np.asarray(adv.node_stones[0, 0]),
                          np.asarray(engine.signed_stones(new_board)))
    # old child priors survived at the new root
    assert np.allclose(np.asarray(adv.node_P[0, 0]),
                       np.asarray(trees.node_P[0, child]))


def test_leaf_features_pergame_symmetry_matches_scalar():
    """leaf_features with a (B,) symmetry vector must equal the scalar
    (batch-uniform) path applied per game."""
    from sejonggo_tpu.search.mcts import leaf_features

    boards = jnp.stack([engine.init_board(SIZE)] * 3)
    policies, _ = dummy_predict_fn(boards)
    trees = new_tree_batch(policies, boards, CAP)
    trees = run_search(trees, dummy_predict_fn, jax.random.PRNGKey(0),
                       simulations=8, batch_size=4)
    leaf_p = jnp.asarray([[1, 2], [2, 3], [0, 1]], jnp.int32)
    leaf_stones = jnp.stack(
        [trees.node_stones[b, leaf_p[b]] for b in range(3)])
    leaf_side = jnp.take_along_axis(trees.node_side, leaf_p, axis=1)
    for s in (0, 1, 4, 6):
        scalar = leaf_features(trees, leaf_p, leaf_stones, leaf_side,
                               sym=jnp.asarray(s, jnp.int32))
        vector = leaf_features(trees, leaf_p, leaf_stones, leaf_side,
                               sym=jnp.full((3,), s, jnp.int32))
        assert np.array_equal(np.asarray(scalar), np.asarray(vector)), s
    # mixed vector: each game matches its own scalar transform
    mixed = leaf_features(trees, leaf_p, leaf_stones, leaf_side,
                          sym=jnp.asarray([0, 4, 6], jnp.int32))
    for b, s in enumerate((0, 4, 6)):
        ref = leaf_features(trees, leaf_p, leaf_stones, leaf_side,
                            sym=jnp.asarray(s, jnp.int32))
        assert np.array_equal(np.asarray(mixed[b]), np.asarray(ref[b])), s


def test_take_rows_mxu_matches_native_gather():
    """The one-hot MXU row gather must be bit-exact vs take_along_axis
    for every table shape/dtype the hot path feeds it: int8 stone
    grids (values {-1,0,1}), multi-dim trailing shapes, and the
    large-capacity / float fallbacks."""
    from sejonggo_tpu.search import mcts
    from sejonggo_tpu.search.mcts import _take_rows_mxu

    rng = np.random.RandomState(1)
    for b, c, trail in ((3, 82, (81,)), (2, 146, (9, 9)), (1, 7, (4, 3))):
        table = jnp.asarray(
            rng.randint(-1, 2, size=(b, c) + trail), jnp.int8)
        idx = jnp.asarray(rng.randint(0, c, size=(b, 11)), jnp.int32)
        got = _take_rows_mxu(table, idx)
        want = jnp.take_along_axis(
            table, idx.reshape(b, 11, *([1] * len(trail))), axis=1)
        assert got.dtype == table.dtype
        assert np.array_equal(np.asarray(got), np.asarray(want)), (b, c)

    # float tables and capacities past the cutoff take the native path
    # (same results by construction, but pin the routing doesn't break)
    ftab = jnp.asarray(rng.randn(2, 16, 5), jnp.float32)
    fidx = jnp.asarray(rng.randint(0, 16, size=(2, 4)), jnp.int32)
    assert np.array_equal(
        np.asarray(_take_rows_mxu(ftab, fidx)),
        np.asarray(jnp.take_along_axis(ftab, fidx[:, :, None], axis=1)))
    old = mcts._MXU_GATHER_MAX_ROWS
    try:
        mcts._MXU_GATHER_MAX_ROWS = 8
        itab = jnp.asarray(rng.randint(-1, 2, size=(2, 32, 6)), jnp.int8)
        iidx = jnp.asarray(rng.randint(0, 32, size=(2, 5)), jnp.int32)
        assert np.array_equal(
            np.asarray(_take_rows_mxu(itab, iidx)),
            np.asarray(jnp.take_along_axis(itab, iidx[:, :, None], axis=1)))
    finally:
        mcts._MXU_GATHER_MAX_ROWS = old

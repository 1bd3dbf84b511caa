from sejonggo_tpu.search.tree import Tree, new_tree_batch, tree_capacity
from sejonggo_tpu.search.mcts import (
    advance_root_batch,
    decide_batch,
    policy_target_batch,
    run_search,
    simulate_round,
)
from sejonggo_tpu.search.michi import (
    MichiSearcher,
    MichiTree,
    michi_genmove_batch,
    michi_search_batch,
    new_michi_tree_batch,
)

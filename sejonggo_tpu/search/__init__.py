from sejonggo_tpu.search.tree import Tree, new_tree_batch, tree_capacity
from sejonggo_tpu.search.mcts import (
    advance_root_batch,
    decide_batch,
    policy_target_batch,
    run_search,
    simulate_round,
)

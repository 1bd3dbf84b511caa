from sejonggo_tpu.goenv.engine import (
    NUM_PLANES,
    SWAP_INDEX,
    area_counts,
    color_board,
    current_player,
    group_liberty_count,
    illegal_moves_mask,
    init_board,
    legal_moves_mask,
    play_at,
    real_board,
    score,
    show_board,
    step,
    to_features,
    winner,
)
from sejonggo_tpu.goenv.coords import (
    coord2index,
    gtp_to_xy,
    index2coord,
    xy_to_gtp,
)

from sejonggo_tpu.parallel.mesh import (
    host_local_batch,
    make_mesh,
    replicate,
    shard_actor_state,
    shard_batch,
)
from sejonggo_tpu.parallel.dist import init_distributed, local_game_slice

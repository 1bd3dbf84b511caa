from sejonggo_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from sejonggo_tpu.parallel.dist import init_distributed, local_game_slice

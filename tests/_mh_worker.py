"""Subprocess worker for the 2-process multi-host pipeline test.

Each process joins the jax distributed runtime over loopback (gloo CPU
collectives) with 4 virtual CPU devices, then drives ONE full Pipeline
generation against a shared workdir — the deterministic CPU-mesh stand-in
for a 2-host pod slice that SURVEY.md §4 asks for ("the rebuild should do
better: deterministic multi-host tests on CPU meshes").  Covers:
local_game_slice self-play sharding, make_array_from_process_local_data
train batches over the global mesh, gradient all-reduce across processes,
process-0 checkpointing with barriers, and the all-gathered promotion
decision (pipeline.evaluate_phase).
"""
import os
import sys


def main():
    port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    from sejonggo_tpu.config import (Config, EvalConfig, GoConfig, NetConfig,
                                     SearchConfig, SelfPlayConfig,
                                     TrainConfig)
    from sejonggo_tpu.pipeline import Pipeline

    cfg = Config(
        go=GoConfig(size=5, komi=5.5),
        net=NetConfig(blocks=1, filters=8, value_hidden=8,
                      compute_dtype="float32"),
        search=SearchConfig(simulations=8, batch_size=4),
        selfplay=SelfPlayConfig(num_games=4, stop_exploration=4,
                                game_batch=4),
        train=TrainConfig(batch_size=16, iters_per_epoch=2,
                          epochs_per_save=1, replay_window=256),
        eval=EvalConfig(num_games=4),
    )
    pipe = Pipeline(cfg, workdir, seed=0)
    assert pipe.train_mesh.size == 8          # global: both processes
    assert pipe.actor_mesh.size == 4          # local: this process
    results = pipe.run(1)
    assert len(results) == 1
    assert pipe.store.latest_name() == "model_2"
    gen = results[0]
    assert gen["selfplay"]["moves"] > 0
    assert gen["train"]["steps"] == 2
    # the promotion decision must be identical on every process
    print(f"MH_OK pid={pid} promote={gen['evaluate'].get('promote')} "
          f"best={gen['best']}", flush=True)


if __name__ == "__main__":
    main()

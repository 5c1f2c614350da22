from srbd_horizon_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    sharded_batched_solve,
    sharded_batched_tick,
)

from neurecon_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_train_step,
    ray_batch_shardings,
    replicate,
    shard_rays,
)

__all__ = ["make_mesh", "make_sharded_train_step", "ray_batch_shardings",
           "replicate", "shard_rays"]

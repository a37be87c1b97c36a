from deeparc_tpu.parallel.sharded_ba import (
    ShardedScene,
    make_mesh,
    shard_scene,
    solve_ba_sharded,
)

__all__ = ["ShardedScene", "make_mesh", "shard_scene", "solve_ba_sharded"]

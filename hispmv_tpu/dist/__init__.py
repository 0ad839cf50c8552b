from hispmv_tpu.dist.shard import (  # noqa: F401
    ShardedBlockPlan,
    build_sharded_block_plan,
    make_mesh,
    spmv_sharded,
)

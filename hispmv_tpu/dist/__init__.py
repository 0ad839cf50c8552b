from hispmv_tpu.dist.init import init_distributed  # noqa: F401
from hispmv_tpu.dist.shard import (  # noqa: F401
    ShardedBlockPlan,
    ShardedWindowPlan,
    build_sharded_block_plan,
    build_sharded_window_plan,
    make_mesh,
    spmv_sharded,
    spmv_sharded_window,
)

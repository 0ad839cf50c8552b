from hispmv_tpu.ops.spmv_ref import spmv_xla, finalize_xla  # noqa: F401
from hispmv_tpu.ops.gemv import gemv_xla  # noqa: F401
from hispmv_tpu.ops.spmv_block import (  # noqa: F401
    spmv_block,
    spmv_block_pallas,
    spmv_block_batched_pallas,
)

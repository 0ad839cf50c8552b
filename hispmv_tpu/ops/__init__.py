from hispmv_tpu.ops.spmv_ref import spmv_xla, finalize_xla  # noqa: F401
from hispmv_tpu.ops.gemv import gemv_xla  # noqa: F401

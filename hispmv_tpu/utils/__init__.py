from hispmv_tpu.utils.timing import measure_loop_time  # noqa: F401
from hispmv_tpu.utils.errors import error_stats, print_error_stats  # noqa: F401

from hispmv_tpu.plan.partition import StreamPlan, build_plan  # noqa: F401
from hispmv_tpu.plan.blocks import BlockPlan, build_block_plan  # noqa: F401
from hispmv_tpu.plan.windows import WindowPlan, build_window_plan  # noqa: F401
from hispmv_tpu.plan.serialize import save_plan, load_plan  # noqa: F401

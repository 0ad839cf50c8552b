from hispmv_tpu.plan.partition import StreamPlan, build_plan  # noqa: F401

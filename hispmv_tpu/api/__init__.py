from hispmv_tpu.api.handle import Accelerator, SpmvHandle, prepare  # noqa: F401

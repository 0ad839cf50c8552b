from hispmv_tpu.tune.cost import DeviceProfile, CostModel  # noqa: F401
from hispmv_tpu.tune.dse import DSE, TuneResult, tune  # noqa: F401

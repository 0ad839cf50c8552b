from hispmv_tpu.models.mlp import (  # noqa: F401
    AcceleratedModel,
    SparseLinear,
    ThreeLayerFCModel,
    compare_model_outputs,
    extract_linears,
)
from hispmv_tpu.models.manager import AcceleratorLayerManager  # noqa: F401

"""hispmv_tpu — a TPU-native sparse/dense matrix-vector framework.

A from-scratch JAX/XLA/Pallas re-creation of the capabilities of MAD-HiSpMV
(reference: an FPGA SpMV accelerator with a GeMV "dense overlay",
load-balancing preprocessor, matrix-adaptive design automation, and a
prepare-once/run-many Python runtime).

Layer map (TPU-native, see SURVEY.md section 7):

- ``formats``  — MatrixMarket IO, COO/CSR containers, synthetic generators
                 (contract of reference common/src/spmv-helper.cpp:34-136).
- ``plan``     — the preprocessor: nnz-balanced row->lane partitioning with
                 long-row splitting ("shared rows"), column tiling, and packing
                 into statically-shaped lane streams
                 (contract of spmv-helper.cpp:265-638).
- ``ops``      — compute kernels: XLA reference SpMV, Pallas streaming SpMV,
                 dense GeMV overlay (contract of
                 automation_tool/assets/base_functions.cpp).
- ``api``      — ``SpmvHandle`` / ``Accelerator``: prepare-once/run-many,
                 multi-matrix residency, batched ``linear()``
                 (contract of pyhispmv/src/fpga_handle.cpp).
- ``tune``     — analytic cost model + per-matrix design-space exploration
                 (contract of automation_tool/src/{dse,resource_est,
                 cyclecount_est}.py).
- ``models``   — NN integration: SparseLinear, layer swapping, MLP demo
                 (contract of apps/{model,fpga_layer_manager}.py).
- ``dist``     — multi-chip sharding: mesh helpers, row-sharded SpMV with
                 collective x exchange (new; reference is single-device).
- ``utils``    — error histograms, timing/power observability, logging.
"""

__version__ = "0.1.0"

from hispmv_tpu.config import SpmvConfig, encode_config_name  # noqa: F401


def __getattr__(name):
    # Lazy top-level conveniences (importing api/tune pulls in jax).
    if name in ("SpmvHandle", "Accelerator", "prepare"):
        from hispmv_tpu import api

        return getattr(api, name)
    if name == "tune":
        from hispmv_tpu.tune import tune as _tune

        return _tune
    raise AttributeError(name)

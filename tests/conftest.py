"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths compile
and execute without TPU hardware (the csim analog of the reference's
tapa::invoke software simulation, README.md:234-243).  Set
HISPMV_TEST_PLATFORM=tpu to run the suite on real hardware instead.
"""

import os

if os.environ.get("HISPMV_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU-relay plugin (sitecustomize) force-overrides the
    # jax_platforms config at import time; override it back.  Safe even if
    # the plugin is absent.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this environment has a single CPU core, so
# XLA compiles dominate test time; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hispmv_tpu.formats import synth  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# A spread of small matrices covering every structural profile: banded FEM,
# block-clustered, uniform random, power-law (imbalanced), plus degenerate
# shapes (single row/col, empty row tail, wide, tall).
def small_matrix_cases():
    cases = {
        "banded": synth.banded_coo(300, 300, 3000, seed=0),
        "blocked": synth.blocked_coo(512, 512, 8000, seed=1),
        "random": synth.random_coo(257, 129, 2000, seed=2),
        "powerlaw": synth.powerlaw_coo(400, 400, 6000, seed=3),
        "wide": synth.random_coo(40, 5000, 3000, seed=4),
        "tall": synth.random_coo(5000, 40, 3000, seed=5),
        "tiny": synth.random_coo(3, 7, 8, seed=6),
        "single_dense_row": _single_dense_row(),
    }
    return cases


def _single_dense_row():
    # One row holding 90% of nnz — the worst case for cyclic row->PE
    # assignment, the motivating case for shared-row splitting.
    base = synth.random_coo(100, 2000, 500, seed=7)
    heavy_cols = np.arange(0, 2000, dtype=np.int32)
    heavy_rows = np.full(2000, 50, dtype=np.int32)
    heavy_vals = np.linspace(-1, 1, 2000).astype(np.float32)
    heavy_vals[heavy_vals == 0] = 0.5
    from hispmv_tpu.formats.matrix import COOMatrix

    return COOMatrix(
        (100, 2000),
        np.concatenate([base.rows, heavy_rows]),
        np.concatenate([base.cols, heavy_cols]),
        np.concatenate([base.values, heavy_vals]),
    )


@pytest.fixture(params=list(small_matrix_cases().keys()))
def small_matrix(request):
    return small_matrix_cases()[request.param]

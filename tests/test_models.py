"""Model layer tests — the model_test.py analog.

Builds the flax ThreeLayerFCModel, swaps its layers onto the Accelerator,
and compares whole-model outputs (apps/model_test.py flow)."""

import jax
import jax.numpy as jnp
import numpy as np

from hispmv_tpu.models import (
    AcceleratorLayerManager,
    SparseLinear,
    ThreeLayerFCModel,
    compare_model_outputs,
    extract_linears,
)


def test_sparse_linear_density():
    m = SparseLinear(features=256, density=0.1)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.ones((1, 128)))
    mask = np.asarray(vars_["constants"]["mask"])
    assert 0.05 < mask.mean() < 0.15
    # forward zeroes masked weights
    x = jnp.ones((2, 128))
    y = m.apply(vars_, x)
    assert y.shape == (2, 256)


def test_extract_linears_shapes_and_masks():
    model = ThreeLayerFCModel(hidden=96, out=32, density=0.2)
    vars_ = model.init(jax.random.PRNGKey(1), jnp.ones((1, 64)))
    linears = extract_linears(vars_)
    assert len(linears) == 3
    shapes = [w.shape for _, w, _ in linears]
    assert shapes == [(96, 64), (96, 96), (32, 96)]
    # sparse layers actually sparse
    d1 = np.count_nonzero(linears[1][1]) / linears[1][1].size
    assert d1 < 0.3
    # dense layer dense
    d0 = np.count_nonzero(linears[0][1]) / linears[0][1].size
    assert d0 > 0.9


def test_accelerated_model_matches_flax():
    model = ThreeLayerFCModel(hidden=96, out=32, density=0.2)
    rng = jax.random.PRNGKey(2)
    vars_ = model.init(rng, jnp.ones((1, 64)))
    mgr = AcceleratorLayerManager()
    accel_model = mgr.replace_layers(vars_)

    # dense first layer went dense, sparse layers went sparse
    fmts = [h.format for h, _ in accel_model.layers]
    assert fmts[0] == "dense"
    assert all(f in ("stream", "block") for f in fmts[1:])

    x = np.random.default_rng(3).standard_normal((4, 64)).astype(np.float32)
    want = model.apply(vars_, jnp.asarray(x))
    got = accel_model(x)
    stats = compare_model_outputs(got, want)
    assert stats.ok, (
        f"{stats.num_mismatches} mismatches, max rel {stats.max_rel_error}"
    )


def test_manager_budget_error():
    import pytest

    from hispmv_tpu.api import Accelerator

    model = ThreeLayerFCModel(hidden=64, out=16, density=0.2)
    vars_ = model.init(jax.random.PRNGKey(4), jnp.ones((1, 32)))
    mgr = AcceleratorLayerManager(Accelerator(budget_bytes=64))
    with pytest.raises(MemoryError):
        mgr.replace_layers(vars_)

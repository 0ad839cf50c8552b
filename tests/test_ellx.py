"""ELLX executor tests: base/overflow split, golden agreement, block_h=1."""

import numpy as np
import pytest

from hispmv_tpu.api import SpmvHandle
from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.synth import (
    arrowhead_coo,
    banded_coo,
    powerlaw_coo,
    random_coo,
    rmat_coo,
)
from hispmv_tpu.ops.spmv_ellx import (
    build_ellx_plan,
    choose_k_base,
    ellx_matvec_numpy,
)
from hispmv_tpu.plan.blocks import build_block_plan


def golden(coo, x):
    return (coo.to_scipy() @ x.astype(np.float64)).astype(np.float32)


@pytest.mark.parametrize("bh", [1, 8])
def test_ellx_plan_numpy_golden(bh):
    coo = arrowhead_coo(2000, 2000, 20_000, seed=1)
    plan = build_block_plan(coo, block_h=bh)
    eplan = build_ellx_plan(plan)
    assert eplan.k_base >= 1
    x = np.random.default_rng(2).standard_normal(2000).astype(np.float32)
    np.testing.assert_allclose(
        ellx_matvec_numpy(eplan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_ellx_overflow_split_conserves_nnz():
    coo = powerlaw_coo(1500, 1500, 40_000, seed=3)  # heavy hub rows
    plan = build_block_plan(coo, block_h=8)
    eplan = build_ellx_plan(plan, k_base=2)
    assert eplan.overflow is not None
    base_nnz = int(np.count_nonzero(eplan.base_data))
    over_nnz = int(np.count_nonzero(eplan.overflow.data))
    assert base_nnz + over_nnz == np.count_nonzero(plan.data)
    x = np.random.default_rng(4).standard_normal(1500).astype(np.float32)
    np.testing.assert_allclose(
        ellx_matvec_numpy(eplan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_choose_k_base_balances():
    # uniform counts: k_base should cover them (no overflow win)
    counts = np.full(1000, 4)
    assert choose_k_base(counts, 8) == 4
    # one huge row: k small, overflow takes the spike
    counts = np.full(1000, 1)
    counts[0] = 5000
    assert choose_k_base(counts, 8) <= 2


@pytest.mark.parametrize("bh", [1, 8, 16])
def test_ellx_handle_run(bh):
    coo = random_coo(700, 900, 9000, seed=5)
    h = SpmvHandle(coo, config=SpmvConfig(block_h=bh), format="ellx")
    assert h.format == "ellx"
    x = np.random.default_rng(6).standard_normal(900).astype(np.float32)
    got = np.asarray(h.run(x, alpha=2.0))
    np.testing.assert_allclose(got, 2.0 * golden(coo, x), rtol=1e-3, atol=1e-4)


def test_ellx_handle_col_reorder():
    coo = rmat_coo(2048, 2048, 30_000, seed=7)
    h = SpmvHandle(
        coo, config=SpmvConfig(col_reorder=True, block_h=8), format="ellx"
    )
    x = np.random.default_rng(8).standard_normal(2048).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_ellx_linear_batched():
    coo = banded_coo(512, 384, 6000, seed=9)
    h = SpmvHandle(coo, format="ellx")
    rng = np.random.default_rng(10)
    xb = rng.standard_normal((8, 384)).astype(np.float32)
    bias = rng.standard_normal(512).astype(np.float32)
    got = np.asarray(h.linear(xb, bias))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T + bias
    np.testing.assert_allclose(
        got, want.astype(np.float32), rtol=1e-3, atol=1e-4
    )


def test_ellx_heavy_overflow_handle():
    """Hub-heavy matrix exercises base+overflow through the handle."""
    coo = powerlaw_coo(1200, 1200, 30_000, seed=11)
    h = SpmvHandle(coo, format="ellx")
    if h._ellx_plan_meta.overflow is not None:
        assert "odata" in h._d
    x = np.random.default_rng(12).standard_normal(1200).astype(np.float32)
    y_in = np.random.default_rng(13).standard_normal(1200).astype(np.float32)
    got = np.asarray(h.run(x, y_in=y_in, alpha=1.5, beta=0.25))
    want = 1.5 * golden(coo, x) + 0.25 * y_in
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

"""Split (hub-hybrid) format tests — the HI-crossbar load-balance analog."""

import numpy as np
import pytest

from hispmv_tpu.api import SpmvHandle
from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.synth import (
    arrowhead_coo,
    powerlaw_coo,
    random_coo,
    rmat_coo,
)
from hispmv_tpu.plan.split import build_split_plan, split_matvec_numpy


def golden(coo, x):
    return (coo.to_scipy() @ x.astype(np.float64)).astype(np.float32)


def test_split_plan_finds_hubs():
    coo = arrowhead_coo(4000, 4000, 60_000, seed=1)
    plan = build_split_plan(coo, block_h=1)
    st = plan.stats
    assert st["kc"] > 0, "dense hub columns must be detected"
    assert st["kr"] > 0, "dense hub rows must be detected"
    assert plan.body is not None and st["body_nnz"] > 0
    x = np.random.default_rng(2).standard_normal(4000).astype(np.float32)
    np.testing.assert_allclose(
        split_matvec_numpy(plan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_split_plan_no_hubs_degenerates_to_body():
    coo = random_coo(1000, 1000, 5000, seed=3)  # uniform: no hubs
    plan = build_split_plan(coo, block_h=1)
    x = np.random.default_rng(4).standard_normal(1000).astype(np.float32)
    np.testing.assert_allclose(
        split_matvec_numpy(plan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("gen,seed", [(arrowhead_coo, 5), (powerlaw_coo, 6),
                                      (rmat_coo, 7)])
def test_split_handle_run(gen, seed):
    coo = gen(3000, 3000, 45_000, seed=seed)
    h = SpmvHandle(coo, config=SpmvConfig(block_h=1), format="split")
    assert h.format == "split"
    x = np.random.default_rng(8).standard_normal(3000).astype(np.float32)
    y_in = np.random.default_rng(9).standard_normal(3000).astype(np.float32)
    got = np.asarray(h.run(x, y_in=y_in, alpha=2.0, beta=0.5))
    want = 2.0 * golden(coo, x) + 0.5 * y_in
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_split_linear_batched():
    coo = arrowhead_coo(1024, 768, 16_000, seed=10)
    h = SpmvHandle(coo, config=SpmvConfig(block_h=1), format="split")
    rng = np.random.default_rng(11)
    xb = rng.standard_normal((4, 768)).astype(np.float32)
    bias = rng.standard_normal(1024).astype(np.float32)
    got = np.asarray(h.linear(xb, bias))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T + bias
    np.testing.assert_allclose(
        got, want.astype(np.float32), rtol=1e-3, atol=1e-4
    )


def test_split_nnz_partition_exact():
    """Every nnz lands in exactly one part."""
    coo = arrowhead_coo(2000, 2000, 30_000, seed=12)
    plan = build_split_plan(coo, block_h=1)
    hc = int(np.count_nonzero(plan.hub_col_dense)) if plan.hub_col_dense is not None else 0
    hr = int(np.count_nonzero(plan.hub_row_dense)) if plan.hub_row_dense is not None else 0
    from hispmv_tpu.ops.spmv_ellx import EllxPlan

    body = 0
    if isinstance(plan.body, EllxPlan):
        body = int(np.count_nonzero(plan.body.base_data))
        if plan.body.overflow is not None:
            body += int(np.count_nonzero(plan.body.overflow.data))
    elif plan.body is not None:  # RoutedPlan
        body = sum(
            int(np.count_nonzero(s.vals)) for s in plan.body.streams
        )
        body += len(plan.body.residual_vals)
    # duplicate coordinates merge in COO; count distinct coords
    assert hc + hr + body == coo.nnz


def test_ellx_and_split_plan_serialization_roundtrip(tmp_path):
    from hispmv_tpu.ops.spmv_ellx import build_ellx_plan
    from hispmv_tpu.plan import load_plan, save_plan
    from hispmv_tpu.plan.blocks import build_block_plan

    coo = arrowhead_coo(2500, 2500, 40_000, seed=20)
    x = np.random.default_rng(21).standard_normal(2500).astype(np.float32)
    want = golden(coo, x)
    eplan = build_ellx_plan(build_block_plan(coo, block_h=1))
    splan = build_split_plan(coo, block_h=1)
    for plan in (eplan, splan):
        p = str(tmp_path / "p.npz")
        save_plan(p, plan)
        h = SpmvHandle.from_plan(load_plan(p))
        assert h.nnz == coo.nnz and h.shape == coo.shape
        np.testing.assert_allclose(
            np.asarray(h.run(x)), want, rtol=1e-3, atol=1e-4
        )


def test_split_with_routed_body():
    """Banded body + Zipf hubs: the split planner must pick the routed
    body and the handle must execute the full stack correctly."""
    from hispmv_tpu.formats.synth import banded_coo
    from hispmv_tpu.formats.matrix import COOMatrix
    from hispmv_tpu.plan.routed import RoutedPlan

    base = banded_coo(4000, 4000, 80_000, seed=60)
    rng = np.random.default_rng(61)
    # add 4 dense hub rows + 4 dense hub cols
    hr = rng.choice(4000, 4, replace=False)
    hc = rng.choice(4000, 4, replace=False)
    r = np.concatenate([base.rows] + [np.full(2000, h) for h in hr]
                       + [rng.integers(0, 4000, 2000) for _ in hc])
    c = np.concatenate([base.cols] + [rng.integers(0, 4000, 2000) for _ in hr]
                       + [np.full(2000, h) for h in hc])
    v = rng.standard_normal(len(r)).astype(np.float32)
    key = r * 4000 + c
    _, idx = np.unique(key, return_index=True)
    coo = COOMatrix((4000, 4000), r[idx], c[idx], v[idx])

    plan = build_split_plan(coo, body_format="routed")
    assert isinstance(plan.body, RoutedPlan)
    x = rng.standard_normal(4000).astype(np.float32)
    np.testing.assert_allclose(
        split_matvec_numpy(plan, x), golden(coo, x), rtol=1e-3, atol=1e-3
    )
    h = SpmvHandle.from_plan(plan)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-3
    )
    h2 = SpmvHandle(coo, format="split")
    np.testing.assert_allclose(
        np.asarray(h2.run(x)), golden(coo, x), rtol=1e-3, atol=1e-3
    )

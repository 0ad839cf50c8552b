"""Block-ELL planner + Pallas kernel golden tests (interpret mode on CPU).

Differential testing against scipy, rtol=1e-3 acceptance
(reference apps/general_test.py:104-116)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hispmv_tpu.formats.synth import banded_coo, powerlaw_coo, random_coo
from hispmv_tpu.plan.blocks import (
    BlockPlan,
    block_plan_matvec_numpy,
    build_block_plan,
    degree_column_perm,
)
from hispmv_tpu.ops.spmv_block import spmv_block


def golden(coo, x, y_in=None, alpha=1.0, beta=0.0):
    y = alpha * (coo.to_scipy() @ x.astype(np.float64))
    if y_in is not None:
        y = y + beta * y_in
    return y.astype(np.float32)


def test_block_plan_covers_all_nnz(small_matrix):
    plan = build_block_plan(small_matrix, block_h=8)
    assert plan.data.shape[0] == len(plan.block_rows)
    # Every nonzero is represented: numpy executor equals scipy.
    x = np.random.default_rng(0).standard_normal(small_matrix.num_cols)
    x = x.astype(np.float32)
    np.testing.assert_allclose(
        block_plan_matvec_numpy(plan, x),
        golden(small_matrix, x),
        rtol=1e-3,
        atol=1e-5,
    )


def test_block_plan_sorted_and_firsts():
    coo = powerlaw_coo(300, 300, 5000, seed=0)
    plan = build_block_plan(coo, block_h=8)
    rb = plan.block_rows
    assert np.all(np.diff(rb) >= 0), "blocks must be sorted by row-block"
    # every row-block present exactly where firsts says
    firsts = np.ones(len(rb), np.int32)
    firsts[1:] = (rb[1:] != rb[:-1]).astype(np.int32)
    np.testing.assert_array_equal(firsts, plan.block_firsts)
    # all row blocks visited
    assert set(rb.tolist()) == set(range(plan.num_row_blocks))


@pytest.mark.parametrize("block_h", [8, 16])
def test_block_pallas_interpret(small_matrix, block_h):
    plan = build_block_plan(small_matrix, block_h=block_h)
    x = np.random.default_rng(1).standard_normal(small_matrix.num_cols)
    x = x.astype(np.float32)
    got = np.asarray(spmv_block(plan, x, interpret=True))
    np.testing.assert_allclose(
        got, golden(small_matrix, x), rtol=1e-3, atol=1e-5
    )


def test_block_pallas_axpby():
    coo = random_coo(257, 191, 4000, seed=2)
    plan = build_block_plan(coo, block_h=8)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(191).astype(np.float32)
    y_in = rng.standard_normal(257).astype(np.float32)
    got = np.asarray(
        spmv_block(plan, x, y_in, alpha=1.5, beta=-0.25, interpret=True)
    )
    np.testing.assert_allclose(
        got, golden(coo, x, y_in, 1.5, -0.25), rtol=1e-3, atol=1e-4
    )


def test_degree_column_perm_improves_fill():
    # strong hubs (rank exponent 1.5) — the soc-Pokec-like regime where
    # degree reordering pays off
    coo = powerlaw_coo(2000, 2000, 40_000, seed=4, alpha=1.5)
    base = build_block_plan(coo, block_h=8)
    perm = degree_column_perm(coo)
    permuted = build_block_plan(coo, block_h=8, col_perm=perm)
    assert permuted.fill > base.fill * 1.2, (
        f"degree reorder should densify blocks: {base.fill:.4f} -> "
        f"{permuted.fill:.4f}"
    )
    # and stays correct
    x = np.random.default_rng(5).standard_normal(2000).astype(np.float32)
    np.testing.assert_allclose(
        block_plan_matvec_numpy(permuted, x),
        golden(coo, x),
        rtol=1e-3,
        atol=1e-5,
    )
    got = np.asarray(spmv_block(permuted, x, interpret=True))
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-4)


def test_empty_row_blocks_zeroed():
    # Matrix with a fully-empty band of rows: their y must come out 0.
    rows = np.array([0, 1, 60, 61], np.int32)
    cols = np.array([0, 5, 7, 2], np.int32)
    vals = np.ones(4, np.float32)
    from hispmv_tpu.formats.matrix import COOMatrix

    coo = COOMatrix((64, 130), rows, cols, vals)
    plan = build_block_plan(coo, block_h=8)
    x = np.ones(130, np.float32)
    got = np.asarray(spmv_block(plan, x, interpret=True))
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-6)
    assert np.all(got[8:56] == 0)


def test_chunked_paneled_kernel_interpret():
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_chunked import (
        pack_chunks_paneled,
        spmv_chunked_paneled_pallas,
    )
    from hispmv_tpu.plan.blocks import LANES, build_block_plan
    from hispmv_tpu.formats.synth import powerlaw_coo

    # matrix wide enough for several panels at panel_ncb=4
    coo = powerlaw_coo(600, 3000, 25_000, seed=30)
    plan = build_block_plan(coo, block_h=8)
    panel_ncb = 4  # 512-column panels
    data3d, meta, panel_ids, _ = pack_chunks_paneled(plan, 16, panel_ncb)
    npanels = -(-plan.num_col_blocks // panel_ncb)
    x = np.zeros(npanels * panel_ncb * LANES, np.float32)
    rng = np.random.default_rng(31)
    x[:3000] = rng.standard_normal(3000)
    y = spmv_chunked_paneled_pallas(
        jnp.asarray(data3d), jnp.asarray(meta), jnp.asarray(panel_ids),
        jnp.asarray(x.reshape(-1, LANES)),
        plan.num_row_blocks, 8, 16, panel_ncb, interpret=True,
    )
    got = np.asarray(y).reshape(-1)[:600]
    want = coo.to_scipy() @ x[:3000].astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_paneled_matches_unpaneled():
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_chunked import (
        pack_chunks_paneled,
        spmv_chunked,
        spmv_chunked_paneled_pallas,
    )
    from hispmv_tpu.plan.blocks import LANES, build_block_plan
    from hispmv_tpu.formats.synth import banded_coo

    coo = banded_coo(500, 2600, 20_000, seed=32)
    plan = build_block_plan(coo, block_h=8)
    x = np.random.default_rng(33).standard_normal(2600).astype(np.float32)
    y_ref = np.asarray(spmv_chunked(plan, x, chunk=16, interpret=True))
    panel_ncb = 8
    data3d, meta, panel_ids, _ = pack_chunks_paneled(plan, 16, panel_ncb)
    npanels = -(-plan.num_col_blocks // panel_ncb)
    xp = np.zeros(npanels * panel_ncb * LANES, np.float32)
    xp[:2600] = x
    y = spmv_chunked_paneled_pallas(
        jnp.asarray(data3d), jnp.asarray(meta), jnp.asarray(panel_ids),
        jnp.asarray(xp.reshape(-1, LANES)),
        plan.num_row_blocks, 8, 16, panel_ncb, interpret=True,
    )
    got = np.asarray(y).reshape(-1)[:500]
    np.testing.assert_allclose(got, y_ref, rtol=1e-4, atol=1e-5)


def test_bf16_payload_chunked_interpret():
    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.config import SpmvConfig
    from hispmv_tpu.formats.synth import blocked_coo

    coo = blocked_coo(800, 800, 40_000, seed=50)
    h = SpmvHandle(
        coo, config=SpmvConfig(block_h=8, value_dtype="bfloat16"),
        format="block",
    )
    assert h._chunked
    x = np.random.default_rng(51).standard_normal(800).astype(np.float32)
    got = np.asarray(h.run(x))
    want = coo.to_scipy() @ x.astype(np.float64)
    # bf16 values: ~0.4% relative error per product, ~0.03 absolute on
    # O(1)-magnitude sums of ~50 products
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)
    # and fp32 stays tight
    h32 = SpmvHandle(coo, config=SpmvConfig(block_h=8), format="block")
    np.testing.assert_allclose(
        np.asarray(h32.run(x)), want, rtol=1e-3, atol=1e-4
    )


def test_paneled_bf16_interpret():
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_chunked import (
        pack_chunks_paneled,
        spmv_chunked_paneled_pallas,
    )
    from hispmv_tpu.plan.blocks import LANES, build_block_plan
    from hispmv_tpu.formats.synth import banded_coo

    coo = banded_coo(300, 2600, 9000, seed=60)
    plan = build_block_plan(coo, block_h=8)
    panel_ncb = 8
    data3d, meta, panel_ids, _ = pack_chunks_paneled(
        plan, 16, panel_ncb, dtype="bfloat16"
    )
    assert str(data3d.dtype) == "bfloat16"
    npanels = -(-plan.num_col_blocks // panel_ncb)
    xp = np.zeros(npanels * panel_ncb * LANES, np.float32)
    x = np.random.default_rng(61).standard_normal(2600).astype(np.float32)
    xp[:2600] = x
    y = spmv_chunked_paneled_pallas(
        jnp.asarray(data3d), jnp.asarray(meta), jnp.asarray(panel_ids),
        jnp.asarray(xp.reshape(-1, LANES)),
        plan.num_row_blocks, 8, 16, panel_ncb, interpret=True,
    )
    got = np.asarray(y).reshape(-1)[:300]
    want = coo.to_scipy() @ x.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=6e-2)


def _tiled_golden_check(coo, panel_ncb, panel_nrb, bh=8, chunk=16, dtype=np.float32):
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_chunked import (
        pack_chunks_tiled,
        spmv_chunked_tiled_pallas,
    )
    from hispmv_tpu.plan.blocks import build_block_plan

    plan = build_block_plan(coo, block_h=bh)
    d3, meta, xp, yp, yf, _ = pack_chunks_tiled(
        plan, chunk, panel_ncb, panel_nrb, dtype=dtype
    )
    npx = -(-plan.num_col_blocks // panel_ncb)
    npy = -(-plan.num_row_blocks // panel_nrb)
    x = np.random.default_rng(7).standard_normal(coo.shape[1])
    x = x.astype(np.float32)
    xpad = np.zeros(npx * panel_ncb * 128, np.float32)
    xpad[: coo.shape[1]] = x
    y = spmv_chunked_tiled_pallas(
        jnp.asarray(d3), jnp.asarray(meta), jnp.asarray(xp),
        jnp.asarray(yp), jnp.asarray(yf),
        jnp.asarray(xpad).reshape(-1, 128),
        npy, panel_nrb, bh, chunk, panel_ncb, interpret=True,
    )
    got = np.asarray(y).reshape(-1)[: coo.shape[0]]
    want = coo.to_scipy() @ x.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_chunked_tiled_kernel_interpret():
    from hispmv_tpu.formats.synth import banded_coo

    coo = banded_coo(3000, 9000, 60_000, seed=40)
    _tiled_golden_check(coo, panel_ncb=16, panel_nrb=64)


def test_chunked_tiled_matches_resident():
    """Tiled result must equal the resident chunked kernel bit-for-bit
    modulo accumulation order (rtol)."""
    from hispmv_tpu.formats.synth import random_coo

    coo = random_coo(1500, 5000, 40_000, seed=41)
    _tiled_golden_check(coo, panel_ncb=8, panel_nrb=32)


def test_chunked_tiled_bf16_interpret():
    from hispmv_tpu.formats.synth import blocked_coo
    from hispmv_tpu.formats.matrix import COOMatrix

    coo = blocked_coo(2000, 4000, 50_000, seed=42)
    v = np.round(
        np.random.default_rng(43).uniform(-4, 4, coo.nnz)
    ).astype(np.float32)
    v[v == 0] = 1.0
    coo = COOMatrix(coo.shape, coo.rows, coo.cols, v)
    _tiled_golden_check(coo, panel_ncb=8, panel_nrb=64, dtype="bfloat16")


def test_chunked_tiled_empty_row_panels():
    """Row panels whose rows are all empty must still emit zeros."""
    from hispmv_tpu.formats.matrix import COOMatrix

    rows = np.array([0, 1, 900, 901], np.int64)
    cols = np.array([5, 700, 3, 1400], np.int64)
    vals = np.ones(4, np.float32)
    coo = COOMatrix((1000, 1500), rows, cols, vals)
    _tiled_golden_check(coo, panel_ncb=4, panel_nrb=16)

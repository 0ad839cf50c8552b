"""SpmvHandle / Accelerator API tests — the general_test.py analog.

Covers: auto format dispatch, prepare-once/run-many, multi-matrix residency,
batched linear, memory budget, golden verification."""

import numpy as np
import pytest

from hispmv_tpu.api import Accelerator, SpmvHandle, prepare
from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.matrix import coo_from_dense
from hispmv_tpu.formats.synth import (
    banded_coo,
    powerlaw_coo,
    random_coo,
)


def golden(coo, x, y_in=None, alpha=1.0, beta=0.0):
    y = alpha * (coo.to_scipy() @ x.astype(np.float64))
    if y_in is not None:
        y = y + beta * y_in
    return y.astype(np.float32)


@pytest.mark.parametrize("fmt", ["stream", "block", "dense"])
def test_handle_formats_agree(fmt):
    coo = random_coo(300, 200, 4000, seed=0)
    h = SpmvHandle(coo, format=fmt)
    assert h.format == fmt
    x = np.random.default_rng(1).standard_normal(200).astype(np.float32)
    got = np.asarray(h.run(x))
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-4)


def test_handle_axpby_and_repeat():
    coo = banded_coo(400, 400, 4000, seed=1)
    h = prepare(coo)
    rng = np.random.default_rng(2)
    for _ in range(3):  # run-many with the same handle
        x = rng.standard_normal(400).astype(np.float32)
        y_in = rng.standard_normal(400).astype(np.float32)
        got = np.asarray(h.run(x, y_in, alpha=2.0, beta=0.5))
        np.testing.assert_allclose(
            got, golden(coo, x, y_in, 2.0, 0.5), rtol=1e-3, atol=1e-4
        )


def test_auto_dispatch_dense():
    dense = np.random.default_rng(0).standard_normal((64, 130))
    dense = dense.astype(np.float32)
    coo = coo_from_dense(dense)  # density ~1.0
    h = SpmvHandle(coo, format="auto")
    assert h.format == "dense"


def test_auto_dispatch_ellx_for_hypersparse():
    coo = random_coo(5000, 100_000, 20_000, seed=3)  # ~1 nnz per block
    h = SpmvHandle(coo, format="auto")
    assert h.format == "ellx"
    x = np.random.default_rng(1).standard_normal(100_000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_auto_dispatch_block_for_clustered():
    from hispmv_tpu.formats.synth import blocked_coo

    coo = blocked_coo(2000, 2000, 300_000, seed=4)
    h = SpmvHandle(coo, format="auto")
    assert h.format == "block"


def test_verify_method():
    coo = powerlaw_coo(300, 300, 5000, seed=5)
    stats = SpmvHandle(coo, format="stream").verify()
    assert stats.ok, f"max rel err {stats.max_rel_error}"


@pytest.mark.parametrize("fmt", ["block", "dense", "stream", "window"])
def test_linear_batched(fmt):
    coo = random_coo(256, 192, 6000, seed=6)
    h = SpmvHandle(coo, format=fmt)
    rng = np.random.default_rng(7)
    xb = rng.standard_normal((8, 192)).astype(np.float32)
    bias = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(h.linear(xb, bias))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T + bias
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-3, atol=1e-4)
    # single-vector shape passthrough
    got1 = np.asarray(h.linear(xb[0], bias))
    np.testing.assert_allclose(got1, got[0], rtol=1e-5, atol=1e-6)


def test_accelerator_residency_and_select():
    acc = Accelerator()
    coo_a = random_coo(100, 80, 800, seed=8)
    coo_b = banded_coo(200, 200, 2000, seed=9)
    dense_w = np.random.default_rng(10).standard_normal((50, 40)).astype(np.float32)
    ia = acc.create_sparse_handle(coo_a, format="stream")
    ib = acc.create_sparse_handle(coo_b, format="block")
    ic = acc.create_dense_handle(dense_w)
    assert {ia, ib, ic} == {0, 1, 2}
    acc.load_matrices()
    assert acc.loaded and acc.resident_bytes > 0

    xa = np.random.default_rng(11).standard_normal(80).astype(np.float32)
    xb = np.random.default_rng(12).standard_normal(200).astype(np.float32)
    xc = np.random.default_rng(13).standard_normal(40).astype(np.float32)

    acc.select_matrix(ib)
    np.testing.assert_allclose(
        np.asarray(acc.run_kernel(xb)), golden(coo_b, xb), rtol=1e-3, atol=1e-4
    )
    acc.select_matrix(ia)
    np.testing.assert_allclose(
        np.asarray(acc.run_kernel(xa)), golden(coo_a, xa), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(acc.linear(ic, xc)), dense_w @ xc, rtol=1e-3, atol=1e-4
    )


def test_accelerator_budget_exhaustion():
    acc = Accelerator(budget_bytes=1)  # absurdly small
    mid = acc.create_sparse_handle(random_coo(100, 100, 500, seed=14))
    assert mid == -1  # fpga_handle.cpp:192-195 contract


def test_block_with_col_reorder_config():
    coo = powerlaw_coo(1000, 1000, 30_000, seed=15)
    h = SpmvHandle(
        coo, config=SpmvConfig(col_reorder=True), format="block"
    )
    x = np.random.default_rng(16).standard_normal(1000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_plan_serialization_roundtrip(tmp_path):
    from hispmv_tpu.plan import (
        build_block_plan,
        build_window_plan,
        load_plan,
        save_plan,
    )
    from hispmv_tpu.plan.partition import build_plan as build_stream_plan

    coo = random_coo(300, 400, 5000, seed=20)
    x = np.random.default_rng(21).standard_normal(400).astype(np.float32)
    want = golden(coo, x)
    for plan in [
        build_block_plan(coo, block_h=8),
        build_window_plan(coo, block_h=8),
        build_stream_plan(coo),
    ]:
        p = str(tmp_path / "plan.npz")
        save_plan(p, plan)
        loaded = load_plan(p)
        h = SpmvHandle.from_plan(loaded)
        assert h.nnz == coo.nnz and h.shape == coo.shape
        got = np.asarray(h.run(x))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_paneled_handle_for_wide_matrix():
    # force the paneled path with a tiny budget
    coo = banded_coo(2000, 40_000, 200_000, seed=22)
    h = SpmvHandle(coo, format="block")
    h2 = SpmvHandle.__new__(SpmvHandle)  # unused; keep API simple
    del h2
    # patch budget to force paneling on a rebuilt handle
    old = SpmvHandle._CHUNKED_VMEM_BUDGET
    try:
        SpmvHandle._CHUNKED_VMEM_BUDGET = 12 * 2**20
        SpmvHandle._PANEL_NCB = 64  # tiny panels (8192 cols)
        hp = SpmvHandle(coo, format="block")
        assert getattr(hp, "_paneled", False) or hp._chunked
        x = np.random.default_rng(23).standard_normal(40_000)
        x = x.astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(hp.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
        )
    finally:
        SpmvHandle._CHUNKED_VMEM_BUDGET = old
        SpmvHandle._PANEL_NCB = 4096


def test_paneled_path_satisfiable_with_shipped_constants():
    """The paneled dispatch must be reachable WITHOUT patching class
    attributes: panel double-buffer + chunk buffers + a plausible resident y
    must fit the shipped VMEM budget (ADVICE round-1, handle.py:240)."""
    h = SpmvHandle.__new__(SpmvHandle)
    h.config = SpmvConfig()

    class FakePlan:
        block_h = 8
        num_row_blocks = 25_000  # 200k rows resident y = 0.8 MiB
        num_col_blocks = 40_000  # 5.1M cols: x alone would blow VMEM

    assert not h._block_fits_chunked(FakePlan())
    assert h._block_fits_paneled(FakePlan())


def test_from_plan_preserves_col_perm(tmp_path):
    """Serialize/reload of a column-reordered plan must still permute x
    (round-1 ADVICE high: from_plan dropped col_perm)."""
    from hispmv_tpu.plan import load_plan, save_plan
    from hispmv_tpu.plan.blocks import build_block_plan, degree_column_perm

    coo = powerlaw_coo(600, 600, 12_000, seed=30)
    perm = degree_column_perm(coo)
    plan = build_block_plan(coo, block_h=8, col_perm=perm)
    p = str(tmp_path / "perm_plan.npz")
    save_plan(p, plan)
    h = SpmvHandle.from_plan(load_plan(p))
    assert "perm" in h._d
    x = np.random.default_rng(31).standard_normal(600).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_linear_batch_size_alternation():
    """Batch runners must be self-contained per batch size: after a batch
    that picks a different kernel path, earlier sizes must still work
    (round-1 ADVICE medium: shared _use_chunked_batch state)."""
    coo = random_coo(256, 192, 6000, seed=32)
    h = SpmvHandle(coo, format="block")
    assert h._chunked
    rng = np.random.default_rng(33)
    want = coo.to_scipy()

    def check(B):
        xb = rng.standard_normal((B, 192)).astype(np.float32)
        got = np.asarray(h.linear(xb))
        np.testing.assert_allclose(
            got, (want @ xb.astype(np.float64).T).T.astype(np.float32),
            rtol=1e-3, atol=1e-4,
        )

    check(8)
    # force the per-block fallback for a larger batch, then return to B=8
    old = SpmvHandle._CHUNKED_VMEM_BUDGET
    try:
        SpmvHandle._CHUNKED_VMEM_BUDGET = 1  # any batch kernel won't "fit"
        check(16)
    finally:
        SpmvHandle._CHUNKED_VMEM_BUDGET = old
    check(8)


def test_tiled_handle_for_huge_matrix():
    """x AND y past the VMEM budget must dispatch to the fully-tiled
    kernel (row-tiling analog), not the slow per-block kernel."""
    coo = banded_coo(30_000, 30_000, 120_000, seed=50)
    old_b = SpmvHandle._CHUNKED_VMEM_BUDGET
    old_p = SpmvHandle._PANEL_NCB
    old_y = SpmvHandle._PANEL_Y_BYTES
    try:
        SpmvHandle._CHUNKED_VMEM_BUDGET = 64 * 1024
        SpmvHandle._PANEL_NCB = 16
        SpmvHandle._PANEL_Y_BYTES = 8 * 1024
        h = SpmvHandle(coo, format="block")
        assert getattr(h, "_tiled", False)
        x = np.random.default_rng(51).standard_normal(30_000)
        x = x.astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-4
        )
    finally:
        SpmvHandle._CHUNKED_VMEM_BUDGET = old_b
        SpmvHandle._PANEL_NCB = old_p
        SpmvHandle._PANEL_Y_BYTES = old_y

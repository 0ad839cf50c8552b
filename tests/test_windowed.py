"""Windowed block-ELL planner + kernel golden tests."""

import numpy as np
import pytest

from hispmv_tpu.formats.synth import (
    banded_coo,
    blocked_coo,
    powerlaw_coo,
    random_coo,
)
from hispmv_tpu.plan.blocks import build_block_plan
from hispmv_tpu.plan.windows import (
    build_window_plan,
    window_plan_matvec_numpy,
)
from hispmv_tpu.ops.spmv_windowed import spmv_windowed


def golden(coo, x):
    return (coo.to_scipy() @ x.astype(np.float64)).astype(np.float32)


CASES = {
    "random": random_coo(500, 700, 8000, seed=0),
    "powerlaw": powerlaw_coo(1500, 1500, 30_000, seed=1),
    "banded": banded_coo(600, 600, 9000, seed=2),
    "blocked": blocked_coo(512, 512, 40_000, seed=3),
    "tiny": random_coo(5, 9, 7, seed=4),
    "wide": random_coo(64, 5000, 2000, seed=5),
}


@pytest.mark.parametrize("name", list(CASES))
def test_window_plan_numpy_golden(name):
    coo = CASES[name]
    plan = build_window_plan(coo, block_h=8)
    x = np.random.default_rng(1).standard_normal(coo.num_cols)
    x = x.astype(np.float32)
    np.testing.assert_allclose(
        window_plan_matvec_numpy(plan, x), golden(coo, x),
        rtol=1e-3, atol=1e-5,
    )


@pytest.mark.parametrize("name", ["random", "powerlaw", "tiny", "wide"])
def test_windowed_kernel_interpret(name):
    coo = CASES[name]
    plan = build_window_plan(coo, block_h=8)
    x = np.random.default_rng(2).standard_normal(coo.num_cols)
    x = x.astype(np.float32)
    got = np.asarray(spmv_windowed(plan, x, chunk=16, interpret=True))
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-5)


def test_windowed_axpby():
    coo = CASES["powerlaw"]
    plan = build_window_plan(coo, block_h=16)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(coo.num_cols).astype(np.float32)
    y_in = rng.standard_normal(coo.num_rows).astype(np.float32)
    got = np.asarray(
        spmv_windowed(plan, x, y_in, 1.5, -0.5, chunk=16, interpret=True)
    )
    want = 1.5 * golden(coo, x) + -0.5 * y_in
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_windowed_fill_beats_plain_on_scattered():
    coo = random_coo(4000, 4000, 60_000, seed=6)  # ~1 nnz per plain block
    plain = build_block_plan(coo, block_h=8)
    win = build_window_plan(coo, block_h=8)
    assert win.fill > 2.5 * plain.fill, (plain.fill, win.fill)


def test_layers_bounded_by_segs():
    coo = powerlaw_coo(1000, 1000, 50_000, seed=7)
    plan = build_window_plan(coo, block_h=8)
    # per (rb, wb) at most SEGS layers
    from collections import Counter

    c = Counter(zip(plan.block_rows.tolist(), plan.block_wins.tolist()))
    assert max(c.values()) <= 8


def test_empty_matrix_window_plan():
    from hispmv_tpu.formats.matrix import COOMatrix

    coo = COOMatrix(
        (16, 200),
        np.zeros(0, np.int32),
        np.zeros(0, np.int32),
        np.zeros(0, np.float32),
    )
    plan = build_window_plan(coo, block_h=8)
    assert plan.num_blocks == plan.num_row_blocks  # all zero blocks
    x = np.ones(200, np.float32)
    got = np.asarray(spmv_windowed(plan, x, chunk=8, interpret=True))
    np.testing.assert_allclose(got, np.zeros(16), atol=0)


def test_windowed_batched_kernel_interpret():
    from hispmv_tpu.ops.spmv_windowed import (
        pack_batch_x,
        pack_window_chunks,
        spmv_windowed_batched_pallas,
    )
    from hispmv_tpu.plan.windows import SEGS, LANES
    import jax.numpy as jnp

    coo = CASES["powerlaw"]
    plan = build_window_plan(coo, block_h=8)
    d3, s3, meta, _ = pack_window_chunks(plan, 16)
    B = 4
    Cp = plan.num_windows * SEGS * LANES
    xb = np.zeros((B, Cp), np.float32)
    rng = np.random.default_rng(9)
    xb[:, : coo.num_cols] = rng.standard_normal((B, coo.num_cols))
    xp = pack_batch_x(jnp.asarray(xb), plan.num_windows)
    y = spmv_windowed_batched_pallas(
        jnp.asarray(d3), jnp.asarray(s3), jnp.asarray(meta), xp,
        plan.num_row_blocks, 8, 16, interpret=True,
    )
    got = np.asarray(y).reshape(-1, B)[: coo.num_rows].T  # wrong? (nrb*bh, B)
    got = np.asarray(y).reshape(plan.num_row_blocks * 8, B)[: coo.num_rows].T
    want = (coo.to_scipy() @ xb[:, : coo.num_cols].astype(np.float64).T).T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_windowed_linear_batch_tiling_past_64():
    """B>64 must tile the batch over wide-gather panels (one A re-stream
    per panel), not loop per vector; result matches scipy."""
    import numpy as np

    from hispmv_tpu.api import SpmvHandle
    from hispmv_tpu.formats.synth import random_coo

    coo = random_coo(256, 2048, 20_000, seed=80)
    h = SpmvHandle(coo, format="window")
    rng = np.random.default_rng(81)
    xb = rng.standard_normal((96, 2048)).astype(np.float32)
    got = np.asarray(h.linear(xb))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T
    np.testing.assert_allclose(
        got, want.astype(np.float32), rtol=1e-3, atol=1e-4
    )

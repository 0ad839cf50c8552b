"""Routed-stream planner + executor tests (the crossbar-analog format)."""

import numpy as np
import pytest

from hispmv_tpu.formats.synth import (
    arrowhead_coo,
    banded_coo,
    powerlaw_coo,
    random_coo,
    rmat_coo,
)
from hispmv_tpu.plan.routed import build_routed_plan, routed_matvec_numpy


def golden(coo, x):
    return (coo.to_scipy() @ x.astype(np.float64)).astype(np.float32)


@pytest.mark.parametrize(
    "gen,shape,nnz,seed",
    [
        (random_coo, (700, 900), 9_000, 1),
        (banded_coo, (2000, 2000), 30_000, 2),
        (powerlaw_coo, (1500, 1500), 25_000, 3),
        (arrowhead_coo, (3000, 3000), 40_000, 4),
        (rmat_coo, (2048, 2048), 30_000, 5),
    ],
)
def test_routed_plan_numpy_golden(gen, shape, nnz, seed):
    coo = gen(shape[0], shape[1], nnz, seed=seed)
    plan = build_routed_plan(coo)
    x = np.random.default_rng(10).standard_normal(shape[1])
    x = x.astype(np.float32)
    got = routed_matvec_numpy(plan, x)
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-4)
    # layered routing leaves only extreme-rank conflicts in the residual
    # (R-MAT's hub columns overflow the pass-1 conflict budget by design —
    # hubs are the split format's job, so allow a larger residual there)
    cap = 0.10 if gen is rmat_coo else 0.05
    assert len(plan.residual_vals) < cap * coo.nnz, (
        len(plan.residual_vals), coo.nnz)


def test_routed_plan_small_and_edge_cases():
    from hispmv_tpu.formats.matrix import COOMatrix

    # single nnz; nnz at matrix corners; duplicate-column rows
    rows = np.array([0, 0, 0, 1023, 500, 500], np.int64)
    cols = np.array([0, 127, 128, 2047, 700, 700 + 1024], np.int64)
    vals = np.arange(1, 7, dtype=np.float32)
    coo = COOMatrix((1024, 2048), rows, cols, vals)
    plan = build_routed_plan(coo)
    x = np.random.default_rng(11).standard_normal(2048).astype(np.float32)
    np.testing.assert_allclose(
        routed_matvec_numpy(plan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_routed_plan_row_spanning_tiles():
    """A single dense row spanning multiple tiles must accumulate all its
    partial runs."""
    from hispmv_tpu.formats.matrix import COOMatrix

    n = 3000  # one row, 3000 nnz in one window? no — spread over windows
    rows = np.zeros(n, np.int64)
    cols = np.arange(n, dtype=np.int64)  # covers ~3 windows
    vals = np.ones(n, np.float32)
    coo = COOMatrix((8, 4096), rows, cols, vals)
    plan = build_routed_plan(coo)
    x = np.random.default_rng(12).standard_normal(4096).astype(np.float32)
    np.testing.assert_allclose(
        routed_matvec_numpy(plan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_routed_stream_bytes_per_nnz_reasonable():
    # dense-banded structure: the format's home turf must stay lean
    coo = banded_coo(20_000, 20_000, 400_000, seed=6)
    plan = build_routed_plan(coo)
    bpn = plan.stream_bytes / coo.nnz
    assert bpn < 120, f"stream bytes/nnz {bpn:.0f} too high"
    assert plan.lmax <= 16, plan.lmax
    assert plan.fill > 0.5


def _routed_kernel_check(coo, interpret=True):
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_routed import (
        pack_stream,
        spmv_routed_stream_pallas,
    )
    from hispmv_tpu.plan.routed import WINDOW, build_routed_plan

    plan = build_routed_plan(coo)
    C = coo.shape[1]
    x = np.random.default_rng(33).standard_normal(C).astype(np.float32)
    xp = np.zeros(plan.num_windows * WINDOW, np.float32)
    xp[:C] = x
    x2d = jnp.asarray(xp).reshape(-1, 128)
    y = np.zeros(plan.num_ytiles * WINDOW, np.float64)
    for s in plan.streams:
        for packed, dims in pack_stream(s, tchunk=4):
            arrs = tuple(jnp.asarray(a) for a in packed)
            y2d = spmv_routed_stream_pallas(
                arrs, dims, x2d, plan.num_ytiles, interpret=interpret,
            )
            y += np.asarray(y2d).reshape(-1).astype(np.float64)
    y = y[: coo.shape[0]]
    # add residual on host for the comparison
    if len(plan.residual_vals):
        np.add.at(
            y, plan.residual_rows,
            plan.residual_vals.astype(np.float64) * x[plan.residual_cols],
        )
    want = coo.to_scipy() @ x.astype(np.float64)
    np.testing.assert_allclose(y, want, rtol=1e-3, atol=1e-3)


def test_routed_kernel_interpret_banded():
    coo = banded_coo(3000, 3000, 40_000, seed=40)
    _routed_kernel_check(coo)


def test_routed_kernel_interpret_arrowhead():
    coo = arrowhead_coo(4000, 4000, 50_000, seed=41)
    _routed_kernel_check(coo)


def test_routed_kernel_interpret_random():
    coo = random_coo(1500, 2500, 20_000, seed=42)
    _routed_kernel_check(coo)


@pytest.mark.parametrize(
    "N,nnz",
    [
        (900, 9_000),
        pytest.param(3000, 40_000, marks=pytest.mark.slow),
    ],
)
def test_routed_handle_run_and_linear(N, nnz):
    from hispmv_tpu.api import SpmvHandle

    coo = banded_coo(N, N, nnz, seed=50)
    h = SpmvHandle(coo, format="routed")
    assert h.format == "routed"
    x = np.random.default_rng(51).standard_normal(N).astype(np.float32)
    y_in = np.random.default_rng(52).standard_normal(N).astype(np.float32)
    got = np.asarray(h.run(x, y_in=y_in, alpha=2.0, beta=0.5))
    want = 2.0 * golden(coo, x) + 0.5 * y_in
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    xb = np.random.default_rng(53).standard_normal((3, N)).astype(np.float32)
    gotb = np.asarray(h.linear(xb))
    wantb = (coo.to_scipy() @ xb.astype(np.float64).T).T
    np.testing.assert_allclose(
        gotb, wantb.astype(np.float32), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("R,n", [(2000, 30), (512, 60)])
def test_routed_handle_with_residual(R, n):
    """One nnz per macro cell at every auto strip width (stride 16384 =
    the widest 16-window strip): every candidate tile costs more than the
    element scatter, so the whole matrix demotes to the residual and must
    still be exact.  The (2000, 30) case is small enough for the COO
    element-scatter residual; (512, 60) crosses the row-granular ELLX
    threshold (n_res >= ~0.07*R).  Column span stays inside
    routed_vmem_ok's x+y budget."""
    from hispmv_tpu.api import SpmvHandle
    from hispmv_tpu.formats.matrix import COOMatrix

    rng = np.random.default_rng(54)
    rows = rng.integers(0, R, n).astype(np.int64)
    cols = (np.arange(n, dtype=np.int64) * 16384
            + rng.integers(0, 1024, n))
    C = int(cols.max()) + 1
    coo = COOMatrix((R, C), rows, cols,
                    rng.standard_normal(n).astype(np.float32))
    h = SpmvHandle(coo, format="routed")
    # serving-path contract: everything demoted to a residual executor
    assert h._routed_residual is not None or h._routed_residual_coo
    assert h._routed_plan_meta.num_tiles == 0
    x = np.random.default_rng(55).standard_normal(C).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), golden(coo, x), rtol=1e-3, atol=1e-3
    )


# ---------------------------------------------------------------------------
# Rank-space (degree-sorted) routed execution — the scale-free answer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "gen,shape,nnz,seed",
    [
        (powerlaw_coo, (4000, 4000), 60_000, 7),
        (rmat_coo, (4096, 4096), 50_000, 8),
        (random_coo, (900, 700), 8_000, 9),
    ],
)
def test_ranked_plan_numpy_golden(gen, shape, nnz, seed):
    from hispmv_tpu.plan.routed import build_ranked_routed_plan

    coo = gen(*shape, nnz, seed=seed)
    plan = build_ranked_routed_plan(coo)
    assert plan.col_perms is not None and plan.row_perms is not None
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(coo.num_cols).astype(np.float32)
    y = routed_matvec_numpy(plan, x)
    g = golden(coo, x)
    assert np.allclose(y, g, rtol=1e-3, atol=1e-4)


def test_ranked_concentrates_powerlaw():
    """Rank space must not be worse than original space on a power-law
    matrix (the whole point), and residual must stay negligible."""
    from hispmv_tpu.plan.routed import (
        build_ranked_routed_plan,
        build_routed_plan,
        plan_cost_ns,
    )

    coo = rmat_coo(8192, 8192, 200_000, seed=11)
    p0 = build_routed_plan(coo)
    p1 = build_ranked_routed_plan(coo)
    assert plan_cost_ns(p1) <= plan_cost_ns(p0) * 1.1
    assert len(p1.residual_vals) <= max(10, coo.nnz // 100)


@pytest.mark.parametrize(
    "R,C,nnz",
    [
        (1400, 1700, 16_000),
        pytest.param(5000, 6000, 90_000, marks=pytest.mark.slow),
    ],
)
def test_ranked_handle_interpret(R, C, nnz):
    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.config import SpmvConfig

    coo = powerlaw_coo(R, C, nnz, seed=13)
    h = SpmvHandle(
        coo, config=SpmvConfig(rank_sort=True), format="routed",
        interpret=True,
    )
    rng = np.random.default_rng(13)
    x = rng.standard_normal(coo.num_cols).astype(np.float32)
    g = golden(coo, x)
    y = np.asarray(h.run(x))
    assert (np.abs(y - g) <= 1e-4 + 1e-3 * np.abs(g)).all()
    # axpby epilogue contract
    y_in = np.ones(coo.num_rows, np.float32)
    y2 = np.asarray(h.run(x, y_in=y_in, alpha=2.0, beta=0.5))
    assert np.allclose(y2, 2 * g + 0.5, rtol=1e-3, atol=1e-3)


def test_ranked_plan_serialize_roundtrip(tmp_path):
    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.plan.routed import build_ranked_routed_plan
    from hispmv_tpu.plan.serialize import load_plan, save_plan

    coo = powerlaw_coo(3000, 3000, 40_000, seed=17)
    plan = build_ranked_routed_plan(coo)
    path = str(tmp_path / "rank.npz")
    save_plan(path, plan)
    p2 = load_plan(path)
    assert all(
        np.array_equal(a, b)
        for a, b in zip(p2.col_perms, plan.col_perms)
    )
    h = SpmvHandle.from_plan(p2, interpret=True)
    rng = np.random.default_rng(17)
    x = rng.standard_normal(coo.num_cols).astype(np.float32)
    g = golden(coo, x)
    y = np.asarray(h.run(x))
    assert (np.abs(y - g) <= 1e-4 + 1e-3 * np.abs(g)).all()


def test_dse_offers_routed_rank():
    from hispmv_tpu.tune.dse import DSE

    coo = rmat_coo(16384, 16384, 600_000, seed=19)
    res = DSE().explore(coo)
    labels = [l for l, _ in res.candidates]
    assert "routed-rank" in labels


def test_residual_repack_reduces_scatter():
    """Evicted entries are re-planned into fresh tiles (fresh layer
    budgets): with a tight l1 cap most of the eviction residual must pack
    back into streams, the modeled cost must drop, and the golden
    executor must stay exact."""
    from hispmv_tpu.plan import routed as RT

    coo = powerlaw_coo(4000, 4000, 120_000, seed=5, alpha=1.3)
    pre = RT._build_routed_plan(coo, 4, 1, RT.L_CAP, 3)
    post = RT._repack_residual(pre, 4, 1, RT.L_CAP)
    assert len(pre.residual_vals) > 10_000  # the cap really evicted
    assert len(post.residual_vals) < 0.3 * len(pre.residual_vals)
    assert RT.plan_cost_ns(post) < 0.5 * RT.plan_cost_ns(pre)
    x = np.linspace(-1, 1, 4000).astype(np.float32)
    got = routed_matvec_numpy(post, x)[:4000]
    g = golden(coo, x)
    assert (np.abs(got - g) <= 1e-4 + 1e-3 * np.abs(g)).all()


def test_segment_terms_single_launch_for_small_streams():
    """Small streams take ONE rounded-up pow-2 segment (launch cost
    dominates); large streams keep the low-padding binary split."""
    from hispmv_tpu.ops.spmv_routed import _segment_terms

    # nch=3, cheap chunks: single [4] costs one launch + one padded
    # chunk; the [2,1] split costs two launches
    assert _segment_terms(3, 1000.0) == [4]
    # nch=6 with expensive chunks: split [4,2] (2 launches) beats [8]
    # (1 launch + 2 padded chunks at 3 us each)
    assert _segment_terms(6, 3000.0) == [4, 2]
    # pow-2 counts stay single-segment either way
    assert _segment_terms(8, 3000.0) == [8]


# ---------------------------------------------------------------------------
# Banded routed plans (x + y exceed VMEM — the soc-Pokec-scale path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rank_sort", [False, True])
def test_banded_routed_numpy_golden(rank_sort):
    """A matrix too large for routed_vmem_ok builds a cell grid whose
    golden executor (and perm sandwich) is exact."""
    from hispmv_tpu.plan.routed import (
        BandedRoutedPlan,
        banded_routed_matvec_numpy,
        build_banded_routed_plan,
        routed_vmem_ok,
    )

    R = C = 1_300_000
    coo = powerlaw_coo(R, C, 120_000, seed=21)
    assert not routed_vmem_ok(coo.shape)
    plan = build_banded_routed_plan(coo, rank_sort=rank_sort)
    assert isinstance(plan, BandedRoutedPlan)
    assert plan.num_bands == 3 and plan.num_panels == 2
    assert (plan.col_perms is not None) == rank_sort
    x = np.random.default_rng(22).standard_normal(C).astype(np.float32)
    got = banded_routed_matvec_numpy(plan, x)
    np.testing.assert_allclose(got, golden(coo, x), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "base_nnz",
    [12_000, pytest.param(60_000, marks=pytest.mark.slow)],
)
def test_banded_routed_handle_and_roundtrip(tmp_path, base_nnz):
    """The handle auto-bands oversized routed matrices; interpret-mode
    execution and the serialize/from_plan roundtrip stay exact."""
    import dataclasses as _dc

    from hispmv_tpu.api import SpmvHandle
    from hispmv_tpu.config import SpmvConfig
    from hispmv_tpu.plan.routed import BandedRoutedPlan
    from hispmv_tpu.plan.serialize import load_plan, save_plan

    R = C = 1_100_000
    coo = rmat_coo(2048, 2048, base_nnz, seed=23)
    # stretch the rmat into an oversized index space (keeps planning fast
    # while forcing the banded path): scatter blocks along the diagonal
    rows = coo.rows.astype(np.int64) + (coo.cols.astype(np.int64) % 7) \
        * 150_000
    cols = coo.cols.astype(np.int64) + (coo.rows.astype(np.int64) % 5) \
        * 200_000
    from hispmv_tpu.formats.matrix import COOMatrix

    big = COOMatrix((R, C), rows, cols, coo.values)
    h = SpmvHandle(
        big, config=SpmvConfig(rank_sort=True), format="routed",
        interpret=True,
    )
    assert isinstance(h._routed_plan_meta, BandedRoutedPlan)
    x = np.random.default_rng(24).standard_normal(C).astype(np.float32)
    want = golden(big, x)
    np.testing.assert_allclose(
        np.asarray(h.run(x)), want, rtol=1e-3, atol=1e-4
    )
    p = str(tmp_path / "banded.npz")
    save_plan(p, h._routed_plan_meta, compress=False)
    h2 = SpmvHandle.from_plan(load_plan(p), interpret=True)
    np.testing.assert_allclose(
        np.asarray(h2.run(x)), want, rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize(
    "N,nnz",
    [
        (700, 6_000),
        pytest.param(2000, 20_000, marks=pytest.mark.slow),
    ],
)
def test_routed_batched_linear_panels(N, nnz):
    """Batched routed linear: the panel-batched kernel (stream DMA'd once
    per panel, runLinear contract fpga_handle.cpp:323-388) must match
    scipy for B above and below the panel size, with bias."""
    from hispmv_tpu.api import SpmvHandle

    coo = banded_coo(N, N, nnz, seed=60)
    h = SpmvHandle(coo, format="routed", interpret=True)
    rng = np.random.default_rng(61)
    for B in (2, 9):  # below / above one panel
        xb = rng.standard_normal((B, N)).astype(np.float32)
        bias = rng.standard_normal(N).astype(np.float32)
        got = np.asarray(h.linear(xb, bias=bias))
        want = (coo.to_scipy() @ xb.astype(np.float64).T).T + bias
        np.testing.assert_allclose(
            got, want.astype(np.float32), rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize(
    "R,C,nnz",
    [
        (500, 600, 3_000),
        pytest.param(1200, 1500, 10_000, marks=pytest.mark.slow),
    ],
)
def test_routed_batched_linear_with_residual(R, C, nnz):
    """The batched path must include both residual executors."""
    from hispmv_tpu.api import SpmvHandle

    coo = random_coo(R, C, nnz, seed=62)
    h = SpmvHandle(coo, format="routed", interpret=True)
    rng = np.random.default_rng(63)
    xb = rng.standard_normal((3, C)).astype(np.float32)
    got = np.asarray(h.linear(xb))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T
    np.testing.assert_allclose(
        got, want.astype(np.float32), rtol=1e-3, atol=1e-3
    )


def test_repack_adopts_gathered_atomically():
    """A repack whose rplan is gathered-only (no streams) must adopt the
    side-plan TOGETHER with rplan's residual — grafting it while keeping
    the old residual executed the diverted nnz twice (round-4 advisor
    finding, plan/routed.py::_repack_residual_once)."""
    from hispmv_tpu.formats.matrix import COOMatrix
    from hispmv_tpu.plan.routed import (
        L1_CAP,
        L_CAP,
        WINDOW,
        RoutedPlan,
        _repack_residual_once,
    )

    rng = np.random.default_rng(7)
    R = C = 1 << 20  # 1024 x windows: the gathered class's home turf
    n = 100_000
    rows = rng.integers(0, R, n)
    cols = rng.integers(0, C, n)
    k = np.unique(rows.astype(np.int64) * C + cols)
    rows, cols = (k // C).astype(np.int64), (k % C).astype(np.int64)
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    nwin, nyt = -(-C // WINDOW), -(-R // WINDOW)
    plan = RoutedPlan(
        shape=(R, C), nnz=len(rows), num_windows=nwin, num_ytiles=nyt,
        s0=None, s1=None, s2=None,
        residual_rows=rows, residual_cols=cols, residual_vals=vals,
    )
    p2 = _repack_residual_once(plan, 32, L1_CAP, L_CAP)
    if p2.gathered is not None:
        # diverted nnz must have left the residual
        assert len(p2.residual_vals) < 0.05 * n
        assert 0.0 < p2.fill <= 1.0  # gathered tiles count in the fill
    x = rng.standard_normal(C).astype(np.float32)
    y = routed_matvec_numpy(p2, x)
    gold = np.zeros(R)
    np.add.at(gold, rows, vals.astype(np.float64) * x[cols])
    assert np.abs(y - gold).max() / np.abs(gold).max() < 1e-4


def test_flat_prefix_bf16x3_matches_f64():
    """The bf16 3-term split prefix (the path that runs ON HARDWARE,
    hp=False) must reproduce the f64 prefix to f32-class accuracy on
    scattered-magnitude products; a 2-term split leaves ~2e-5 of the
    scale (the documented 7.7e-3 max-rel failure mode after
    cancellation) and fails this bound by 10x."""
    import jax
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_routed import _flat_prefix

    rng = np.random.default_rng(0)
    mags = 10.0 ** rng.uniform(-3, 3, (8, 128))
    p = (rng.standard_normal((8, 128)) * mags).astype(np.float32)
    upper = jnp.triu(jnp.ones((128, 128), jnp.float32))
    bd = jnp.tril(jnp.ones((8, 8), jnp.float32), -1)
    pf3 = np.asarray(_flat_prefix(jnp.asarray(p), upper, bd, hp=False))
    pf64 = np.cumsum(p.astype(np.float64).reshape(-1)).reshape(8, 128)
    assert np.abs(pf3 - pf64).max() / np.abs(p).max() < 2e-6

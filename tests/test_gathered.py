"""Gathered-stream plan + executor tests (plan/gathered.py,
ops/spmv_gathered.py).

The gathered class is the TPU answer to the reference's worst-case
scattered inputs (out-of-order row scheduler + HI crossbar,
base_functions.cpp:356-436): row-major tiles fed by a global 3-stage
Benes gather, run sums extracted by dual Clos permutes of the flat
prefix (no boundary layers)."""

import numpy as np
import pytest

from hispmv_tpu.formats.matrix import COOMatrix
from hispmv_tpu.plan.gathered import (
    build_gathered_plan,
    gather_x_numpy,
    gathered_matvec_numpy,
)


def _rand_coo(R, C, n, seed):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, R, n)
    cols = rng.integers(0, C, n)
    k = np.unique(rows.astype(np.int64) * C + cols)
    rows, cols = k // C, k % C
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    return rows, cols, vals


def _gold(R, rows, cols, vals, x, sr, sc, sv):
    gold = np.zeros(R)
    np.add.at(gold, rows, vals.astype(np.float64) * x[cols])
    if len(sr):
        np.add.at(gold, sr, -(sv.astype(np.float64) * x[sc]))
    return gold


@pytest.mark.parametrize(
    "R,C,n,K,seed",
    [
        (8192, 8192, 20000, 8, 0),
        (4096, 16384, 60000, 16, 1),
        (2048, 2048, 3000, 2, 2),
    ],
)
def test_gathered_golden(R, C, n, K, seed):
    rows, cols, vals = _rand_coo(R, C, n, seed)
    plan, sr, sc, sv = build_gathered_plan(rows, cols, vals, (R, C), K)
    assert plan is not None
    assert sum(plan.panel_tiles) == plan.num_tiles
    rng = np.random.default_rng(seed + 100)
    x = rng.standard_normal(C).astype(np.float32)
    y = gathered_matvec_numpy(plan, x)
    gold = _gold(R, rows, cols, vals, x, sr, sc, sv)
    err = np.abs(y - gold).max() / max(np.abs(gold).max(), 1e-9)
    assert err < 1e-5


def test_gathered_zipf_hub_columns():
    """Hub columns force panel cuts + fan-out neutralization; the spilled
    nnz plus the plan must still reproduce the golden product."""
    rng = np.random.default_rng(9)
    R = C = 16384
    rows = rng.integers(0, R, 100000)
    cols = (rng.zipf(1.3, 100000) - 1) % C
    k = np.unique(rows.astype(np.int64) * C + cols)
    rows, cols = k // C, k % C
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    plan, sr, sc, sv = build_gathered_plan(rows, cols, vals, (R, C), 16)
    assert plan is not None
    x = rng.standard_normal(C).astype(np.float32)
    y = gathered_matvec_numpy(plan, x)
    gold = _gold(R, rows, cols, vals, x, sr, sc, sv)
    err = np.abs(y - gold).max() / np.abs(gold).max()
    assert err < 1e-5


def test_gathered_spill_rules():
    """Rows over ROW_CAP and rows at y offset 0 spill entirely."""
    R = C = 4096
    rng = np.random.default_rng(4)
    # one long row + rows at multiples of 1024
    rows = np.concatenate([
        np.full(600, 7),  # long row (> ROW_CAP)
        np.array([0, 1024, 2048]),  # y-offset-0 rows
        rng.integers(0, R, 2000),
    ])
    cols = rng.integers(0, C, len(rows))
    k = np.unique(rows.astype(np.int64) * C + cols)
    rows, cols = k // C, k % C
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    plan, sr, sc, sv = build_gathered_plan(rows, cols, vals, (R, C), 4)
    assert 7 in sr  # the long row spilled
    assert 0 in sr and 1024 in sr
    assert plan is None or 7 not in np.unique(
        np.repeat(np.arange(plan.num_tiles), 0)
    )  # vacuous guard; the golden check is the contract:
    x = rng.standard_normal(C).astype(np.float32)
    y = (
        gathered_matvec_numpy(plan, x)
        if plan is not None else np.zeros(R)
    )
    gold = _gold(R, rows, cols, vals, x, sr, sc, sv)
    assert np.abs(y - gold).max() / np.abs(gold).max() < 1e-5


def test_gather_x_exact():
    """The 3-stage gather delivers exactly x[col] at every real slot."""
    R = C = 8192
    rows, cols, vals = _rand_coo(R, C, 15000, 5)
    plan, sr, sc, sv = build_gathered_plan(rows, cols, vals, (R, C), 8)
    x = np.arange(C, dtype=np.float32)
    xg = gather_x_numpy(plan, x)
    # every surviving slot carries its col index: the kept multiset is
    # all (row, col) pairs minus the spilled pairs (spills are nnz-level)
    import collections

    kept = collections.Counter(
        zip(rows[vals != 0].tolist(), cols[vals != 0].tolist())
    )
    kept.subtract(zip(sr.tolist(), sc.tolist()))
    want = np.sort([c for (_, c), cnt in kept.items() for _i in
                    range(cnt)])
    got = np.sort(xg[plan.vals.reshape(-1) != 0]).astype(np.int64)
    assert np.array_equal(got, want)


def test_device_interpret_matches_golden():
    import jax.numpy as jnp

    from hispmv_tpu.ops.spmv_gathered import (
        gathered_gather_apply,
        pack_gathered,
        spmv_gathered_tiles_pallas,
    )

    R = C = 8192
    rows, cols, vals = _rand_coo(R, C, 20000, 0)
    plan, sr, sc, sv = build_gathered_plan(rows, cols, vals, (R, C), 8)
    arrays, meta = pack_gathered(plan, tchunk=4)
    d = {k: jnp.asarray(v) for k, v in arrays.items()}
    rng = np.random.default_rng(1)
    x = rng.standard_normal(C).astype(np.float32)
    xp = np.zeros(8 * 1024, np.float32)
    xp[:C] = x
    xg = gathered_gather_apply(
        d, meta, "", jnp.asarray(xp.reshape(-1, 128)), interpret=True
    )
    y2d = spmv_gathered_tiles_pallas(
        d["vals"], d["word"], d["byt"], xg, plan.num_ytiles,
        meta["nch"], meta["tchunk"], interpret=True,
    )
    y = np.asarray(y2d).reshape(-1)[:R]
    gold = gathered_matvec_numpy(plan, x)
    assert np.abs(y - gold).max() < 1e-4


def test_routed_plan_diversion_and_serialize(tmp_path, monkeypatch):
    """With cheap gathered constants, the routed planner diverts its
    expensive tiles; the combined plan reproduces the golden matvec and
    survives serialization."""
    import hispmv_tpu.plan.gathered as G
    from hispmv_tpu.plan.routed import (
        build_routed_plan,
        routed_matvec_numpy,
    )
    from hispmv_tpu.plan.serialize import load_plan, save_plan

    monkeypatch.setattr(G, "GATH_TILE_NS", 1.0)
    monkeypatch.setattr(G, "GATH_STAGE_NS", 1.0)
    rng = np.random.default_rng(3)
    R = C = 65536
    rows, cols, vals = _rand_coo(R, C, 600000, 3)
    coo = COOMatrix((R, C), rows, cols, vals)
    plan = build_routed_plan(coo)
    assert plan.gathered is not None
    x = rng.standard_normal(C).astype(np.float32)
    y = routed_matvec_numpy(plan, x)
    gold = coo.matvec(x.astype(np.float64))
    assert np.abs(y - gold).max() / np.abs(gold).max() < 1e-4
    pth = str(tmp_path / "plan.npz")
    save_plan(pth, plan, compress=False)
    plan2 = load_plan(pth)
    assert plan2.gathered is not None
    assert np.array_equal(routed_matvec_numpy(plan2, x), y)


@pytest.mark.slow
def test_handle_end_to_end_gathered(monkeypatch):
    import hispmv_tpu.plan.gathered as G
    from hispmv_tpu.api.handle import SpmvHandle

    monkeypatch.setattr(G, "GATH_TILE_NS", 1.0)
    monkeypatch.setattr(G, "GATH_STAGE_NS", 1.0)
    rng = np.random.default_rng(3)
    R = C = 65536
    rows, cols, vals = _rand_coo(R, C, 600000, 3)
    coo = COOMatrix((R, C), rows, cols, vals)
    h = SpmvHandle(coo, format="routed", interpret=True)
    assert h._routed_plan_meta.gathered is not None
    x = rng.standard_normal(C).astype(np.float32)
    y = np.asarray(h.run(x))[:R]
    gold = coo.matvec(x.astype(np.float64))
    assert np.abs(y - gold).max() < 2e-4


def test_wide_matrix_guard_spills_everything():
    """num_windows > 1024 (cols > 2^20): the grouped-S2 stage cannot form
    (WINDOW // K == 0); the builder must spill all entries back to the
    caller instead of dividing by zero (round-4 advisor finding)."""
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 4096, 5000).astype(np.int64)
    cols = rng.integers(0, 4096, 5000).astype(np.int64)
    vals = rng.standard_normal(5000).astype(np.float32)
    plan, sr, sc, sv = build_gathered_plan(
        rows, cols, vals, (4096, 2 ** 21), 2048
    )
    assert plan is None
    assert len(sr) == 5000
    np.testing.assert_array_equal(np.sort(sr), np.sort(rows))

"""Planner property tests.

The reference guarantees its accumulator correctness *by construction* in the
host scheduler (SURVEY.md section 5, spmv-helper.cpp:429-515); our analog is
a set of invariants the plan must satisfy so the kernel's static accumulation
is conflict-free and lossless.  These are the property tests asserting those
guarantees."""

import numpy as np
import pytest

from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.synth import powerlaw_coo, random_coo
from hispmv_tpu.plan import build_plan


def reconstruct_dense(plan):
    """Invert the plan back into a dense matrix (lossless check)."""
    R, C = plan.shape
    dense = np.zeros((R + 1, C), np.float64)
    rounds = plan.round_ids()  # [T]
    E, P = plan.num_rounds, plan.config.num_pes
    seg_rows = plan.seg_rows.reshape(E, P)
    for t in range(plan.num_steps):
        e = rounds[t]
        rows = seg_rows[e]  # [P]
        np.add.at(dense, (rows, plan.cols[t]), plan.vals[t])
    return dense[:R]


@pytest.mark.parametrize("cfg", [SpmvConfig(), SpmvConfig(split_threshold=7)])
def test_plan_lossless(small_matrix, cfg):
    plan = build_plan(small_matrix, cfg)
    np.testing.assert_allclose(
        reconstruct_dense(plan), small_matrix.to_dense(), rtol=1e-6, atol=1e-6
    )


def test_round_structure(small_matrix):
    plan = build_plan(small_matrix)
    assert plan.round_starts[0] == 0
    assert plan.round_starts[-1] == plan.num_steps
    assert np.all(np.diff(plan.round_starts) > 0)
    assert plan.seg_rows.shape == (plan.num_rounds * plan.config.num_pes,)


def test_padding_is_inert(small_matrix):
    """Padding slots must be exact zeros with column 0 (in-range)."""
    plan = build_plan(small_matrix)
    pad = plan.vals == 0
    assert np.all(plan.cols[pad] == 0)
    assert plan.cols.min() >= 0
    assert plan.cols.max() < plan.shape[1]


def test_split_threshold_respected():
    coo = powerlaw_coo(200, 200, 5000, seed=0)
    plan = build_plan(coo, SpmvConfig(split_threshold=16))
    # No (round, pe) cell may receive more than threshold nonzeros.
    rounds = plan.round_ids()
    E, P = plan.num_rounds, plan.config.num_pes
    counts = np.zeros((E, P), np.int64)
    nz = plan.vals != 0
    for t in range(plan.num_steps):
        counts[rounds[t]] += nz[t]
    assert counts.max() <= 16


def test_balance_quality_powerlaw():
    """Sorted-round packing must keep padding low on imbalanced matrices."""
    coo = powerlaw_coo(3000, 3000, 200_000, seed=2)
    plan = build_plan(coo)
    assert plan.padding_ratio < 0.35
    # steps must be close to the perfect-balance lower bound nnz/P
    lower = coo.nnz / plan.config.num_pes
    assert plan.num_steps <= 3 * max(lower, 1)


def test_empty_matrix():
    from hispmv_tpu.formats.matrix import COOMatrix

    empty = COOMatrix((10, 10), np.zeros(0), np.zeros(0), np.zeros(0))
    plan = build_plan(empty)
    assert plan.num_steps == 0
    assert plan.num_rounds == 0


def test_duplicate_coordinates_accumulate():
    from hispmv_tpu.formats.matrix import COOMatrix

    coo = COOMatrix(
        (4, 4),
        np.array([1, 1, 1]),
        np.array([2, 2, 3]),
        np.array([1.5, 2.5, 1.0], np.float32),
    )
    plan = build_plan(coo)
    dense = reconstruct_dense(plan)
    assert dense[1, 2] == 4.0
    assert dense[1, 3] == 1.0


def test_large_random_plan_fast():
    coo = random_coo(20000, 20000, 500_000, seed=3)
    plan = build_plan(coo)
    assert plan.padding_ratio < 0.6
    assert plan.nnz == coo.nnz


def test_rmat_and_arrowhead_generators():
    from hispmv_tpu.formats.synth import arrowhead_coo, rmat_coo

    g = rmat_coo(4096, 4096, 60_000, seed=1)
    assert g.shape == (4096, 4096)
    assert 50_000 <= g.nnz <= 60_000
    # R-MAT must concentrate nnz toward low indices (community corner)
    top = ((g.rows < 1024) & (g.cols < 1024)).mean()
    assert top > 0.25  # uniform would give 1/16

    a = arrowhead_coo(8000, 8000, 80_000, seed=2)
    assert a.shape == (8000, 8000)
    import numpy as np

    cd = np.bincount(a.cols, minlength=8000)
    rd = np.bincount(a.rows, minlength=8000)
    # dense hub rows/cols exist
    assert cd.max() > 50 * cd.mean()
    assert rd.max() > 50 * rd.mean()
    # band: most nnz near the diagonal
    near = (np.abs(a.rows - a.cols) < 0.05 * 8000).mean()
    assert near > 0.4


def test_suite_matrix_cache_roundtrip(tmp_path):
    from hispmv_tpu.formats.synth import suite_matrix

    a = suite_matrix("poli_large", cache_dir=str(tmp_path))
    b = suite_matrix("poli_large", cache_dir=str(tmp_path))  # cache hit
    import numpy as np

    assert a.nnz == b.nnz
    np.testing.assert_array_equal(a.rows, b.rows)
    np.testing.assert_array_equal(a.values, b.values)


def test_fidelity_mirror_smoke():
    """The reference-cycle-model mirror (benchmarks/fidelity.py) must
    reproduce basic invariants on a tiny matrix: PA configs cost the
    balanced max load (no II expansion), non-PA configs expand by
    II_DIST, and HI balancing never exceeds the unbalanced max."""
    import sys

    sys.path.insert(0, "benchmarks")
    import numpy as np

    from fidelity import REF, predict_cycles
    from hispmv_tpu.formats.matrix import COOMatrix

    rng = np.random.default_rng(0)
    rows = rng.integers(0, 4000, 30_000).astype(np.int64)
    cols = rng.integers(0, 4000, 30_000).astype(np.int64)
    coo = COOMatrix((4000, 4000), rows, cols,
                    np.ones(30_000, np.float32))
    pa = predict_cycles("analytics", coo)  # PA-HI-SpMV-16-2-4
    hi = predict_cycles("crankseg_2", coo)  # HI-SpMV-24-1-1 (II x6)
    # uniform random 4k^2: near-balanced; PA cycles ~ nnz/num_pes + tiling
    assert pa < 3 * (30_000 / 128 + 4000 / 64 + 32)
    # the non-PA schedule can pad up to ~II_DIST/loads-per-slot, never less
    # than the balanced load
    assert hi >= 30_000 / 192

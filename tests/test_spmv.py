"""Golden-model differential tests: plan + XLA kernel vs scipy/numpy.

Acceptance criterion matches the reference: np.allclose with rtol=1e-3
(apps/general_test.py:104-116)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.synth import powerlaw_coo, random_coo
from hispmv_tpu.ops import gemv_xla, spmv_xla
from hispmv_tpu.plan import build_plan


def run_plan(plan, x, y_in=None, alpha=1.0, beta=0.0):
    return np.asarray(
        spmv_xla(
            jnp.asarray(plan.vals),
            jnp.asarray(plan.cols),
            jnp.asarray(plan.round_ids()),
            jnp.asarray(plan.seg_rows),
            plan.num_rounds,
            plan.shape[0],
            jnp.asarray(x),
            None if y_in is None else jnp.asarray(y_in),
            alpha,
            beta,
        )
    )


def golden(coo, x, y_in=None, alpha=1.0, beta=0.0):
    y = alpha * (coo.to_scipy() @ x.astype(np.float64))
    if y_in is not None:
        y = y + beta * y_in
    return y.astype(np.float32)


def deterministic_x(n):
    # v[i] = (i+2)/(i+1), the reference's deterministic test vector
    # (common/src/spmv-host.cpp:17-23).
    i = np.arange(n, dtype=np.float32)
    return (i + 2.0) / (i + 1.0)


def test_spmv_matches_scipy(small_matrix):
    plan = build_plan(small_matrix)
    x = deterministic_x(small_matrix.num_cols)
    got = run_plan(plan, x)
    want = golden(small_matrix, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_spmv_axpby(small_matrix):
    plan = build_plan(small_matrix)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(small_matrix.num_cols).astype(np.float32)
    y_in = rng.standard_normal(small_matrix.num_rows).astype(np.float32)
    got = run_plan(plan, x, y_in, alpha=1.7, beta=-0.3)
    want = golden(small_matrix, x, y_in, alpha=1.7, beta=-0.3)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("threshold", [4, 64, None])
def test_split_thresholds_agree(threshold):
    coo = powerlaw_coo(500, 500, 20_000, seed=5)
    x = deterministic_x(500)
    plan = build_plan(coo, SpmvConfig(split_threshold=threshold))
    np.testing.assert_allclose(
        run_plan(plan, x), golden(coo, x), rtol=1e-3, atol=1e-5
    )


def test_medium_random():
    coo = random_coo(8000, 6000, 300_000, seed=8)
    x = np.random.default_rng(1).standard_normal(6000).astype(np.float32)
    plan = build_plan(coo)
    np.testing.assert_allclose(
        run_plan(plan, x), golden(coo, x), rtol=1e-3, atol=1e-4
    )


def test_gemv_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((256, 512)).astype(np.float32)
    x = rng.standard_normal(512).astype(np.float32)
    y_in = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(gemv_xla(jnp.asarray(a), jnp.asarray(x), jnp.asarray(y_in), 2.0, 0.5))
    want = 2.0 * (a @ x) + 0.5 * y_in
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gemv_batched():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((128, 64)).astype(np.float32)
    x = rng.standard_normal((16, 64)).astype(np.float32)
    got = np.asarray(gemv_xla(jnp.asarray(a), jnp.asarray(x)))
    np.testing.assert_allclose(got, x @ a.T, rtol=1e-3, atol=1e-4)

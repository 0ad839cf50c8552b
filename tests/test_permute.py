"""Fast-permutation plans (plan/permute.py) + kernel (ops/permute.py).

The 3-stage decomposition must reproduce ``x[perm]`` exactly for any
permutation; each stage is a 3-gather Clos routing in one i32 word."""

import numpy as np
import pytest

from hispmv_tpu.plan.permute import (
    WINDOW,
    _color_py,
    build_permute_plan,
    permute_numpy,
)


def _check_coloring(colors, sw, dw, W):
    for w in range(W):
        assert len(set(colors[sw == w])) == int((sw == w).sum())
        assert len(set(colors[dw == w])) == int((dw == w).sum())


@pytest.mark.parametrize("n", [1, 700, 1024, 4096, 9000])
def test_permute_numpy_golden(n):
    rng = np.random.default_rng(n)
    perm = rng.permutation(n)
    plan = build_permute_plan(perm)
    for s in (plan.s1, plan.s2, plan.s3):
        # route words use exactly 13 bits: subA | laneB<<3 | subC<<10
        assert s.route.dtype == np.int32
        assert (s.route.view(np.uint32) < (1 << 13)).all()
    x = rng.standard_normal(n).astype(np.float32)
    assert np.array_equal(permute_numpy(plan, x), x[perm])


def test_permute_identity():
    n = 3000
    plan = build_permute_plan(np.arange(n))
    x = np.arange(n, dtype=np.float32)
    assert np.array_equal(permute_numpy(plan, x), x)


def test_permute_too_large_raises():
    with pytest.raises(ValueError):
        build_permute_plan(np.arange(WINDOW * WINDOW + 1))


def test_python_coloring_valid():
    rng = np.random.default_rng(7)
    n = 4 * WINDOW
    perm = rng.permutation(n)
    sw = (perm // WINDOW).astype(np.int64)
    dw = (np.arange(n) // WINDOW).astype(np.int64)
    colors = _color_py(sw, dw, WINDOW)
    _check_coloring(colors, sw, dw, 4)


def test_native_coloring_matches_contract():
    from hispmv_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n = 8 * WINDOW
    perm = rng.permutation(n)
    sw = (perm // WINDOW).astype(np.int32)
    dw = (np.arange(n) // WINDOW).astype(np.int32)
    colors = native.euler_color(sw, dw, WINDOW)
    assert colors is not None
    _check_coloring(colors, sw, dw, 8)


@pytest.mark.parametrize("n", [700, 4096, 50000])
def test_permute_kernel_interpret(n):
    import jax.numpy as jnp

    from hispmv_tpu.ops.permute import pack_permute_plan, permute_apply

    rng = np.random.default_rng(n)
    perm = rng.permutation(n)
    plan = build_permute_plan(perm)
    dev = pack_permute_plan(plan)
    meta = {
        "n": dev["n"],
        "num_windows": dev["num_windows"],
        "dims": dev["dims"],
    }
    x = rng.standard_normal(n).astype(np.float32)
    y = permute_apply(meta, dev["arrays"], jnp.asarray(x), interpret=True)
    assert np.array_equal(np.asarray(y), x[perm])

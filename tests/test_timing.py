"""Loop-slope timing utilities (CPU): correctness of the machinery.

Absolute times on CPU are meaningless; these tests check the plumbing —
data dependency preserved, y captured equals a direct call, slope positive.
"""

import jax.numpy as jnp
import numpy as np

from hispmv_tpu.utils.timing import (
    bench_spmv,
    measure_loop_time,
    spmv_step_wrapper,
)


def test_measure_loop_time_positive():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)))
    a = a.astype(jnp.float32)

    def kernel(x):
        return a @ x

    x0 = jnp.ones((64,), jnp.float32)
    step, c0 = spmv_step_wrapper(kernel, x0)
    t = measure_loop_time(step, c0, n_pair=(1, 5), repeats=1)
    assert t > 0


def test_bench_spmv_captures_result():
    a = np.random.default_rng(1).standard_normal((32, 48)).astype(np.float32)
    aj = jnp.asarray(a)

    def kernel(x):
        return aj @ x

    x0 = np.random.default_rng(2).standard_normal(48).astype(np.float32)
    t, y = bench_spmv(kernel, jnp.asarray(x0), n_pair=(1, 3), repeats=1)
    assert t > 0
    np.testing.assert_allclose(y, a @ x0, rtol=1e-5, atol=1e-5)


def test_step_wrapper_preserves_x():
    # the dependency perturbation must be negligible
    def kernel(x):
        return x * 2.0

    x0 = jnp.ones((16,), jnp.float32)
    step, c0 = spmv_step_wrapper(kernel, x0)
    c = c0
    for _ in range(5):
        c = step(c)
    np.testing.assert_allclose(np.asarray(c[0]), np.ones(16), rtol=1e-6)

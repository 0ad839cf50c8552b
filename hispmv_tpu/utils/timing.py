"""Device-honest kernel timing.

The reference times kernels with a repeat loop on the device, excluding
transfers (``rp_time`` repeats, common/src/spmv-helper.cpp:1014-1036).  We
need the same discipline for a different reason: through remote-relayed JAX
backends, per-call wall time is dominated by RPC latency and argument
shipping, and ``block_until_ready`` can return before real completion.  The
loop-slope method recovers pure device step time:

    T(n) = overhead + n * t_step      =>      t_step = (T(n2) - T(n1)) / (n2 - n1)

where the n iterations run inside ONE jitted ``lax.fori_loop`` with a real
data dependency chaining them (so XLA cannot hoist or elide work), and
completion is forced by fetching a scalar checksum to the host.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def measure_loop_time(
    step: Callable,
    carry0,
    *,
    n_pair: Tuple[int, int] = (1, 17),
    repeats: int = 3,
) -> float:
    """Measure seconds per device execution of ``step``.

    Args:
      step: ``carry -> carry`` function.  MUST thread a data dependency
        through the carry (every iteration's inputs depend on the previous
        iteration's outputs), or XLA will hoist the body out of the loop and
        the measurement is meaningless.
      carry0: initial carry (pytree of arrays).
      n_pair: the two loop lengths whose timing difference gives the slope.
      repeats: best-of-N wall-clock samples per loop length.

    Returns:
      Estimated seconds per step (slope).
    """
    n_lo, n_hi = n_pair

    @jax.jit
    def run(carry, salt, n):
        # Salt defeats any (function, args) result caching in relayed
        # backends without perturbing the math measurably.  n is traced so
        # both loop lengths share one compiled executable.  The salt goes
        # into the first FLOATING leaf: salting an int32 leaf (e.g. a plan
        # array riding in the carry) silently promotes it to f32 and the
        # kernel then fails Mosaic verification (index_cast of f32).
        leaves, treedef = jax.tree_util.tree_flatten(carry)
        k = next(
            (
                i for i, l in enumerate(leaves)
                if jnp.issubdtype(l.dtype, jnp.floating)
            ),
            0,
        )
        leaves[k] = leaves[k] + jnp.asarray(salt, leaves[k].dtype) * 1e-30
        carry = jax.tree_util.tree_unflatten(treedef, leaves)
        carry = jax.lax.fori_loop(0, n, lambda i, c: step(c), carry)
        leaves_out = jax.tree_util.tree_leaves(carry)
        chk = jnp.sum(leaves_out[k].ravel()[:1].astype(jnp.float32))
        return carry, chk

    # Warm up the (single) compile and the arg transfer.
    _, chk = run(carry0, 0.0, jnp.int32(n_lo))
    float(chk)

    salt = [1.0]

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            salt[0] += 1.0
            t0 = time.perf_counter()
            _, chk = run(carry0, salt[0], jnp.int32(n))
            float(chk)  # host fetch forces true completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(n_lo)
    # Grow the loop length geometrically until the measured span rises well
    # above RPC jitter (~ms), then take the slope.  The loop count is a
    # traced argument, so each size reuses the same executable.
    n, t_n = n_hi, timed(n_hi)
    while (t_n - t_lo) < 0.08 and n < 60_000:
        n = min(n * 8, 60_000)
        t_n = timed(n)
    return max((t_n - t_lo) / (n - n_lo), 1e-12)


def spmv_step_wrapper(kernel: Callable, x0: jax.Array):
    """Build a self-chaining step for an ``x -> y`` SpMV-like kernel.

    The returned ``(step, carry0)`` pair feeds a negligible function of y
    back into x so iterations are data-dependent but numerically stable.
    """

    def step(carry):
        x, acc = carry
        y = kernel(x)
        # full-reduction dep: a single-element dep (y[0]) lets XLA's
        # algebraic simplifier rewrite slice(dot) into a tiny dot and
        # dead-code-eliminate the rest of a pure-XLA kernel (measured: an
        # 8192^2 f32 matmul "ran" in 2.7 us, under its 313 us HBM floor).
        # Pallas custom calls are opaque and were never affected.
        dep = jnp.sum(y).astype(x.dtype) * 1e-30
        return (x + dep, acc + dep)

    return step, (x0, jnp.zeros((), x0.dtype))


def bench_spmv(
    kernel: Callable,
    x0: jax.Array,
    *,
    n_pair: Tuple[int, int] = (1, 17),
    repeats: int = 3,
    exec_cache: str = None,
    kernel_args=None,
):
    """Time an ``x -> y`` kernel AND capture one result with a single
    compiled executable.

    Compiling the measurement loop is expensive on remote backends; this
    threads y through the loop carry so the n=1 warm-up run doubles as the
    verification run.  Returns ``(seconds_per_call, y_numpy)``.

    ``exec_cache``: optional file path for a SERIALIZED COMPILED EXECUTABLE
    (jax.experimental.serialize_executable) — later processes skip the
    backend compile entirely, which on remote-compile backends removes
    minutes of unpredictable latency.

    ``kernel_args``: optional pytree of device arrays passed to the kernel
    as an EXPLICIT jit argument — ``kernel(args, x)`` instead of
    ``kernel(x)``.  Required for large prepared plans: a kernel that merely
    closes over them captures them as lowered-module CONSTANTS, which ships
    gigabytes to remote compile services (observed HTTP 413).
    """
    import numpy as np

    if kernel_args is None:
        kfn = lambda a, x: kernel(x)  # noqa: E731
        kargs = ()
    else:
        kfn = kernel
        kargs = kernel_args

    # eval_shape traces without compiling or executing
    y_shape = jax.eval_shape(lambda a, x: kfn(a, x), kargs, x0)

    def step(args, carry):
        x, acc, _ = carry
        y = kfn(args, x)
        dep = y.ravel()[:1].astype(x.dtype) * 1e-30
        return (x + dep, acc + dep[0], y)

    carry0 = (
        x0,
        jnp.zeros((), x0.dtype),
        jnp.zeros(y_shape.shape, y_shape.dtype),
    )

    def run_fn(args, carry, salt, n):
        x, acc, y = carry
        carry = (x + jnp.asarray(salt, x.dtype) * 1e-30, acc, y)
        carry = jax.lax.fori_loop(
            0, n, lambda i, c: step(args, c), carry
        )
        chk = jnp.sum(carry[0].ravel()[:1].astype(jnp.float32))
        return carry, chk

    run = _load_or_compile(run_fn, exec_cache, kargs, carry0)

    n_lo, n_hi = n_pair
    try:
        carry, chk = run(kargs, carry0, 0.0, jnp.int32(n_lo))
    except Exception:
        # stale serialized executable (argument pytree changed between
        # versions — TypeError — or a runtime/backend restart left the
        # deserialized executable unusable): recompile fresh once and
        # overwrite the cache.  A fresh-compile failure re-raises.
        import os as _os

        if exec_cache and _os.path.exists(exec_cache):
            _os.remove(exec_cache)
        run = _load_or_compile(run_fn, exec_cache, kargs, carry0)
        carry, chk = run(kargs, carry0, 0.0, jnp.int32(n_lo))
    float(chk)
    y_out = np.asarray(carry[2])

    salt = [1.0]

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(repeats):
            salt[0] += 1.0
            t0 = time.perf_counter()
            _, c = run(kargs, carry0, salt[0], jnp.int32(n))
            float(c)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(n_lo)
    n, t_n = n_hi, timed(n_hi)
    while (t_n - t_lo) < 0.08 and n < 60_000:
        n = min(n * 8, 60_000)
        t_n = timed(n)
    return max((t_n - t_lo) / (n - n_lo), 1e-12), y_out


def _load_or_compile(run_fn, exec_cache, kargs, carry0):
    """Deserialize a cached compiled executable, or compile (and cache)."""
    import os
    import pickle

    if exec_cache and os.path.exists(exec_cache):
        try:
            from jax.experimental import serialize_executable as se

            with open(exec_cache, "rb") as f:
                blob, in_tree, out_tree = pickle.load(f)
            return se.deserialize_and_load(blob, in_tree, out_tree)
        except Exception:
            pass  # stale/incompatible cache: recompile below
    jitted = jax.jit(run_fn)
    if not exec_cache:
        return jitted
    try:
        compiled = jitted.lower(
            kargs, carry0, jnp.float32(0.0), jnp.int32(1)
        ).compile()
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(compiled)
        tmp = exec_cache + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((blob, in_tree, out_tree), f)
        os.replace(tmp, exec_cache)
        return compiled
    except Exception:
        return jitted

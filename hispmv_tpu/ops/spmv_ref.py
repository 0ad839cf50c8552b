"""Portable XLA SpMV over a :class:`StreamPlan` — the correctness reference.

This is the csim analog of the reference (tapa::invoke software simulation,
common/src/spmv-host.cpp:166-178): the same plan format the Pallas kernel
consumes, executed with plain jnp ops so it runs on CPU/GPU/TPU and inside
tests.  Semantics: ``y = alpha * (A @ x) + beta * y_in``, the kernel contract
of the reference top function (automation_tool/assets/spmv.h:82-91,
Compute_C epilogue base_functions.cpp:521-540).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spmv_xla(
    vals: jax.Array,  # f32 [T, P]
    cols: jax.Array,  # i32 [T, P]
    round_ids: jax.Array,  # i32 [T] (sorted, non-decreasing)
    seg_rows: jax.Array,  # i32 [E * P]
    num_rounds: int,
    num_rows: int,
    x: jax.Array,  # f32 [C]
    y_in: jax.Array | None = None,  # f32 [R]
    alpha: float | jax.Array = 1.0,
    beta: float | jax.Array = 0.0,
) -> jax.Array:
    """Execute the plan: gather x, multiply, per-round segment sums,
    scatter-free... scatter-add finalize to rows, axpby epilogue."""
    gathered = jnp.take(x, cols, axis=0)  # [T, P]
    prod = vals * gathered
    # Per-(round, pe) partial sums.  round_ids is sorted, so this is a
    # contiguous segmented reduction along the step axis.
    acc = jax.ops.segment_sum(
        prod,
        round_ids,
        num_segments=num_rounds,
        indices_are_sorted=True,
    )  # [E, P]
    return finalize_xla(acc, seg_rows, num_rows, x, y_in, alpha, beta)


def finalize_xla(
    acc: jax.Array,  # f32 [E, P] per-(round, pe) partial sums
    seg_rows: jax.Array,  # i32 [E * P], dummy row == num_rows for padding
    num_rows: int,
    x: jax.Array,
    y_in: jax.Array | None,
    alpha,
    beta,
) -> jax.Array:
    """Recombine split-row partials into y and apply the axpby epilogue.

    The reference's crossbar ADD tree merges shared-row partials in hardware
    (base_functions.cpp:356-436); here the planner's ``seg_rows`` map drives
    a single scatter-add (padding lands on dummy row ``num_rows``)."""
    y = jnp.zeros(num_rows + 1, acc.dtype).at[seg_rows].add(acc.ravel())
    y = y[:num_rows]
    y = alpha * y
    if y_in is not None:
        y = y + beta * y_in
    return y

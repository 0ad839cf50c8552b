"""Dense overlay: GeMV / batched GeMM path.

The reference executes dense layers on the same kernel via a runtime
``DENSE_MODE`` flag (base_functions.cpp:174-226).  On TPU the idiomatic dense
path is the MXU: matrices are stored padded to (8,128)-aligned tiles in
device memory and multiplied with ``jnp.dot``; XLA fuses the axpby epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gemv_xla(
    a: jax.Array,  # f32 [R, C] (padded dense weights, device resident)
    x: jax.Array,  # f32 [C] or [B, C]
    y_in: jax.Array | None = None,
    alpha=1.0,
    beta=0.0,
) -> jax.Array:
    """y = alpha * A @ x + beta * y_in (batched when x is 2D: [B, C] -> [B, R]).

    Uses Precision.HIGHEST: the default matmul precision truncates to
    bf16-grade accuracy, violating the reference's rtol=1e-3 fp32 acceptance
    (general_test.py:106).  GeMV is HBM-bandwidth-bound, so the extra MXU
    passes are free."""
    precision = jax.lax.Precision.HIGHEST
    if x.ndim == 1:
        y = jnp.dot(a, x, preferred_element_type=jnp.float32, precision=precision)
    else:
        y = jnp.dot(x, a.T, preferred_element_type=jnp.float32, precision=precision)
    y = alpha * y
    if y_in is not None:
        y = y + beta * y_in
    return y

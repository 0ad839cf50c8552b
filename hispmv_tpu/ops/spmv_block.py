"""Pallas TPU block-ELL SpMV kernel.

The TPU-native replacement for the reference's HLS dataflow kernel
(automation_tool/assets/base_functions.cpp).  One Pallas grid step plays the
role of the whole MM2S_A -> ComputeAB -> AccumBuffer pipe for one dense
(block_h, 128) sub-block of A:

- the A block stream is consumed in order (MM2S_A analog, :3-31) — Pallas's
  grid pipeline double-buffers the HBM->VMEM DMA automatically;
- the x col-block is fetched by a scalar-prefetched dynamic index
  (LoadB/B-window analog, :105-150) — no random gather ever happens, the
  planner turned gathers into dense block addressing;
- the y tile accumulates in VMEM across the consecutive blocks of one
  row-block and is written exactly once (AccumBuffer contract, :439-504);
  conflict-freedom is guaranteed by the planner's sort, not by tracking
  hazards at runtime (the RAW-distance scheduling analog,
  spmv-helper.cpp:429-515).

The alpha/beta epilogue (Compute_C analog, :521-540) runs as ordinary XLA
ops after the kernel so it fuses with neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.blocks import LANES, BlockPlan


def _spmv_block_kernel(
    rows_ref,  # i32 [nblocks] scalar-prefetch: row-block id per step
    cols_ref,  # i32 [nblocks] scalar-prefetch: col-block id per step
    firsts_ref,  # i32 [nblocks] scalar-prefetch: 1 = first block of row-block
    a_ref,  # f32 [1, block_h, LANES] current A block
    x_ref,  # f32 [1, LANES] current x col-block
    o_ref,  # f32 [1, block_h] y tile (VMEM-resident across a row-block)
):
    i = pl.program_id(0)

    @pl.when(firsts_ref[i] == 1)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    # (block_h, LANES) * (LANES,) -> lane-reduce -> (block_h,).
    # VPU multiply + reduce keeps full fp32 accuracy (the MXU would be
    # idle-heavy at width-1 anyway); A-stream HBM traffic dominates.
    prod = a_ref[0] * x_ref[0][None, :]
    o_ref[0, :] += jnp.sum(prod, axis=1)


def spmv_block_pallas(
    data: jax.Array,  # f32 [nblocks, block_h, LANES]
    block_rows: jax.Array,  # i32 [nblocks], sorted
    block_cols: jax.Array,  # i32 [nblocks]
    block_firsts: jax.Array,  # i32 [nblocks]
    x_blocks: jax.Array,  # f32 [num_col_blocks, LANES] (padded x)
    num_row_blocks: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the block stream; returns y tiles f32 [num_row_blocks, block_h]."""
    nblocks, block_h, lanes = data.shape
    assert lanes == LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                (1, block_h, LANES), lambda i, rows, cols, firsts: (i, 0, 0)
            ),
            pl.BlockSpec(
                (1, LANES), lambda i, rows, cols, firsts: (cols[i], 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_h), lambda i, rows, cols, firsts: (rows[i], 0)
        ),
    )

    return pl.pallas_call(
        _spmv_block_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_row_blocks, block_h), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * data.size,
            bytes_accessed=data.size * 4 + x_blocks.size * 4,
            transcendentals=0,
        ),
    )(block_rows, block_cols, block_firsts, data, x_blocks)


def pad_x_blocks(x: jax.Array, num_col_blocks: int) -> jax.Array:
    """Zero-pad x to the block grid and reshape to [num_col_blocks, LANES]."""
    pad = num_col_blocks * LANES - x.shape[0]
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(num_col_blocks, LANES)


@functools.partial(
    jax.jit,
    static_argnames=("num_row_blocks", "num_rows", "interpret", "has_perm"),
)
def _spmv_block_jit(
    data,
    block_rows,
    block_cols,
    block_firsts,
    col_perm,
    x,
    y_in,
    alpha,
    beta,
    *,
    num_row_blocks: int,
    num_rows: int,
    interpret: bool,
    has_perm: bool,
):
    if has_perm:
        x = jnp.take(x, col_perm, axis=0)
    xb = pad_x_blocks(x, -(-x.shape[0] // LANES))
    y = spmv_block_pallas(
        data,
        block_rows,
        block_cols,
        block_firsts,
        xb,
        num_row_blocks,
        interpret=interpret,
    )
    y = alpha * y.reshape(-1)[:num_rows]
    if y_in is not None:
        y = y + beta * y_in
    return y


def spmv_block(
    plan: BlockPlan,
    x,
    y_in=None,
    alpha=1.0,
    beta=0.0,
    *,
    interpret: bool = False,
):
    """Convenience wrapper executing a host-side :class:`BlockPlan`.

    Production code should keep plan arrays device-resident via
    :class:`hispmv_tpu.api.SpmvHandle`; this wrapper re-uploads per call and
    exists for tests and one-shot use.
    """
    ncb = plan.num_col_blocks
    x = jnp.asarray(x)
    # Pad x to the plan's column grid before the jitted call so the reshape
    # inside sees a static multiple of LANES.
    pad = ncb * LANES - x.shape[0]
    if pad > 0:
        x = jnp.pad(x, (0, pad))
    has_perm = plan.col_perm is not None
    perm = jnp.asarray(
        plan.col_perm if has_perm else np.zeros(1, np.int32)
    )
    if has_perm and pad > 0:
        # Permutation is defined on original columns; padded tail maps to
        # itself (zeros), so extend it as identity.
        perm = jnp.concatenate(
            [perm, jnp.arange(plan.shape[1], ncb * LANES, dtype=jnp.int32)]
        )
    return _spmv_block_jit(
        jnp.asarray(plan.data),
        jnp.asarray(plan.block_rows),
        jnp.asarray(plan.block_cols),
        jnp.asarray(plan.block_firsts),
        perm,
        x,
        None if y_in is None else jnp.asarray(y_in),
        jnp.float32(alpha),
        jnp.float32(beta),
        num_row_blocks=plan.num_row_blocks,
        num_rows=plan.shape[0],
        interpret=interpret,
        has_perm=has_perm,
    )

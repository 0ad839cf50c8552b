"""Chunked windowed block-ELL SpMV kernel.

Same chunked architecture as ops/spmv_chunked.py (big contiguous A chunks,
x/y VMEM-resident, SMEM metadata sideband), plus per-block column gathering:
each block reads an (8,128) slice of x2d at its window and gathers per lane
one of the 8 sub-rows with a sublane `take_along_axis` — the one dynamic
indexing primitive the VPU supports.  See plan/windows.py for the format.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.windows import LANES, SEGS, WindowPlan


def chunk_for_windowed(block_h: int, target_bytes: int = 1 << 20) -> int:
    bytes_per_block = (block_h * LANES + LANES) * 4  # payload + subidx
    c = max(target_bytes // bytes_per_block, 16)
    return int(min(512, (c // 8) * 8))


def pack_window_chunks(plan: WindowPlan, chunk: int, dtype=np.float32):
    """Pad the stream to whole chunks; returns (data3d, subidx3d, meta,
    nchunks) with meta[:,0]=row_block*2+last, meta[:,1]=window.  ``dtype``
    may be bfloat16 to halve payload bytes (fp32 accumulation)."""
    import jax.numpy as _jnp

    if dtype in ("bfloat16", _jnp.bfloat16):
        dtype = _jnp.bfloat16
    nb = plan.num_blocks
    nchunks = max(-(-nb // chunk), 1)
    nb_pad = nchunks * chunk
    bh = plan.block_h

    data = np.zeros((nb_pad, bh, LANES), dtype)
    data[:nb] = plan.data.astype(dtype)
    subidx = np.zeros((nb_pad, LANES), np.int32)
    subidx[:nb] = plan.subidx
    meta = np.zeros((2, nb_pad), np.int32)
    meta[0, :nb] = plan.block_rows * 2 + plan.block_lasts
    meta[1, :nb] = plan.block_wins
    if nb_pad > nb:
        meta[0, nb:] = (plan.block_rows[-1] if nb else 0) * 2

    data3d = data.reshape(nchunks, chunk * bh, LANES)
    subidx3d = subidx.reshape(nchunks, chunk, LANES)
    meta = np.ascontiguousarray(
        meta.reshape(2, nchunks, chunk).transpose(1, 0, 2)
    )
    return data3d, subidx3d, meta, nchunks


def _windowed_kernel(
    a_ref,  # f32 [1, chunk*bh, LANES]
    sub_ref,  # i32 [1, chunk, LANES]
    meta_ref,  # i32 [1, 2, chunk] (SMEM)
    x_ref,  # f32 [nwin*SEGS, LANES] full x (VMEM)
    y_ref,  # f32 [nrb, bh] full y (VMEM)
    acc_ref,  # f32 [bh, LANES] scratch
    *,
    chunk: int,
    bh: int,
    unroll: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]
        wb = meta_ref[0, 1, j]

        win = x_ref[pl.ds(wb * SEGS, SEGS), :]  # (8, LANES)
        idx = jnp.broadcast_to(sub_ref[0, pl.ds(j, 1), :], (SEGS, LANES))
        xg = jnp.take_along_axis(win, idx, axis=0)[0:1, :]  # (1, LANES)
        ab = a_ref[0, pl.ds(j * bh, bh), :].astype(jnp.float32)
        acc_ref[...] += ab * xg

        @pl.when(rb2 & 1 == 1)
        def _flush():
            y_ref[pl.ds(rb2 >> 1, 1), :] = jnp.sum(
                acc_ref[...], axis=1
            )[None, :]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    assert chunk % unroll == 0, (chunk, unroll)

    def body(jo, _):
        for k in range(unroll):
            do_block(jo * unroll + k)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def spmv_windowed_pallas(
    data3d: jax.Array,  # f32 [nchunks, chunk*bh, LANES]
    subidx3d: jax.Array,  # i32 [nchunks, chunk, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    x2d: jax.Array,  # f32 [nwin*SEGS, LANES]
    num_row_blocks: int,
    block_h: int,
    chunk: int,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    nchunks = data3d.shape[0]
    assert data3d.shape[1] == chunk * block_h

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, chunk * block_h, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, chunk),
                lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (num_row_blocks, block_h),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_h, LANES), jnp.float32)],
    )

    kernel = functools.partial(
        _windowed_kernel, chunk=chunk, bh=block_h, unroll=unroll
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_row_blocks, block_h), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * data3d.size,
            bytes_accessed=data3d.size * 4 + subidx3d.size * 4 + x2d.size * 4,
            transcendentals=0,
        ),
    )(data3d, subidx3d, meta, x2d)


def spmv_windowed(
    plan: WindowPlan,
    x,
    y_in=None,
    alpha=1.0,
    beta=0.0,
    chunk=None,
    *,
    interpret: bool = False,
):
    """Host-convenience wrapper (tests / one-shot use)."""
    chunk = chunk or chunk_for_windowed(plan.block_h)
    data3d, subidx3d, meta, _ = pack_window_chunks(plan, chunk)
    Cp = plan.num_windows * SEGS * LANES
    x = jnp.asarray(x, jnp.float32)
    if Cp > x.shape[0]:
        x = jnp.pad(x, (0, Cp - x.shape[0]))
    y = spmv_windowed_pallas(
        jnp.asarray(data3d),
        jnp.asarray(subidx3d),
        jnp.asarray(meta),
        x.reshape(-1, LANES),
        plan.num_row_blocks,
        plan.block_h,
        chunk,
        interpret=interpret,
    )
    y = alpha * y.reshape(-1)[: plan.shape[0]]
    if y_in is not None:
        y = y + beta * jnp.asarray(y_in, jnp.float32)
    return y


# ---------------------------------------------------------------------------
# Batched windowed kernel: the A block is DMA'd once per chunk and
# contracted against the whole batch (the runLinear stream-reuse contract,
# fpga_handle.cpp:323-388).
#
# x is packed host-side as [nwin*SEGS, B*LANES] with value (s, b*LANES+j) =
# x_b[s*LANES + j]; the per-block sub-index row broadcasts across the batch
# (idx depends only on the lane j), so B per-batch (SEGS, LANES) gathers at
# static column offsets fetch every batch vector's window column, followed
# by one MXU contraction (bh,LANES)x(B,LANES)->(bh,B).
# ---------------------------------------------------------------------------


def _windowed_batched_kernel(
    a_ref,  # f32 [1, chunk*bh, LANES]
    sub_ref,  # i32 [1, chunk, LANES]
    meta_ref,  # i32 [1, 2, chunk] (SMEM)
    x_ref,  # f32 [nwin*SEGS, B*LANES] packed batch x (VMEM)
    y_ref,  # f32 [nrb, bh, B] (VMEM)
    acc_ref,  # f32 [bh, B] scratch
    *,
    chunk: int,
    bh: int,
    batch: int,
    unroll: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]
        wb = meta_ref[0, 1, j]

        sub = sub_ref[0, pl.ds(j, 1), :]  # (1, LANES)
        idx = jnp.broadcast_to(sub, (SEGS, LANES))
        # Per-batch (SEGS, LANES) gathers at static column offsets: a
        # single wide gather + (1, B*LANES) -> (B, LANES) reshape would
        # split lanes into sublanes, a relayout Mosaic rejects
        # ("unsupported shape cast" on hardware).
        xg = jnp.concatenate(
            [
                jnp.take_along_axis(
                    x_ref[pl.ds(wb * SEGS, SEGS),
                          b * LANES:(b + 1) * LANES],
                    idx, axis=0,
                )[0:1]
                for b in range(batch)
            ],
            axis=0,
        )  # (B, LANES)
        ab = a_ref[0, pl.ds(j * bh, bh), :]  # (bh, LANES)
        acc_ref[...] += jax.lax.dot_general(
            ab, xg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        @pl.when(rb2 & 1 == 1)
        def _flush():
            y_ref[pl.ds(rb2 >> 1, 1), :, :] = acc_ref[...][None]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    assert chunk % unroll == 0, (chunk, unroll)

    def body(jo, _):
        for k in range(unroll):
            do_block(jo * unroll + k)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def spmv_windowed_batched_pallas(
    data3d: jax.Array,  # f32 [nchunks, chunk*bh, LANES]
    subidx3d: jax.Array,  # i32 [nchunks, chunk, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    x_packed: jax.Array,  # f32 [nwin*SEGS, B*LANES]
    num_row_blocks: int,
    block_h: int,
    chunk: int,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Batched windowed stream; returns y f32 [num_row_blocks, block_h, B]."""
    nchunks = data3d.shape[0]
    assert data3d.shape[1] == chunk * block_h
    batch = x_packed.shape[1] // LANES
    assert batch * LANES == x_packed.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, chunk * block_h, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, chunk, LANES),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, chunk),
                lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (num_row_blocks, block_h, batch),
            lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_h, batch), jnp.float32)],
    )

    kernel = functools.partial(
        _windowed_batched_kernel,
        chunk=chunk, bh=block_h, batch=batch, unroll=unroll,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_row_blocks, block_h, batch), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * data3d.size * batch,
            bytes_accessed=data3d.size * 4 + x_packed.size * 4,
            transcendentals=0,
        ),
    )(data3d, subidx3d, meta, x_packed)


def pack_batch_x(xb: jax.Array, num_windows: int) -> jax.Array:
    """[B, Cp] -> [nwin*SEGS, B*LANES] layout for the batched kernel."""
    B = xb.shape[0]
    S = num_windows * SEGS
    return (
        xb.reshape(B, S, LANES).transpose(1, 0, 2).reshape(S, B * LANES)
    )

"""Chunked block-ELL SpMV — the production Pallas TPU kernel.

Second-generation kernel (see ops/spmv_block.py for the simple per-block
variant).  Design driven by hardware measurement: a grid step per 4 KiB
block costs ~170 ns of fixed overhead (~16x the DMA time of the block), so
the stream must be consumed in BIG contiguous chunks:

- grid = A-chunks of ``chunk`` blocks (one ~512 KiB contiguous DMA per
  step, double-buffered automatically by the Pallas pipeline — the MM2S_A
  free-running read analog, base_functions.cpp:3-31);
- x lives entirely in VMEM for the whole kernel (the B_WINDOW BRAM analog,
  assets/spmv.h:30-32) — each block's x slice is a cheap sublane-dynamic
  slice, never a gather;
- y lives entirely in VMEM and is written back once at the end (AccumBuffer
  URAM analog, base_functions.cpp:439-504);
- per-block metadata (local row-block, col-block, first/last flags) rides
  in an int32 sideband array DMA'd to SMEM alongside each chunk (the
  encoded-stream flag bits analog, spmv-helper.h:33-60);
- the inner ``fori_loop`` does: dynamic-slice x row, FMA into a
  (block_h, 128) accumulator, and on row-block end one lane-reduction and
  one dynamic-sublane y write.  All VPU, no MXU, fp32 exact.

VMEM budget: x (padded_cols*4 B) + y (padded_rows*4 B) + 2 chunk buffers.
Matrices whose x exceeds the budget use the column-paneled variant at the
bottom of this file; only y > VMEM still falls back to the per-block
kernel (ops/spmv_block.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.blocks import LANES, BlockPlan

DEFAULT_CHUNK = 128  # blocks per grid step (for block_h=16)


def chunk_for(block_h: int, target_bytes: int = 1 << 20) -> int:
    """Blocks per grid step targeting ~1 MiB chunk payloads (x2 buffers);
    multiple of 8 so partial unroll divides evenly."""
    c = max(target_bytes // (block_h * LANES * 4), 16)
    return int(min(512, (c // 8) * 8))


def pack_chunks(
    plan: BlockPlan, chunk: int = DEFAULT_CHUNK, dtype=np.float32
):
    """Pad the plan's block stream to a whole number of chunks and build the
    int32 metadata sideband.

    Returns (data3d, meta, nchunks):
      data3d [nchunks, chunk*block_h, LANES] in ``dtype`` (float32, or
      bfloat16 to halve A-stream bytes in DMA-bound regimes — values only;
      accumulation stays fp32 in the kernel)
      meta   i32 [nchunks, 2, chunk] with meta[:,0] = row_block*2 + last and
      meta[:,1] = col_block (two scalar reads per block in the kernel).
    Padding blocks: zero payload, last=0, row = last real row (they
    accumulate zeros into a dead accumulator and never flush)."""
    import jax.numpy as _jnp

    if dtype in ("bfloat16", _jnp.bfloat16):
        dtype = _jnp.bfloat16
    nb = plan.num_blocks
    nchunks = max(-(-nb // chunk), 1)
    nb_pad = nchunks * chunk
    bh = plan.block_h

    data = np.zeros((nb_pad, bh, LANES), dtype)
    data[:nb] = plan.data.astype(dtype)
    meta = np.zeros((2, nb_pad), np.int32)
    meta[0, :nb] = plan.block_rows * 2 + plan.block_lasts
    meta[1, :nb] = plan.block_cols
    if nb_pad > nb:
        meta[0, nb:] = (plan.block_rows[-1] if nb else 0) * 2

    data3d = data.reshape(nchunks, chunk * bh, LANES)
    meta = np.ascontiguousarray(
        meta.reshape(2, nchunks, chunk).transpose(1, 0, 2)
    )
    return data3d, meta, nchunks


def _chunked_kernel(
    a_ref,  # f32 [1, chunk*bh, LANES] current A chunk (VMEM)
    meta_ref,  # i32 [1, 2, chunk] metadata sideband (SMEM)
    x_ref,  # f32 [ncb, LANES] full x (VMEM, resident)
    y_ref,  # f32 [nrb, bh] full y (VMEM, resident; written back at end)
    acc_ref,  # f32 [bh, LANES] scratch accumulator (persists across grid)
    *,
    chunk: int,
    bh: int,
    unroll: int = 8,
):
    # The accumulator starts zeroed and every flush re-zeroes it, so no
    # per-block "first" branch is needed (planner guarantees each row-block
    # ends with exactly one last-flagged block).
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]  # row_block * 2 + last
        cb = meta_ref[0, 1, j]

        xs = x_ref[pl.ds(cb, 1), :]  # (1, LANES)
        # values may be bf16-compressed; multiply in fp32
        ab = a_ref[0, pl.ds(j * bh, bh), :].astype(jnp.float32)
        acc_ref[...] += ab * xs

        @pl.when(rb2 & 1 == 1)
        def _flush():
            y_ref[pl.ds(rb2 >> 1, 1), :] = jnp.sum(
                acc_ref[...], axis=1
            )[None, :]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic supports only full or no loop unrolling; partial unroll is a
    # static inner Python loop inside a rolled outer loop.
    assert chunk % unroll == 0, (chunk, unroll)

    def body(jo, _):
        for k in range(unroll):
            do_block(jo * unroll + k)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def spmv_chunked_pallas(
    data3d: jax.Array,  # f32 [nchunks, chunk*bh, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    x_blocks: jax.Array,  # f32 [ncb, LANES]
    num_row_blocks: int,
    block_h: int,
    chunk: int = DEFAULT_CHUNK,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Run the chunked stream; returns y tiles f32 [num_row_blocks, block_h]."""
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
        _chunked_kernel, chunk=chunk, bh=block_h, unroll=unroll
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
            bytes_accessed=data3d.size * 4 + x_blocks.size * 4,
            transcendentals=0,
        ),
    )(data3d, meta, x_blocks)


def spmv_chunked(
    plan: BlockPlan,
    x,
    y_in=None,
    alpha=1.0,
    beta=0.0,
    chunk: int = DEFAULT_CHUNK,
    *,
    interpret: bool = False,
):
    """Host-convenience wrapper (re-uploads per call; tests/one-shot use)."""
    data3d, meta, _ = pack_chunks(plan, chunk)
    ncb = plan.num_col_blocks
    x = jnp.asarray(x, jnp.float32)
    pad = ncb * LANES - x.shape[0]
    if pad > 0:
        x = jnp.pad(x, (0, pad))
    if plan.col_perm is not None:
        perm = np.concatenate(
            [
                plan.col_perm,
                np.arange(plan.shape[1], ncb * LANES, dtype=np.int32),
            ]
        )
        x = jnp.take(x, jnp.asarray(perm), axis=0)
    y = spmv_chunked_pallas(
        jnp.asarray(data3d),
        jnp.asarray(meta),
        x.reshape(ncb, LANES),
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
# Batched chunked kernel: y[:, B] = A @ x[:, B] with the same chunked
# architecture (contiguous A chunks, x/y VMEM-resident) and an MXU matmul
# per block.  Replaces the per-block-grid batched kernel for linear():
# measured 250 ns/block grid overhead there vs ~30 ns here.
# ---------------------------------------------------------------------------


def _chunked_batched_kernel(
    a_ref,  # f32 [1, chunk*bh, LANES]
    meta_ref,  # i32 [1, 2, chunk] (SMEM)
    x_ref,  # f32 [ncb, LANES, B] full x (VMEM)
    y_ref,  # f32 [nrb, bh, B] full y (VMEM)
    acc_ref,  # f32 [bh, B] scratch
    *,
    chunk: int,
    bh: int,
    unroll: int = 8,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]
        cb = meta_ref[0, 1, j]

        xs = x_ref[pl.ds(cb, 1), :, :][0]  # (LANES, B)
        ab = a_ref[0, pl.ds(j * bh, bh), :]  # (bh, LANES)
        acc_ref[...] += jnp.dot(
            ab, xs,
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


def spmv_chunked_batched_pallas(
    data3d: jax.Array,  # f32 [nchunks, chunk*bh, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    x_blocks: jax.Array,  # f32 [ncb, LANES, B]
    num_row_blocks: int,
    block_h: int,
    chunk: int = DEFAULT_CHUNK,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Batched chunked stream; returns y f32 [num_row_blocks, block_h, B]."""
    nchunks = data3d.shape[0]
    assert data3d.shape[1] == chunk * block_h
    batch = x_blocks.shape[-1]

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
        _chunked_batched_kernel, chunk=chunk, bh=block_h, unroll=unroll
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
            bytes_accessed=data3d.size * 4 + x_blocks.size * 4,
            transcendentals=0,
        ),
    )(data3d, meta, x_blocks)


# ---------------------------------------------------------------------------
# Column-paneled variant: matrices whose x (+y) exceed VMEM are processed
# panel-by-panel — x is tiled into column panels DMA'd per chunk via a
# scalar-prefetched index, y stays resident and accumulates across panels
# (flushes ADD instead of assign).  This is the B_WINDOW column-tiling
# analog (spmv-helper.cpp:242-263): the reference re-streams its BRAM
# window once per row tile; here the Pallas pipeline re-stages the x panel
# whenever the chunk sequence crosses a panel boundary.
#
# The fully-tiled (x panels x y panels) variant for matrices whose y ALSO
# exceeds VMEM is at the bottom of this file (spmv_chunked_tiled_pallas) —
# the row-tiling analog (MAX_ROWS_PER_PE, spmv-helper.cpp:139-263).
# ---------------------------------------------------------------------------


def pack_chunks_paneled(
    plan: BlockPlan, chunk: int, panel_ncb: int, dtype=np.float32
):
    """Re-sort the block stream by (column panel, row_block) and pack into
    chunks that never straddle a panel boundary.

    Returns (data3d, meta, panel_ids, nchunks):
      meta[:, 0] = row_block*2 + last_of_(panel,row_block)_run
      meta[:, 1] = col_block LOCAL to the panel
      panel_ids  = i32 [nchunks] panel index per chunk (scalar prefetch)
    """
    import jax.numpy as _jnp

    if dtype in ("bfloat16", _jnp.bfloat16):
        dtype = _jnp.bfloat16
    bh = plan.block_h
    panel = plan.block_cols // panel_ncb
    order = np.lexsort((plan.block_cols, plan.block_rows, panel))
    data = plan.data[order].astype(dtype)
    rows = plan.block_rows[order]
    cols_local = (plan.block_cols - panel * panel_ncb)[order]
    panel = panel[order]

    # last flag per (panel, row_block) run
    run_key = panel.astype(np.int64) * (plan.num_row_blocks + 1) + rows
    lasts = np.ones(len(rows), np.int32)
    lasts[:-1] = (run_key[1:] != run_key[:-1]).astype(np.int32)

    # split into per-panel segments, pad each to whole chunks
    seg_data, seg_meta, seg_panel = [], [], []
    for p in np.unique(panel):
        sel = panel == p
        n = int(sel.sum())
        n_pad = -(-n // chunk) * chunk
        d = np.zeros((n_pad, bh, LANES), dtype)
        d[:n] = data[sel]
        m = np.zeros((2, n_pad), np.int32)
        m[0, :n] = rows[sel] * 2 + lasts[sel]
        m[1, :n] = cols_local[sel]
        if n_pad > n:
            m[0, n:] = rows[sel][-1] * 2  # pad: no flush, zero payload
        seg_data.append(d)
        seg_meta.append(m)
        seg_panel.extend([int(p)] * (n_pad // chunk))
    data = np.concatenate(seg_data) if seg_data else np.zeros(
        (chunk, bh, LANES), dtype
    )
    meta = (
        np.concatenate(seg_meta, axis=1)
        if seg_meta
        else np.zeros((2, chunk), np.int32)
    )
    if not seg_panel:
        seg_panel = [0]
    nchunks = len(seg_panel)
    data3d = data.reshape(nchunks, chunk * bh, LANES)
    meta = np.ascontiguousarray(
        meta.reshape(2, nchunks, chunk).transpose(1, 0, 2)
    )
    return data3d, meta, np.asarray(seg_panel, np.int32), nchunks


def _chunked_paneled_kernel(
    panel_ref,  # i32 [nchunks] scalar prefetch (also drives x index map)
    a_ref,  # f32 [1, chunk*bh, LANES]
    meta_ref,  # i32 [1, 2, chunk] (SMEM)
    x_ref,  # f32 [panel_ncb, LANES] current x panel (VMEM, pipelined)
    y_ref,  # f32 [nrb, bh] full y (VMEM, accumulates across panels)
    acc_ref,  # f32 [bh, LANES] scratch
    *,
    chunk: int,
    bh: int,
    unroll: int,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        y_ref[...] = jnp.zeros_like(y_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]
        cb = meta_ref[0, 1, j]  # panel-local
        xs = x_ref[pl.ds(cb, 1), :]
        ab = a_ref[0, pl.ds(j * bh, bh), :].astype(jnp.float32)
        acc_ref[...] += ab * xs

        @pl.when(rb2 & 1 == 1)
        def _flush():
            prev = y_ref[pl.ds(rb2 >> 1, 1), :]
            y_ref[pl.ds(rb2 >> 1, 1), :] = prev + jnp.sum(
                acc_ref[...], axis=1
            )[None, :]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    assert chunk % unroll == 0, (chunk, unroll)

    def body(jo, _):
        for k in range(unroll):
            do_block(jo * unroll + k)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def spmv_chunked_paneled_pallas(
    data3d: jax.Array,  # f32 [nchunks, chunk*bh, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    panel_ids: jax.Array,  # i32 [nchunks]
    x_blocks: jax.Array,  # f32 [npanels*panel_ncb, LANES] (padded x)
    num_row_blocks: int,
    block_h: int,
    chunk: int,
    panel_ncb: int,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    nchunks = data3d.shape[0]
    assert data3d.shape[1] == chunk * block_h

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, chunk * block_h, LANES),
                lambda i, panels: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, chunk),
                lambda i, panels: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (panel_ncb, LANES),
                lambda i, panels: (panels[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_row_blocks, block_h),
            lambda i, panels: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_h, LANES), jnp.float32)],
    )

    kernel = functools.partial(
        _chunked_paneled_kernel, chunk=chunk, bh=block_h, unroll=unroll
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
            bytes_accessed=data3d.size * 4 + x_blocks.size * 4,
            transcendentals=0,
        ),
    )(panel_ids, data3d, meta, x_blocks)


# ---------------------------------------------------------------------------
# Fully-tiled variant: x AND y both exceed VMEM.  Blocks are sorted by
# (row_panel, col_panel, row_block) so each y panel is visited exactly once
# (all its column panels consecutively) and never revisited — the row-tile
# scheduling contract of the reference (tileAndPad row tiles,
# spmv-helper.cpp:139-263).  x panels are re-staged per row panel (the
# MM2S_B re-read-per-row-tile analog, base_functions.cpp:33-54); the y
# panel rides an output index map and is zeroed at its first chunk.
# ---------------------------------------------------------------------------


def pack_chunks_tiled(
    plan: BlockPlan,
    chunk: int,
    panel_ncb: int,
    panel_nrb: int,
    dtype=np.float32,
):
    """Re-sort the block stream by (row_panel, col_panel, row_block) and
    pack into chunks that never straddle a (row_panel, col_panel) boundary.

    Returns (data3d, meta, xpanel_ids, ypanel_ids, yfirst, nchunks):
      meta[:, 0] = local_row_block*2 + last_of_(rp,cp,row_block)_run
      meta[:, 1] = col_block LOCAL to the column panel
      xpanel_ids i32 [nchunks] column-panel per chunk (scalar prefetch)
      ypanel_ids i32 [nchunks] row-panel per chunk (scalar prefetch)
      yfirst     i32 [nchunks] 1 on the first chunk of each row panel
    """
    import jax.numpy as _jnp

    if dtype in ("bfloat16", _jnp.bfloat16):
        dtype = _jnp.bfloat16
    bh = plan.block_h
    cpanel = plan.block_cols // panel_ncb
    rpanel = plan.block_rows // panel_nrb
    order = np.lexsort(
        (plan.block_cols, plan.block_rows, cpanel, rpanel)
    )
    data = plan.data[order].astype(dtype)
    rows_local = (plan.block_rows - rpanel * panel_nrb)[order]
    cols_local = (plan.block_cols - cpanel * panel_ncb)[order]
    cpanel = cpanel[order]
    rpanel = rpanel[order]

    # last flag per (rpanel, cpanel, row_block) run
    ncp = int(cpanel.max()) + 1 if len(cpanel) else 1
    run_key = (
        rpanel.astype(np.int64) * ncp + cpanel
    ) * (panel_nrb + 1) + rows_local
    lasts = np.ones(len(rows_local), np.int32)
    lasts[:-1] = (run_key[1:] != run_key[:-1]).astype(np.int32)

    # split into per-(rpanel, cpanel) segments, pad each to whole chunks
    seg_key = rpanel.astype(np.int64) * ncp + cpanel
    seg_data, seg_meta, seg_xp, seg_yp = [], [], [], []
    for k in np.unique(seg_key):
        sel = seg_key == k
        n = int(sel.sum())
        n_pad = -(-n // chunk) * chunk
        d = np.zeros((n_pad, bh, LANES), dtype)
        d[:n] = data[sel]
        m = np.zeros((2, n_pad), np.int32)
        m[0, :n] = rows_local[sel] * 2 + lasts[sel]
        m[1, :n] = cols_local[sel]
        if n_pad > n:
            m[0, n:] = rows_local[sel][-1] * 2  # pad: no flush, zero payload
        seg_data.append(d)
        seg_meta.append(m)
        seg_xp.extend([int(k % ncp)] * (n_pad // chunk))
        seg_yp.extend([int(k // ncp)] * (n_pad // chunk))
    if not seg_data:
        seg_data = [np.zeros((chunk, bh, LANES), dtype)]
        seg_meta = [np.zeros((2, chunk), np.int32)]
        seg_xp, seg_yp = [0], [0]
    data = np.concatenate(seg_data)
    meta = np.concatenate(seg_meta, axis=1)
    nchunks = len(seg_xp)
    data3d = data.reshape(nchunks, chunk * bh, LANES)
    meta = np.ascontiguousarray(
        meta.reshape(2, nchunks, chunk).transpose(1, 0, 2)
    )
    ypanel_ids = np.asarray(seg_yp, np.int32)
    yfirst = np.ones(nchunks, np.int32)
    yfirst[1:] = (ypanel_ids[1:] != ypanel_ids[:-1]).astype(np.int32)
    return (
        data3d,
        meta,
        np.asarray(seg_xp, np.int32),
        ypanel_ids,
        yfirst,
        nchunks,
    )


def _chunked_tiled_kernel(
    xp_ref,  # i32 [nchunks] scalar prefetch: column panel per chunk
    yp_ref,  # i32 [nchunks] scalar prefetch: row panel per chunk
    yfirst_ref,  # i32 [nchunks] 1 = first chunk of a row panel
    a_ref,  # [1, chunk*bh, LANES]
    meta_ref,  # i32 [1, 2, chunk] (SMEM)
    x_ref,  # f32 [panel_ncb, LANES] current x panel (VMEM, pipelined)
    y_ref,  # f32 [panel_nrb, bh] current y panel (VMEM, output index map)
    acc_ref,  # f32 [bh, LANES] scratch
    *,
    chunk: int,
    bh: int,
    unroll: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero_acc():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(yfirst_ref[i] == 1)
    def _zero_panel():
        # fresh output buffer for this row panel: contents undefined
        y_ref[...] = jnp.zeros_like(y_ref)

    def do_block(j):
        rb2 = meta_ref[0, 0, j]
        cb = meta_ref[0, 1, j]  # panel-local
        xs = x_ref[pl.ds(cb, 1), :]
        ab = a_ref[0, pl.ds(j * bh, bh), :].astype(jnp.float32)
        acc_ref[...] += ab * xs

        @pl.when(rb2 & 1 == 1)
        def _flush():
            prev = y_ref[pl.ds(rb2 >> 1, 1), :]
            y_ref[pl.ds(rb2 >> 1, 1), :] = prev + jnp.sum(
                acc_ref[...], axis=1
            )[None, :]
            acc_ref[...] = jnp.zeros_like(acc_ref)

    assert chunk % unroll == 0, (chunk, unroll)

    def body(jo, _):
        for k in range(unroll):
            do_block(jo * unroll + k)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def spmv_chunked_tiled_pallas(
    data3d: jax.Array,  # [nchunks, chunk*bh, LANES]
    meta: jax.Array,  # i32 [nchunks, 2, chunk]
    xpanel_ids: jax.Array,  # i32 [nchunks]
    ypanel_ids: jax.Array,  # i32 [nchunks]
    yfirst: jax.Array,  # i32 [nchunks]
    x_blocks: jax.Array,  # f32 [npanels_x*panel_ncb, LANES] (padded x)
    num_row_panels: int,
    panel_nrb: int,
    block_h: int,
    chunk: int,
    panel_ncb: int,
    *,
    unroll: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fully-tiled chunked stream; returns y f32
    [num_row_panels*panel_nrb, block_h]."""
    nchunks = data3d.shape[0]
    assert data3d.shape[1] == chunk * block_h

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, chunk * block_h, LANES),
                lambda i, xp, yp, yf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, chunk),
                lambda i, xp, yp, yf: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (panel_ncb, LANES),
                lambda i, xp, yp, yf: (xp[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (panel_nrb, block_h),
            lambda i, xp, yp, yf: (yp[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_h, LANES), jnp.float32)],
    )

    kernel = functools.partial(
        _chunked_tiled_kernel, chunk=chunk, bh=block_h, unroll=unroll
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_row_panels * panel_nrb, block_h), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * data3d.size,
            bytes_accessed=data3d.size * data3d.dtype.itemsize
            + x_blocks.size * 4,
            transcendentals=0,
        ),
    )(xpanel_ids, ypanel_ids, yfirst, data3d, meta, x_blocks)

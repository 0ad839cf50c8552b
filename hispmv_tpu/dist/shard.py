"""Multi-chip SpMV: nnz-balanced row sharding over a device mesh.

The reference is single-device; its "interconnect" is 28 HBM pseudo-channels
with explicit physical binding (SURVEY.md section 2.7).  The TPU-native
distributed design:

- rows are sharded across devices in contiguous row-block runs, with the
  split points chosen so each device carries an (approximately) equal number
  of dense blocks — i.e. equal HBM bytes, the direct analog of the reference's
  per-PE nnz balancing (spmv-helper.cpp:265-347) lifted to the device level;
- x is either replicated or column-sharded and ``all_gather``-ed over ICI
  inside the ``shard_map`` body (the LoadB window-broadcast analog);
- y comes out row-sharded with no communication (partial sums never cross
  devices — the planner keeps whole row-blocks on one device).

Everything is static-shaped: per-device block streams are padded to the
maximum shard length with no-op blocks (the zero-padding stream entry
analog, spmv-helper.cpp:622-637).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from hispmv_tpu.formats.matrix import COOMatrix
from hispmv_tpu.ops.spmv_block import spmv_block_pallas
from hispmv_tpu.plan.blocks import LANES, BlockPlan, build_block_plan


def make_mesh(num_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


@dataclasses.dataclass
class ShardedBlockPlan:
    """Per-device stacked block streams (leading axis = device)."""

    shape: tuple
    nnz: int
    block_h: int
    num_devices: int
    # stacked, padded arrays; leading dim D
    data: np.ndarray  # f32 [D, nb_max, block_h, LANES]
    block_rows: np.ndarray  # i32 [D, nb_max] LOCAL row-block ids
    block_cols: np.ndarray  # i32 [D, nb_max]
    block_firsts: np.ndarray  # i32 [D, nb_max]
    block_lasts: np.ndarray  # i32 [D, nb_max]
    nrb_per_dev: tuple  # real row-blocks per device
    nrb_max: int
    num_col_blocks: int
    blocks_per_dev: tuple  # real (unpadded) block count per device

    @property
    def balance(self) -> float:
        """max/mean block load across devices (1.0 = perfect)."""
        loads = np.asarray(self.blocks_per_dev, np.float64)
        return float(loads.max() / max(loads.mean(), 1e-9))


def _split_boundaries(counts: np.ndarray, parts: int) -> np.ndarray:
    """Split a sequence of per-item weights into ``parts`` contiguous chunks
    with near-equal weight (prefix-sum bisection)."""
    cum = np.concatenate([[0], np.cumsum(counts)])
    total = cum[-1]
    targets = total * np.arange(1, parts) / parts
    cuts = np.searchsorted(cum, targets, side="left")
    cuts = np.clip(cuts, 1, len(counts))
    if len(counts) >= parts:
        # enough items: make every chunk non-empty (strictly increasing
        # cuts with room left for the chunks after each cut)
        for i in range(len(cuts) - 1, -1, -1):
            cuts[i] = min(cuts[i], len(counts) - (len(cuts) - i))
        for i in range(len(cuts)):
            lo = cuts[i - 1] + 1 if i else 1
            cuts[i] = max(cuts[i], lo)
    else:
        # fewer items than devices: leading chunks get one item each
        cuts = np.minimum(np.arange(1, parts), len(counts))
    return np.concatenate([[0], cuts, [len(counts)]]).astype(np.int64)


def build_sharded_block_plan(
    coo: COOMatrix,
    num_devices: int,
    block_h: int = 8,
    col_perm: Optional[np.ndarray] = None,
) -> ShardedBlockPlan:
    """Build one global block plan, then cut it into balanced device shards."""
    plan: BlockPlan = build_block_plan(coo, block_h=block_h, col_perm=col_perm)
    nrb = plan.num_row_blocks
    # blocks per row-block (row_blocks are sorted in the plan)
    blocks_per_rb = np.bincount(plan.block_rows, minlength=nrb)
    bounds = _split_boundaries(blocks_per_rb, num_devices)

    # slice the flat block stream per device
    rb_starts = np.concatenate([[0], np.cumsum(blocks_per_rb)])
    dev_slices = [
        (int(rb_starts[bounds[d]]), int(rb_starts[bounds[d + 1]]))
        for d in range(num_devices)
    ]
    nb_real = [e - s for s, e in dev_slices]
    nb_max = max(max(nb_real), 1)
    nrb_per_dev = tuple(
        int(bounds[d + 1] - bounds[d]) for d in range(num_devices)
    )
    nrb_max = max(max(nrb_per_dev), 1)

    D = num_devices
    data = np.zeros((D, nb_max, block_h, LANES), np.float32)
    rows = np.zeros((D, nb_max), np.int32)
    cols = np.zeros((D, nb_max), np.int32)
    firsts = np.zeros((D, nb_max), np.int32)
    lasts = np.zeros((D, nb_max), np.int32)
    for d, (s, e) in enumerate(dev_slices):
        n = e - s
        if n == 0:
            # degenerate empty shard: one zero block on local row-block 0
            rows[d, 0] = 0
            firsts[d, 0] = 1
            lasts[d, 0] = 1
            continue
        data[d, :n] = plan.data[s:e]
        rows[d, :n] = plan.block_rows[s:e] - int(bounds[d])  # localize
        cols[d, :n] = plan.block_cols[s:e]
        firsts[d, :n] = plan.block_firsts[s:e]
        lasts[d, :n] = plan.block_lasts[s:e]
        # padding blocks: revisit the shard's last row-block, contribute
        # nothing, never flush (data stays zero, firsts/lasts stay 0)
        if n < nb_max:
            rows[d, n:] = rows[d, n - 1]

    return ShardedBlockPlan(
        shape=plan.shape,
        nnz=plan.nnz,
        block_h=block_h,
        num_devices=D,
        data=data,
        block_rows=rows,
        block_cols=cols,
        block_firsts=firsts,
        block_lasts=lasts,
        nrb_per_dev=nrb_per_dev,
        nrb_max=nrb_max,
        num_col_blocks=plan.num_col_blocks,
        blocks_per_dev=tuple(nb_real),
    )


def spmv_sharded(
    splan: ShardedBlockPlan,
    x,
    mesh: Mesh,
    *,
    x_mode: str = "replicated",  # "replicated" | "gather"
    interpret: bool = False,
) -> jax.Array:
    """Distributed ``y = A @ x``; returns the full y (row shards gathered).

    ``x_mode="gather"`` shards x over the mesh and all-gathers it over ICI
    inside the shard_map body — the multi-chip LoadB analog.
    """
    from jax import shard_map

    axis = mesh.axis_names[0]
    D = splan.num_devices
    bh = splan.block_h
    nrb_max = splan.nrb_max
    Cp = splan.num_col_blocks * LANES

    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] != splan.shape[1]:
        raise ValueError(
            f"x has {x.shape[0]} entries, matrix has {splan.shape[1]} columns"
        )
    if Cp > x.shape[0]:
        x = jnp.pad(x, (0, Cp - x.shape[0]))
    # pad further so x splits evenly across devices for "gather" mode
    per_dev = -(-Cp // (D * LANES)) * LANES
    if per_dev * D > x.shape[0]:
        x = jnp.pad(x, (0, per_dev * D - x.shape[0]))

    args = (
        jnp.asarray(splan.data),
        jnp.asarray(splan.block_rows),
        jnp.asarray(splan.block_cols),
        jnp.asarray(splan.block_firsts),
        jnp.asarray(splan.block_lasts),
    )

    def body(data, rows, cols, firsts, lasts, x_in):
        # local views have a leading length-1 device axis
        data, rows, cols = data[0], rows[0], cols[0]
        firsts, lasts = firsts[0], lasts[0]
        if x_mode == "gather":
            xg = jax.lax.all_gather(x_in, axis, tiled=True)
        else:
            xg = x_in
        xb = xg[:Cp].reshape(-1, 1, LANES)
        y = spmv_block_pallas(
            data, rows, cols, firsts, lasts, xb, nrb_max,
            interpret=interpret,
        )  # [nrb_max, 1, bh]
        return y.reshape(1, nrb_max * bh)

    x_spec = P(axis) if x_mode == "gather" else P()
    y_sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), x_spec),
        out_specs=P(axis),
        check_vma=False,
    )(*args, x)

    # reassemble: device d contributes its first nrb_per_dev[d]*bh entries
    pieces = [
        y_sharded[d, : splan.nrb_per_dev[d] * bh] for d in range(D)
    ]
    y = jnp.concatenate(pieces)
    return y[: splan.shape[0]]


# ---------------------------------------------------------------------------
# Windowed-format sharding: same contiguous nnz-balanced row-block splits,
# with the windowed stream's sub-index sideband carried per shard.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedWindowPlan:
    shape: tuple
    nnz: int
    block_h: int
    num_devices: int
    data: np.ndarray  # f32 [D, nb_max, block_h, LANES]
    subidx: np.ndarray  # i32 [D, nb_max, LANES]
    block_rows: np.ndarray  # i32 [D, nb_max] local row-block ids
    block_wins: np.ndarray  # i32 [D, nb_max]
    block_firsts: np.ndarray  # i32 [D, nb_max]
    block_lasts: np.ndarray  # i32 [D, nb_max]
    nrb_per_dev: tuple
    nrb_max: int
    num_windows: int
    blocks_per_dev: tuple

    @property
    def balance(self) -> float:
        loads = np.asarray(self.blocks_per_dev, np.float64)
        return float(loads.max() / max(loads.mean(), 1e-9))


def build_sharded_window_plan(
    coo: COOMatrix, num_devices: int, block_h: int = 8
) -> ShardedWindowPlan:
    from hispmv_tpu.plan.windows import build_window_plan

    plan = build_window_plan(coo, block_h=block_h)
    nrb = plan.num_row_blocks
    blocks_per_rb = np.bincount(plan.block_rows, minlength=nrb)
    bounds = _split_boundaries(blocks_per_rb, num_devices)
    rb_starts = np.concatenate([[0], np.cumsum(blocks_per_rb)])
    dev_slices = [
        (int(rb_starts[bounds[d]]), int(rb_starts[bounds[d + 1]]))
        for d in range(num_devices)
    ]
    from hispmv_tpu.ops.spmv_windowed import chunk_for_windowed

    nb_real = [e - s for s, e in dev_slices]
    nb_max = max(max(nb_real), 1)
    # pad shard length to a whole number of VMEM-sized chunks
    chunk = min(chunk_for_windowed(block_h), max(nb_max, 8))
    nb_max = -(-nb_max // chunk) * chunk
    nrb_per_dev = tuple(
        int(bounds[d + 1] - bounds[d]) for d in range(num_devices)
    )
    nrb_max = max(max(nrb_per_dev), 1)

    D = num_devices
    data = np.zeros((D, nb_max, block_h, LANES), np.float32)
    subidx = np.zeros((D, nb_max, LANES), np.int32)
    rows = np.zeros((D, nb_max), np.int32)
    wins = np.zeros((D, nb_max), np.int32)
    firsts = np.zeros((D, nb_max), np.int32)
    lasts = np.zeros((D, nb_max), np.int32)
    for d, (s, e) in enumerate(dev_slices):
        n = e - s
        if n == 0:
            rows[d, 0] = 0
            firsts[d, 0] = 1
            lasts[d, 0] = 1
            continue
        data[d, :n] = plan.data[s:e]
        subidx[d, :n] = plan.subidx[s:e]
        rows[d, :n] = plan.block_rows[s:e] - int(bounds[d])
        wins[d, :n] = plan.block_wins[s:e]
        firsts[d, :n] = plan.block_firsts[s:e]
        lasts[d, :n] = plan.block_lasts[s:e]
        if n < nb_max:
            rows[d, n:] = rows[d, n - 1]

    return ShardedWindowPlan(
        shape=plan.shape,
        nnz=plan.nnz,
        block_h=block_h,
        num_devices=D,
        data=data,
        subidx=subidx,
        block_rows=rows,
        block_wins=wins,
        block_firsts=firsts,
        block_lasts=lasts,
        nrb_per_dev=nrb_per_dev,
        nrb_max=nrb_max,
        num_windows=plan.num_windows,
        blocks_per_dev=tuple(nb_real),
    )


def spmv_sharded_window(
    splan: ShardedWindowPlan,
    x,
    mesh: Mesh,
    *,
    x_mode: str = "replicated",
    interpret: bool = False,
) -> jax.Array:
    """Distributed windowed SpMV; same communication structure as
    :func:`spmv_sharded`."""
    from jax import shard_map

    from hispmv_tpu.ops.spmv_windowed import spmv_windowed_pallas
    from hispmv_tpu.plan.windows import SEGS

    axis = mesh.axis_names[0]
    D = splan.num_devices
    bh = splan.block_h
    nrb_max = splan.nrb_max
    Cp = splan.num_windows * SEGS * LANES

    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] != splan.shape[1]:
        raise ValueError(
            f"x has {x.shape[0]} entries, matrix has {splan.shape[1]} columns"
        )
    if Cp > x.shape[0]:
        x = jnp.pad(x, (0, Cp - x.shape[0]))
    per_dev = -(-Cp // (D * LANES)) * LANES
    if per_dev * D > x.shape[0]:
        x = jnp.pad(x, (0, per_dev * D - x.shape[0]))

    args = (
        jnp.asarray(splan.data),
        jnp.asarray(splan.subidx),
        jnp.asarray(splan.block_rows),
        jnp.asarray(splan.block_wins),
        jnp.asarray(splan.block_firsts),
        jnp.asarray(splan.block_lasts),
    )

    # rebuild the packed 2-row meta per shard once, outside shard_map
    meta = np.zeros((D, 2, splan.data.shape[1]), np.int32)
    meta[:, 0] = splan.block_rows * 2 + splan.block_lasts
    meta[:, 1] = splan.block_wins
    meta_j = jnp.asarray(meta)

    from hispmv_tpu.ops.spmv_windowed import chunk_for_windowed

    nb_max = splan.data.shape[1]
    chunk = min(chunk_for_windowed(bh), nb_max)
    assert nb_max % chunk == 0, (nb_max, chunk)
    nchunks = nb_max // chunk

    def body(data, subidx, rows, wins, firsts, lasts, meta_l, x_in):
        del rows, wins, firsts, lasts
        data, subidx, meta_l = data[0], subidx[0], meta_l[0]
        if x_mode == "gather":
            xg = jax.lax.all_gather(x_in, axis, tiled=True)
        else:
            xg = x_in
        data3d = data.reshape(nchunks, chunk * bh, LANES)
        subidx3d = subidx.reshape(nchunks, chunk, LANES)
        meta3d = jnp.transpose(
            meta_l.reshape(2, nchunks, chunk), (1, 0, 2)
        )
        y = spmv_windowed_pallas(
            data3d, subidx3d, meta3d,
            xg[:Cp].reshape(-1, LANES), nrb_max, bh, chunk,
            unroll=1, interpret=interpret,
        )
        return y.reshape(1, nrb_max * bh)

    x_spec = P(axis) if x_mode == "gather" else P()
    y_sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),) * 6 + (P(axis), x_spec),
        out_specs=P(axis),
        check_vma=False,
    )(*args, meta_j, x)

    pieces = [
        y_sharded[d, : splan.nrb_per_dev[d] * bh] for d in range(D)
    ]
    y = jnp.concatenate(pieces)
    return y[: splan.shape[0]]


# ---------------------------------------------------------------------------
# Chunked fast path + ring overlap (round 2).
#
# The per-block kernel used above costs ~250 ns/block of grid overhead; the
# production path is the chunked stream (ops/spmv_chunked.py).  For the
# multi-chip x exchange, the ring variant column-shards x and rotates it
# with ppermute while each device processes the segment it currently
# holds — XLA's latency-hiding scheduler overlaps the collective with the
# Pallas compute (the halo-overlap contract of SURVEY section 2.7 /
# BASELINE section 6).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedChunkedPlan:
    """Per-device, per-x-shard chunked segments (ring schedule).

    data5 [D, STEP, nch_max, chunk*bh, LANES]: device d's blocks for RING
    STEP t (i.e. x shard (d - t) mod D — the shard device d holds after t
    rotations), packed as an add-flush chunked stream with shard-local
    column ids.  Step-major storage lets the shard_map body index segments
    STATICALLY (no dynamic-slice copy of the A stream).
    meta5 [D, STEP, nch_max, 2, chunk].
    """

    shape: tuple
    nnz: int
    block_h: int
    chunk: int
    num_devices: int
    data5: np.ndarray
    meta5: np.ndarray
    nrb_per_dev: tuple
    nrb_max: int
    num_col_blocks: int
    ncb_per_shard: int
    blocks_per_dev: tuple

    @property
    def balance(self) -> float:
        loads = np.asarray(self.blocks_per_dev, np.float64)
        return float(loads.max() / max(loads.mean(), 1e-9))


def build_sharded_chunked_plan(
    coo: COOMatrix,
    num_devices: int,
    block_h: int = 8,
    chunk: Optional[int] = None,
) -> ShardedChunkedPlan:
    from hispmv_tpu.ops.spmv_chunked import chunk_for

    plan: BlockPlan = build_block_plan(coo, block_h=block_h)
    D = num_devices
    bh = block_h
    chunk = chunk or min(chunk_for(bh), 128)
    nrb = plan.num_row_blocks
    ncb = plan.num_col_blocks
    ncb_per = max(-(-ncb // D), 1)

    blocks_per_rb = np.bincount(plan.block_rows, minlength=nrb)
    bounds = _split_boundaries(blocks_per_rb, D)
    rb_starts = np.concatenate([[0], np.cumsum(blocks_per_rb)])
    nrb_per_dev = tuple(
        int(bounds[d + 1] - bounds[d]) for d in range(D)
    )
    nrb_max = max(max(nrb_per_dev), 1)

    # segment blocks by (device, x shard); count chunks
    segs = {}
    nch_max = 1
    blocks_per_dev = []
    for d in range(D):
        s0, e0 = int(rb_starts[bounds[d]]), int(rb_starts[bounds[d + 1]])
        blocks_per_dev.append(e0 - s0)
        rows_l = plan.block_rows[s0:e0] - int(bounds[d])
        cols_g = plan.block_cols[s0:e0]
        shard = cols_g // ncb_per
        for s in range(D):
            sel = shard == s
            n = int(sel.sum())
            segs[(d, s)] = (
                plan.data[s0:e0][sel],
                rows_l[sel],
                (cols_g - s * ncb_per)[sel],
            )
            nch_max = max(nch_max, -(-n // chunk))

    data5 = np.zeros(
        (D, D, nch_max, chunk * bh, LANES), np.float32
    )
    meta5 = np.zeros((D, D, nch_max, 2, chunk), np.int32)
    for (d, s), (dat, rows_l, cols_l) in segs.items():
        step = (d - s) % D  # ring step at which device d holds shard s
        n = len(rows_l)
        if n == 0:
            continue
        n_pad = nch_max * chunk
        db = np.zeros((n_pad, bh, LANES), np.float32)
        db[:n] = dat
        m = np.zeros((2, n_pad), np.int32)
        # add-flush kernel: last flag per (row_block) run within the segment
        lasts = np.ones(n, np.int32)
        lasts[:-1] = (rows_l[1:] != rows_l[:-1]).astype(np.int32)
        m[0, :n] = rows_l * 2 + lasts
        m[1, :n] = cols_l
        if n_pad > n:
            m[0, n:] = rows_l[-1] * 2
        data5[d, step] = db.reshape(nch_max, chunk * bh, LANES)
        meta5[d, step] = np.ascontiguousarray(
            m.reshape(2, nch_max, chunk).transpose(1, 0, 2)
        )

    return ShardedChunkedPlan(
        shape=plan.shape,
        nnz=plan.nnz,
        block_h=bh,
        chunk=chunk,
        num_devices=D,
        data5=data5,
        meta5=meta5,
        nrb_per_dev=nrb_per_dev,
        nrb_max=nrb_max,
        num_col_blocks=ncb,
        ncb_per_shard=ncb_per,
        blocks_per_dev=tuple(blocks_per_dev),
    )


def spmv_sharded_chunked(
    splan: ShardedChunkedPlan,
    x,
    mesh: Mesh,
    *,
    x_mode: str = "ring",  # "ring" | "replicated"
    interpret: bool = False,
) -> jax.Array:
    """Distributed chunked SpMV.

    ``x_mode="ring"``: x column-sharded; D ring steps, each computing the
    currently-held x shard's segment while ppermute rotates x to the next
    device (comm/compute overlap).  ``"replicated"``: every device holds
    full x and runs its D segments back-to-back (no comm).
    """
    from jax import shard_map

    from hispmv_tpu.ops.spmv_chunked import spmv_chunked_paneled_pallas

    axis = mesh.axis_names[0]
    D = splan.num_devices
    bh = splan.block_h
    chunk = splan.chunk
    nrb_max = splan.nrb_max
    ncb_per = splan.ncb_per_shard
    nch = splan.data5.shape[2]

    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] != splan.shape[1]:
        raise ValueError(
            f"x has {x.shape[0]} entries, matrix has {splan.shape[1]} columns"
        )
    pad = D * ncb_per * LANES - x.shape[0]
    if pad > 0:
        x = jnp.pad(x, (0, pad))

    args = (jnp.asarray(splan.data5), jnp.asarray(splan.meta5))

    def run_segment(d3, m3, x_shard):
        """One ring-step segment through the add-flush chunked kernel
        (x panel = the shard; panel ids all zero -> x stays resident)."""
        return spmv_chunked_paneled_pallas(
            d3, m3, jnp.zeros((nch,), jnp.int32),
            x_shard.reshape(ncb_per, LANES),
            nrb_max, bh, chunk, ncb_per,
            interpret=interpret,
        )

    if x_mode == "ring":

        def body(data5, meta5, x_in):
            data4, meta4 = data5[0], meta5[0]
            x_cur = x_in  # my shard
            y = jnp.zeros((nrb_max, bh), jnp.float32)
            for t in range(D):
                if t < D - 1:
                    # issue the rotation BEFORE the step's compute so the
                    # collective overlaps the Pallas kernel
                    x_next = jax.lax.ppermute(
                        x_cur, axis,
                        perm=[(i, (i + 1) % D) for i in range(D)],
                    )
                y = y + run_segment(data4[t], meta4[t], x_cur)
                if t < D - 1:
                    x_cur = x_next
            return y.reshape(1, nrb_max * bh)

        x_spec = P(axis)
    else:  # replicated

        def body(data5, meta5, x_in):
            data4, meta4 = data5[0], meta5[0]
            me = jax.lax.axis_index(axis)
            y = jnp.zeros((nrb_max, bh), jnp.float32)
            for t in range(D):
                # step t of the ring schedule uses shard (me - t) mod D
                start = ((me - t) % D) * (ncb_per * LANES)
                shard = jax.lax.dynamic_slice_in_dim(
                    x_in, start, ncb_per * LANES
                )
                y = y + run_segment(data4[t], meta4[t], shard)
            return y.reshape(1, nrb_max * bh)

        x_spec = P()

    y_sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), x_spec),
        out_specs=P(axis),
        check_vma=False,
    )(*args, x)

    pieces = [
        y_sharded[d, : splan.nrb_per_dev[d] * bh]
        for d in range(D)
    ]
    y = jnp.concatenate(pieces)
    return y[: splan.shape[0]]

"""Routed-stream Pallas kernel: per-nnz vectorized SpMV.

Executes plan/routed.py streams.  Per (8,128) tile of 1024 nnz slots (all
vector ops, zero per-nnz scalar work):

1. x gather: per pass-1 layer, one sublane take_along_axis composed with
   one lane take_along_axis from THE LAYER'S OWN (8,128) x window
   (``win[t, l]``) — a tile may source from up to ``l1`` windows, which
   is what lets scattered matrices pack into dense tiles;
2. products -> flattened prefix sum: lane prefix via an upper-triangular
   ones matmul (MXU) + sublane carry via a strict-lower block matmul;
3. per boundary layer, run sums P'[end] - P'[start-1] are pulled by two
   more composed gathers (lanes + validity packed two layers per i32
   word, subs four layers per word) and accumulated into THE LAYER'S OWN
   y tile (``byt[t, k]``) — a tile may scatter into up to ``lmax`` row
   bands.

x and y are VMEM-resident; the stream (values + routing bitfields) is
consumed in chunks by the Pallas grid pipeline.  This is the closest TPU
analog of the reference's per-nnz dataflow: the butterfly crossbar and
out-of-order scheduler become plan-time routing arrays
(base_functions.cpp:356-436, spmv-helper.cpp:429-515).

Measured (v5e, loop-slope, v3 calibration 2026-08-18, effective
constants incl. each layer's stream-DMA share): ~30 ns per tile +
~6.4 ns per pass-1 layer + ~17.9 ns per boundary layer (every class-cap
layer runs; padded layers add exact zeros — a boundary layer is ~16
vector ops on (8,128) vregs, i.e. ALU-issue-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.routed import RoutedStream

LANES = 128
DEFAULT_TCHUNK = 16


def _bucket(n: int) -> int:
    """Round up to a power of two (shape canonicalization: remote compiles
    cost 30s-5min each, so executables must be REUSED across matrices)."""
    b = 1
    while b < n:
        b *= 2
    return b


def chunk_for_stream(s: RoutedStream) -> int:
    """Tiles per grid step: smaller chunks for heavy-layer streams keep
    the double-buffered stream window inside VMEM."""
    if s.lmax <= 8:
        return DEFAULT_TCHUNK
    if s.lmax <= 32:
        return 8
    return 4


def _chunk_terms(nch: int, max_terms: int = 4, cap: int = 0) -> list:
    """Binary decomposition of a chunk count into descending powers of two
    (each term = one kernel launch whose pow-2 grid executable is shared
    across matrices).  Capped at ``max_terms``: the remainder is rounded
    UP to one final pow-2 term (at most tchunk-1+2^k padded tiles, where
    a padded chunk costs about one launch).  ``cap`` bounds any single
    term (the per-segment scalar-prefetch win/byt/lt arrays live in the
    1 MiB SMEM — see pack_stream's smem cap); capped full segments repeat
    and don't count against max_terms."""
    terms = []
    rem = max(nch, 1)
    if cap:
        while rem > cap:
            terms.append(cap)
            rem -= cap
    nfull = len(terms)  # cap-sized terms don't count against max_terms
    while rem and len(terms) - nfull < max_terms - 1:
        k = 1 << (rem.bit_length() - 1)
        terms.append(k)
        rem -= k
    if rem:
        terms.append(_bucket(rem))
    return terms


def word_counts(l1p: int) -> tuple:
    """(lane words, sub words) the packed stream carries for ``l1p``
    pass-1 layers: 4 layers per lane word, 8 per sub word."""
    return -(-l1p // 4), -(-l1p // 8)


def stream_array_names(l1p: int) -> tuple:
    """Device-dict key names for one packed stream segment's data arrays,
    in ``pack_stream`` order (without the win/byt/lt prefetch tables)."""
    nlw, nsw = word_counts(l1p)
    return (
        ("vals",)
        + tuple(f"route{i + 1}" if i else "route" for i in range(nlw))
        + tuple(f"rsub{i + 1}" if i else "rsub" for i in range(nsw))
        + ("bl", "bs")
    )


def _segment_terms(nch: int, chunk_cost_ns: float, cap: int = 0) -> list:
    """Pick the pow-2 segmentation by modeled cost: the binary split
    minimizes padding but pays ~LAUNCH_NS per extra kernel, which
    dominates for small streams (the 20-60 us suite members); a single
    rounded-up pow-2 grid pays padded chunks instead.  Whichever is
    cheaper wins; both keep every grid a power of two for executable
    reuse.  ``cap`` bounds any single segment's chunk count (SMEM)."""
    from hispmv_tpu.plan.routed import LAUNCH_NS

    split = _chunk_terms(nch, cap=cap)
    single = [_bucket(max(nch, 1))]
    if cap and single[0] > cap:
        return split
    cost_split = LAUNCH_NS * len(split) \
        + chunk_cost_ns * (sum(split) - nch)
    cost_single = LAUNCH_NS + chunk_cost_ns * (single[0] - nch)
    return single if cost_single <= cost_split else split


def pack_stream(s: RoutedStream, tchunk: int = 0, bucket: bool = True):
    """Pad one compressed stream to whole chunks and split it into
    pow-2-grid SEGMENTS (``_chunk_terms``): every segment's kernel grid is
    a power of two — so differently-sized matrices share compiled
    executables — while padding stays under ~1 chunk (the unconditional
    kernel executes padded tiles at full cost, so rounding the whole
    stream up to a pow-2 grid would waste up to 2x).

    Returns a list of ((vals, *route_words, *rsub_words, bl, bs, win,
    byt, lt), dims) segments with dims (nch, tchunk, l1p, lp); the word
    counts follow from l1p (``word_counts``).  Layer dims are bucketed to
    powers of two (``bucket=False`` disables all bucketing and returns
    one exact-size segment)."""
    tchunk = tchunk or chunk_for_stream(s)
    T = s.num_tiles
    nch = max(-(-T // tchunk), 1)
    l1p = s.l1 if not bucket else _bucket(s.l1)
    lp = s.lmax if not bucket else _bucket(s.lmax)
    if bucket:
        from hispmv_tpu.plan.routed import (
            TILE_BASE_NS, TILE_BND_NS, TILE_L1_NS)

        chunk_cost = tchunk * (
            TILE_BASE_NS + TILE_L1_NS * (l1p - 1) + TILE_BND_NS * lp
        )
        # Per-segment scalar-prefetch arrays (flat win[T*l1p], byt[T*lp],
        # lt[T]) live in the 1 MiB SMEM; cap segment size so heavy-layer
        # streams (32/32 caps at 16k+ tiles) never exceed it (observed:
        # 1.16 MiB requested incl. register spill slots on the soc-Pokec
        # cells).  Each 1-D operand is padded to at least one ~512 B SMEM
        # row, so size the cap against row-padded totals: find the largest
        # pow-2 segment whose three padded arrays fit the budget.
        def _smem_bytes(seg_chunks):
            t = seg_chunks * tchunk
            return sum(
                max(t * d * 4, 512) for d in (l1p, lp, 1)
            )

        cap = 1
        while _smem_bytes(cap * 2) <= 600 * 1024:
            cap *= 2
        terms = _segment_terms(nch, chunk_cost, cap=cap)
    else:
        terms = [nch]
    nch = sum(terms)
    Tp = nch * tchunk
    npair = -(-lp // 2)
    nquad = -(-lp // 4)

    vals = np.zeros((Tp, 8, LANES), np.float32)
    vals[:T] = s.vals
    nlw, nsw = word_counts(l1p)
    route_ws = []
    for wi, src in zip(range(nlw), list(s.route_words) + [None] * 8):
        a = np.zeros((Tp, 8, LANES), np.int32)
        if src is not None:
            a[:T] = src
        route_ws.append(a)
    rsub_ws = []
    for wi, src in zip(range(nsw), list(s.rsub_words) + [None] * 4):
        a = np.zeros((Tp, 8, LANES), np.int32)
        if src is not None:
            a[:T] = src
        rsub_ws.append(a)
    bl = np.zeros((Tp, npair, 8, LANES), np.int32)
    bl[:T, : s.bl.shape[1]] = s.bl
    bs = np.zeros((Tp, nquad, 8, LANES), np.int32)
    bs[:T, : s.bs.shape[1]] = s.bs
    win = np.zeros((Tp, l1p), np.int32)
    win[:T, : s.win.shape[1]] = s.win
    byt = np.zeros((Tp, lp), np.int32)
    byt[:T, : s.byt.shape[1]] = s.byt
    lt = np.zeros(Tp, np.int32)  # padding tiles: 0 layers -> all skipped
    lt[:T] = s.lt

    full = [vals.reshape(nch, tchunk * 8, LANES)]
    full += [a.reshape(nch, tchunk * 8, LANES) for a in route_ws]
    full += [a.reshape(nch, tchunk * 8, LANES) for a in rsub_ws]
    full += [
        bl.reshape(nch, tchunk * npair * 8, LANES),
        bs.reshape(nch, tchunk * nquad * 8, LANES),
        # scalar-prefetch tables FLATTENED to 1-D: SMEM pads 2-D operands
        # per ROW (~512 B), so [T, 1] tables would cost T*512 B and blow
        # the 1 MiB SMEM budget at a few thousand tiles
        win.reshape(nch, tchunk * l1p),
        byt.reshape(nch, tchunk * lp),
        lt.reshape(nch, tchunk),
    ]
    segments = []
    off = 0
    for term in terms:
        seg = tuple(
            np.ascontiguousarray(a[off : off + term])
            if a.ndim == 3
            # prefetch tables go back to flat 1-D per segment
            else np.ascontiguousarray(a[off : off + term]).reshape(-1)
            for a in full
        )
        segments.append((seg, (term, tchunk, l1p, lp)))
        off += term
    return segments


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def _routed_kernel(
    win_ref,  # i32 [Tp*l1] scalar prefetch: x window per pass-1 layer
    byt_ref,  # i32 [Tp*lp] scalar prefetch: y tile per boundary layer
    lt_ref,  # i32 [Tp] actual layers/tile — kept in the prefetch layout
    # for diagnostics/serialization but UNUSED here (see phase C note)
    *refs,
    tchunk: int,
    l1: int,
    lmax: int,
):
    nlw, nsw = word_counts(l1)
    vals_ref = refs[0]
    route_refs = refs[1 : 1 + nlw]
    rsub_refs = refs[1 + nlw : 1 + nlw + nsw]
    bl_ref, bs_ref, x_ref, y_ref = refs[1 + nlw + nsw :]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    M = tchunk * 8
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (iota_l <= iota_c).astype(jnp.float32)
    iml = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    imc = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    bd_strict = (
        (imc < iml) & ((imc // 8) == (iml // 8))
    ).astype(jnp.float32)

    # ---- phase A: all products of the chunk (static unroll) -------------
    def products(j):
        rws = [r[0, j * 8 : (j + 1) * 8, :] for r in route_refs]
        sws = [r[0, j * 8 : (j + 1) * 8, :] for r in rsub_refs]
        vals = vals_ref[0, j * 8 : (j + 1) * 8, :]
        rank = _srl(rws[0], 28) & 15
        if l1 > 16:  # rank bit 4 lives in word 1 bit 28
            rank = rank | (_srl(rws[1], 24) & 16)
        xg = jnp.zeros((8, LANES), jnp.float32)
        for l in range(l1):
            w = win_ref[(i * tchunk + j) * l1 + l]
            win8 = x_ref[pl.ds(w * 8, 8), :]
            lane = _srl(rws[l // 4], 7 * (l % 4)) & 127
            sub = _srl(sws[l // 8], 3 * (l % 8)) & 7
            t1 = jnp.take_along_axis(win8, sub, axis=0)
            g = jnp.take_along_axis(t1, lane, axis=1)
            xg = jnp.where(rank == l, g, xg)
        return vals * xg

    pall = jnp.concatenate(
        [products(j) for j in range(tchunk)], axis=0
    )  # (M, 128)

    # ---- phase B: batched per-tile flat prefix (2 matmuls per CHUNK) ----
    incl = jax.lax.dot_general(
        pall, upper, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rowsum = incl[:, 127:128]
    carry = jax.lax.dot_general(
        bd_strict, rowsum, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pf_all = incl + carry  # (M, 128)

    # ---- phase C: boundary extraction + per-layer y accumulation --------
    # ALL lmax layers run unconditionally: layers beyond a tile's actual
    # count carry zero valid bits, so their ga/gb are exact zeros and the
    # y add is a no-op (on y tile 0).  Predicating each layer with
    # @pl.when(k < lt[t]) was measured (v5e, 2026-08-17 dissection) at
    # ~100 ns per EXECUTED layer vs ~9.4 ns unconditional — each branch
    # region serializes the VMEM read-modify-write pipeline.  The class
    # split (plan/routed.py) bounds the padding this trades for.
    # v3: no validity bits — padded/absent sides carry (sub, lane) = (0, 0)
    # and read the reserved zero slot (P'[0] == 0 by plan construction)
    for j in range(tchunk):
        pf = pf_all[j * 8 : (j + 1) * 8, :]
        for k in range(lmax):
            offp = (j * npair + k // 2) * 8
            raw = _srl(bl_ref[0, offp : offp + 8, :], 14 * (k % 2))
            offq = (j * nquad + k // 4) * 8
            q = _srl(bs_ref[0, offq : offq + 8, :], 8 * (k % 4))
            ga = jnp.take_along_axis(
                jnp.take_along_axis(pf, q & 7, axis=0),
                raw & 127, axis=1,
            )
            gb = jnp.take_along_axis(
                jnp.take_along_axis(pf, _srl(q, 4) & 7, axis=0),
                _srl(raw, 7) & 127, axis=1,
            )
            b = byt_ref[(i * tchunk + j) * lmax + k]
            prev = y_ref[pl.ds(b * 8, 8), :]
            y_ref[pl.ds(b * 8, 8), :] = prev + ga - gb


def spmv_routed_stream_pallas(
    packed,  # arrays from pack_stream (without the dims tuple)
    dims,  # (nch, tchunk, l1p, lp)
    x2d: jax.Array,  # f32 [nwin*8, 128]
    num_ytiles: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run one routed stream; returns y f32 [nyt*8, 128]."""
    nch, tchunk, l1, lmax = dims
    nlw, nsw = word_counts(l1)
    data = tuple(packed[: 1 + nlw + nsw + 2])
    win, byt, lt = packed[1 + nlw + nsw + 2 :]
    bl, bs = data[-2], data[-1]
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)

    def spec(rows):
        return pl.BlockSpec(
            (1, rows, LANES),
            lambda i, w, b, t: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    r1 = tchunk * 8
    in_specs = [spec(r1)] * (1 + nlw + nsw) + [
        spec(tchunk * npair * 8), spec(tchunk * nquad * 8),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (num_ytiles * 8, LANES),
            lambda i, w, b, t: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _routed_kernel, tchunk=tchunk, l1=l1, lmax=lmax,
    )
    nbytes = sum(int(a.size) * a.dtype.itemsize for a in data)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_ytiles * 8, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * data[0].size,
            bytes_accessed=nbytes + x2d.size * 4,
            transcendentals=0,
        ),
    )(win, byt, lt, *data, x2d)

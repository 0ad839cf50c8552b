"""Routed-stream Pallas kernel: per-nnz vectorized SpMV.

Executes plan/routed.py plans.  Per (8,128) tile of 1024 nnz slots (all
vector ops, zero per-nnz scalar work):

1. x gather: one sublane take_along_axis composed with one lane
   take_along_axis per pass-1 layer, from the tile's (8,128) x window;
2. products -> flattened prefix sum: lane prefix via an upper-triangular
   ones matmul (MXU) + sublane carry via a strict-lower (8,8) matmul;
3. per boundary layer, run sums P'[end] - P'[start-1] are pulled by two
   more composed gathers (validity in bit 7 of the lane word) and
   accumulated into the tile's (8,128) y slice.

x and y are VMEM-resident; the stream (values + routing arrays) is
consumed in big chunks by the Pallas grid pipeline, like the chunked
kernel.  This is the closest TPU analog of the reference's per-nnz
dataflow: the butterfly crossbar and out-of-order scheduler become
plan-time routing arrays (base_functions.cpp:356-436,
spmv-helper.cpp:429-515).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.routed import RoutedPlan

LANES = 128
DEFAULT_TCHUNK = 16  # tiles per grid step


def _bucket(n: int) -> int:
    """Round up to a power of two (shape canonicalization: remote compiles
    cost 30s-5min each, so executables must be REUSED across matrices)."""
    b = 1
    while b < n:
        b *= 2
    return b


def pack_routed(
    plan: RoutedPlan, tchunk: int = DEFAULT_TCHUNK, bucket: bool = True
):
    """Pad the tile stream to whole chunks and COMPRESS the routing into
    int32 bitfields (the stream is the cost: 12 B/slot for pass 1
    regardless of gather layers + 8 B/slot per boundary layer, vs 12*L1 +
    16*L uncompressed):

    - ``vals``  f32: the slot's value (one nonzero per slot — its gather
      layer is selected by the rank bits, not by separate value arrays);
    - ``route`` i32 per slot: lane_l << (7*l) for l < 4 | rank << 28;
    - ``rsub``  i32 per SOURCE lane: sub_l << (3*l) for l < 4;
    - ``bl``    i32 per out slot, per boundary layer:
                a_lane | a_valid<<7 | b_lane<<8 | b_valid<<15;
    - ``bs``    i32 per source lane, per layer: a_sub | b_sub<<4.

    With ``bucket`` (default), chunk and layer counts are rounded to
    powers of two so differently-sized matrices share one compiled kernel
    (padding is all-zero and contributes nothing).

    Returns (vals, route, rsub, bl, bs, win, byt, (nch, l1p, lp))."""
    T = plan.num_tiles
    nch = max(-(-T // tchunk), 1)
    L1, L = plan.l1, plan.lmax
    assert L1 <= 4, L1
    lp = L if not bucket else _bucket(L)
    # pass-1 layers ride in the bitfields; l1p only sets the kernel's
    # static unpack-loop count (bucketed for compile sharing)
    l1p = L1 if not bucket else _bucket(L1)
    if bucket:
        nch = _bucket(nch)
    Tp = nch * tchunk

    # pass-1 bitfields
    route = np.zeros((T, 8, LANES), np.int32)
    rsub = np.zeros((T, 8, LANES), np.int32)
    vals = np.zeros((T, 8, LANES), np.float32)
    for l in range(L1):
        sel = plan.vals[:, l] != 0.0
        vals = np.where(sel, plan.vals[:, l], vals)
        route |= np.where(sel, l << 28, 0).astype(np.int32)
        route |= (plan.lane1[:, l] << (7 * l)).astype(np.int32)
        rsub |= (plan.sub1[:, l] << (3 * l)).astype(np.int32)

    bl = (
        plan.blane.astype(np.int64)
        | (plan.blane_b.astype(np.int64) << 8)
    ).astype(np.int32)
    bs = (
        plan.bsub.astype(np.int64)
        | (plan.bsub_b.astype(np.int64) << 4)
    ).astype(np.int32)

    def padTL(a, lpad):
        out = np.zeros((Tp, lpad) + a.shape[2:], a.dtype)
        out[:T, : a.shape[1]] = a
        return out

    def padT(a):
        out = np.zeros((Tp,) + a.shape[1:], a.dtype)
        out[:T] = a
        return out

    vals = padT(vals).reshape(nch, tchunk * 8, LANES)
    route = padT(route).reshape(nch, tchunk * 8, LANES)
    rsub = padT(rsub).reshape(nch, tchunk * 8, LANES)
    bl = padTL(bl, lp).reshape(nch, tchunk * lp * 8, LANES)
    bs = padTL(bs, lp).reshape(nch, tchunk * lp * 8, LANES)
    win = padT(plan.win)
    byt = padT(plan.byt)
    return vals, route, rsub, bl, bs, win, byt, (nch, l1p, lp)


def _routed_kernel(
    win_ref,  # i32 [Tp] scalar prefetch: x window per tile
    byt_ref,  # i32 [Tp] scalar prefetch: y tile per tile
    vals_ref,  # f32 [1, tchunk*8, 128] slot values
    route_ref,  # i32 [1, tchunk*8, 128] packed lanes (7b x 4) | rank<<28
    rsub_ref,  # i32 [1, tchunk*8, 128] packed subs (3b x 4) by source lane
    bl_ref,  # i32 [1, tchunk*L*8, 128] a_lane|av<<7|b_lane<<8|bv<<15
    bs_ref,  # i32 [1, tchunk*L*8, 128] a_sub | b_sub<<4 by source lane
    x_ref,  # f32 [nwin*8, 128] resident
    y_ref,  # f32 [nyt*8, 128] resident accumulator output
    *,
    tchunk: int,
    l1: int,
    lmax: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    # constants (hoisted once per grid step; Mosaic iota is integer-only)
    M = tchunk * 8
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (iota_l <= iota_c).astype(jnp.float32)  # [l, j] = 1 if l <= j
    # block-diagonal strict-lower (M, M): carry sums stay WITHIN each
    # tile's 8 sublane rows
    iml = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    imc = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    bd_strict = (
        (imc < iml) & ((imc // 8) == (iml // 8))
    ).astype(jnp.float32)

    # ---- phase A: all products of the chunk (static unroll) -------------
    def products(j):
        w = win_ref[i * tchunk + j]
        win8 = x_ref[pl.ds(w * 8, 8), :]
        route = route_ref[0, j * 8 : (j + 1) * 8, :]
        rsub = rsub_ref[0, j * 8 : (j + 1) * 8, :]
        vals = vals_ref[0, j * 8 : (j + 1) * 8, :]
        rank = jax.lax.shift_right_logical(route, 28)
        xg = jnp.zeros((8, LANES), jnp.float32)
        for l in range(l1):
            lane = jax.lax.shift_right_logical(route, 7 * l) & 127
            sub = jax.lax.shift_right_logical(rsub, 3 * l) & 7
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
    rowsum = incl[:, 127:128]  # (M, 1)
    carry = jax.lax.dot_general(
        bd_strict, rowsum, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pf_all = incl + carry  # (M, 128)

    # ---- phase C: boundary extraction + y accumulation (static unroll) --
    for j in range(tchunk):
        pf = pf_all[j * 8 : (j + 1) * 8, :]
        b = byt_ref[i * tchunk + j]
        yacc = jnp.zeros((8, LANES), jnp.float32)
        for k in range(lmax):
            off = (j * lmax + k) * 8
            raw = bl_ref[0, off : off + 8, :]
            subs = bs_ref[0, off : off + 8, :]
            ga = jnp.take_along_axis(
                jnp.take_along_axis(pf, subs & 7, axis=0),
                raw & 127, axis=1,
            ) * (jax.lax.shift_right_logical(raw, 7) & 1).astype(
                jnp.float32
            )
            gb = jnp.take_along_axis(
                jnp.take_along_axis(
                    pf, jax.lax.shift_right_logical(subs, 4) & 7, axis=0
                ),
                jax.lax.shift_right_logical(raw, 8) & 127, axis=1,
            ) * (jax.lax.shift_right_logical(raw, 15) & 1).astype(
                jnp.float32
            )
            yacc = yacc + ga - gb
        prev = y_ref[pl.ds(b * 8, 8), :]
        y_ref[pl.ds(b * 8, 8), :] = prev + yacc


def spmv_routed_pallas(
    packed,  # arrays from pack_routed (minus the dims tuple)
    x2d: jax.Array,  # f32 [nwin*8, 128]
    num_ytiles: int,
    l1: int,
    lmax: int,
    tchunk: int = DEFAULT_TCHUNK,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the routed stream; returns y f32 [nyt*8, 128]."""
    vals, route, rsub, bl, bs, win, byt = packed
    nch = vals.shape[0]

    def spec(rows):
        return pl.BlockSpec(
            (1, rows, LANES),
            lambda i, w, b: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    r1 = tchunk * 8
    rL = tchunk * lmax * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nch,),
        in_specs=[
            spec(r1), spec(r1), spec(r1),
            spec(rL), spec(rL),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (num_ytiles * 8, LANES),
            lambda i, w, b: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _routed_kernel, tchunk=tchunk, l1=l1, lmax=lmax
    )
    nbytes = sum(int(a.size) * a.dtype.itemsize for a in
                 (vals, route, rsub, bl, bs))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_ytiles * 8, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * vals.size,
            bytes_accessed=nbytes + x2d.size * 4,
            transcendentals=0,
        ),
    )(win, byt, vals, route, rsub, bl, bs, x2d)

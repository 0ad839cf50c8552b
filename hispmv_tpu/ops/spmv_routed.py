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
    """Pad the tile stream to whole chunks; flatten per-tile arrays to
    2D-tileable layouts.  With ``bucket`` (default), the chunk count and
    layer counts are rounded to powers of two so differently-sized
    matrices share one compiled kernel: padding chunks/layers are all-zero
    (valid bits 0, vals 0) and contribute nothing.

    Returns device-ready numpy arrays + (nch, l1p, lp)."""
    T = plan.num_tiles
    nch = max(-(-T // tchunk), 1)
    L1, L = plan.l1, plan.lmax
    l1p, lp = (L1, L) if not bucket else (_bucket(L1), _bucket(L))
    if bucket:
        nch = _bucket(nch)
    Tp = nch * tchunk

    def padTL(a, lpad):
        out = np.zeros((Tp, lpad) + a.shape[2:], a.dtype)
        out[:T, : a.shape[1]] = a
        return out

    def padT(a):
        out = np.zeros((Tp,) + a.shape[1:], a.dtype)
        out[:T] = a
        return out

    vals = padTL(plan.vals, l1p).reshape(nch, tchunk * l1p * 8, LANES)
    lane1 = padTL(plan.lane1, l1p).reshape(nch, tchunk * l1p * 8, LANES)
    sub1 = padTL(plan.sub1, l1p).reshape(nch, tchunk * l1p * 8, LANES)
    bl_a = padTL(plan.blane, lp).reshape(nch, tchunk * lp * 8, LANES)
    bs_a = padTL(plan.bsub, lp).reshape(nch, tchunk * lp * 8, LANES)
    bl_b = padTL(plan.blane_b, lp).reshape(nch, tchunk * lp * 8, LANES)
    bs_b = padTL(plan.bsub_b, lp).reshape(nch, tchunk * lp * 8, LANES)
    win = padT(plan.win)
    byt = padT(plan.byt)
    return vals, lane1, sub1, bl_a, bs_a, bl_b, bs_b, win, byt, (nch, l1p, lp)


def _routed_kernel(
    win_ref,  # i32 [Tp] scalar prefetch: x window per tile
    byt_ref,  # i32 [Tp] scalar prefetch: y tile per tile
    vals_ref,  # f32 [1, tchunk*L1*8, 128]
    lane1_ref,  # i32 [1, tchunk*L1*8, 128]
    sub1_ref,  # i32 [1, tchunk*L1*8, 128]
    bla_ref,  # i32 [1, tchunk*L*8, 128]
    bsa_ref,  # i32 [1, tchunk*L*8, 128]
    blb_ref,  # i32 [1, tchunk*L*8, 128]
    bsb_ref,  # i32 [1, tchunk*L*8, 128]
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
        p = jnp.zeros((8, LANES), jnp.float32)
        for l in range(l1):
            off = (j * l1 + l) * 8
            sub = sub1_ref[0, off : off + 8, :]
            lane = lane1_ref[0, off : off + 8, :]
            t1 = jnp.take_along_axis(win8, sub, axis=0)
            xg = jnp.take_along_axis(t1, lane, axis=1)
            p = p + vals_ref[0, off : off + 8, :] * xg
        return p

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
            rawa = bla_ref[0, off : off + 8, :]
            suba = bsa_ref[0, off : off + 8, :]
            ga = jnp.take_along_axis(
                jnp.take_along_axis(pf, suba, axis=0), rawa & 127, axis=1
            ) * (rawa >> 7).astype(jnp.float32)
            rawb = blb_ref[0, off : off + 8, :]
            subb = bsb_ref[0, off : off + 8, :]
            gb = jnp.take_along_axis(
                jnp.take_along_axis(pf, subb, axis=0), rawb & 127, axis=1
            ) * (rawb >> 7).astype(jnp.float32)
            yacc = yacc + ga - gb
        prev = y_ref[pl.ds(b * 8, 8), :]
        y_ref[pl.ds(b * 8, 8), :] = prev + yacc


def spmv_routed_pallas(
    packed,  # output of pack_routed (numpy or jax arrays) minus nch
    x2d: jax.Array,  # f32 [nwin*8, 128]
    num_ytiles: int,
    l1: int,
    lmax: int,
    tchunk: int = DEFAULT_TCHUNK,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the routed stream; returns y f32 [nyt*8, 128]."""
    vals, lane1, sub1, bla, bsa, blb, bsb, win, byt = packed
    nch = vals.shape[0]

    def spec(rows):
        return pl.BlockSpec(
            (1, rows, LANES),
            lambda i, w, b: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    r1 = tchunk * l1 * 8
    rL = tchunk * lmax * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nch,),
        in_specs=[
            spec(r1), spec(r1), spec(r1),
            spec(rL), spec(rL), spec(rL), spec(rL),
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
                 (vals, lane1, sub1, bla, bsa, blb, bsb))
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
    )(win, byt, vals, lane1, sub1, bla, bsa, blb, bsb, x2d)

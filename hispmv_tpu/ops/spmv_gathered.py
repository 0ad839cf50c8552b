"""Pallas executors for gathered-stream plans (plan/gathered.py).

Three pieces:

1. ``s1_gather_pallas`` — the within-x-window 2-level layered gather
   (stage S1).  The grid walks all panels' windows; the x block index
   map is ``i % (K // tchunk)`` so every panel re-reads the same
   VMEM-resident x windows.
2. ``permute_stage_pallas`` (ops/permute.py, reused) — stages S2/S3.
3. ``spmv_gathered_tiles_pallas`` — the tile kernel: products =
   vals * xg (slot-aligned), one flat prefix (Precision.HIGHEST — the
   class's short rows make prefix-difference cancellation worst-case,
   see _flat_prefix_highest), run sums as the difference of two Clos
   permutes of the prefix, trash cell (0,0) masked, ONE y
   read-modify-write per tile.

The full gather (S1 -> T -> S2 -> T -> S3) is assembled in
``gathered_gather_apply``: XLA does the two transposes (near memory
speed); panel output slices are concatenated (static shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.ops.spmv_routed import _flat_prefix_highest
from hispmv_tpu.plan.gathered import S1_CAP, GatheredPlan

LANES = 128
WINDOW = 1024


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


# ---------------------------------------------------------------------------
# S1: within-x-window layered gather
# ---------------------------------------------------------------------------


def _s1_kernel(w_ref, x_ref, out_ref, *, tchunk: int):
    for j in range(tchunk):
        sl = slice(j * 8, (j + 1) * 8)
        wd = w_ref[0, sl, :]
        win8 = x_ref[0, sl, :]
        lane = wd & 127
        rank = _srl(wd, 7) & 3
        res = jnp.zeros((8, LANES), jnp.float32)
        for l in range(S1_CAP):
            sub_cell = _srl(wd, 16 + 3 * l) & 7
            g = jnp.take_along_axis(
                jnp.take_along_axis(win8, sub_cell, axis=0),
                lane, axis=1,
            )
            res = jnp.where(rank == l, g, res) if S1_CAP > 1 else g
        out_ref[0, sl, :] = res


def s1_gather_pallas(
    s1_words: jax.Array,  # i32 [P*K*8, 128]
    x2d: jax.Array,  # f32 [K*8, 128]
    P: int,
    K: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns a f32 [P*K*8, 128]: panel p's window w gathered from x
    window w by words[p*K + w]."""
    tchunk = min(K, 16)
    nch = (P * K) // tchunk
    kmod = K // tchunk

    def spec_w():
        return pl.BlockSpec(
            (1, tchunk * 8, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def spec_x():
        return pl.BlockSpec(
            (1, tchunk * 8, LANES), lambda i: (i % kmod, 0, 0),
            memory_space=pltpu.VMEM,
        )

    w3 = s1_words.reshape(nch, tchunk * 8, LANES)
    x3 = x2d.reshape(kmod, tchunk * 8, LANES)
    out = pl.pallas_call(
        functools.partial(_s1_kernel, tchunk=tchunk),
        grid=(nch,),
        in_specs=[spec_w(), spec_x()],
        out_specs=spec_w(),
        out_shape=jax.ShapeDtypeStruct(
            (nch, tchunk * 8, LANES), jnp.float32
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=int(s1_words.size) * 8 + int(x2d.size) * 4,
            transcendentals=0,
        ),
    )(w3, x3)
    return out.reshape(P * K * 8, LANES)


def gathered_gather_apply(
    d: dict,
    meta: dict,
    prefix: str,
    x2d: jax.Array,  # f32 [K*8, 128] (the routed executor's padded x)
    *,
    interpret: bool = False,
) -> jax.Array:
    """Full 3-stage gather: returns xg f32 [T*8, 128] in tile-slot
    order."""
    from hispmv_tpu.ops.permute import permute_stage_pallas

    K = meta["K"]
    P = meta["P"]
    panel_tiles = meta["panel_tiles"]
    T = sum(panel_tiles)
    a = s1_gather_pallas(
        d[prefix + "s1"], x2d, P, K, interpret=interpret
    )
    # transpose (P, K, 1024) -> (P, 1024, K) -> grouped (P*K, 1024)
    at = a.reshape(P, K, WINDOW).transpose(0, 2, 1).reshape(
        P * K * 8, LANES)
    tc2 = min(K, 16)
    b = permute_stage_pallas(
        [d[prefix + "s2"].reshape(P * K // tc2, tc2 * 8, LANES)],
        (P * K // tc2, tc2),
        at, interpret=interpret,
    )
    # ungroup + transpose back; slice each panel's real windows
    bt = b.reshape(P, WINDOW, K).transpose(0, 2, 1)
    parts = [bt[p, :pw] for p, pw in enumerate(panel_tiles)]
    bt2 = (
        jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    ).reshape(T * 8, LANES)
    nch3, tc3 = meta["nch3"], meta["tc3"]
    need = nch3 * tc3 * 8
    if bt2.shape[0] < need:
        bt2 = jnp.pad(bt2, ((0, need - bt2.shape[0]), (0, 0)))
    xg = permute_stage_pallas(
        [d[prefix + "s3"].reshape(nch3, tc3 * 8, LANES)],
        (nch3, tc3), bt2, interpret=interpret,
    )
    return xg[: T * 8]


# ---------------------------------------------------------------------------
# Tile kernel
# ---------------------------------------------------------------------------


def _clos(route, a):
    """One 13-bit Clos route applied to (8,128)."""
    subA = route & 7
    laneB = _srl(route, 3) & 127
    subC = _srl(route, 10) & 7
    t1 = jnp.take_along_axis(a, subA, axis=0)
    t2 = jnp.take_along_axis(t1, laneB, axis=1)
    return jnp.take_along_axis(t2, subC, axis=0)


def _gathered_kernel(
    byt_ref,  # i32 [Tp] scalar prefetch
    *refs,
    tchunk: int,
):
    vals_ref, word_ref, xg_ref, y_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    M = tchunk * 8
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (iota_l <= iota_c).astype(jnp.float32)
    iml = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    imc = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    bd_strict = (
        (imc < iml) & ((imc // 8) == (iml // 8))
    ).astype(jnp.float32)
    # trash-cell mask: (0,0) of each tile absorbs the dual-permute
    # imbalance (-total) and must not reach y
    i8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    mask = 1.0 - ((i8 == 0) & (j8 == 0)).astype(jnp.float32)

    pall = vals_ref[0] * xg_ref[0]  # (M, 128)
    pf_all = _flat_prefix_highest(pall, upper, bd_strict)

    for j in range(tchunk):
        pf = pf_all[j * 8: (j + 1) * 8, :]
        wd = word_ref[0, j * 8: (j + 1) * 8, :]
        out = (_clos(wd & 0x1FFF, pf)
               - _clos(_srl(wd, 13) & 0x1FFF, pf)) * mask
        b = byt_ref[i * tchunk + j]
        prev = y_ref[pl.ds(b * 8, 8), :]
        y_ref[pl.ds(b * 8, 8), :] = prev + out


def pack_gathered(plan: GatheredPlan, tchunk: int = 32):
    """Device arrays + static meta for one gathered plan.  Tile streams
    are padded to a pow-2 chunk count (executable reuse); stage arrays
    keep their exact sizes (their chunking is pow-2 by K already)."""
    T = plan.num_tiles
    nch = _bucket(max(-(-T // tchunk), 1))
    Tp = nch * tchunk
    vals = np.zeros((Tp, 8, LANES), np.float32)
    vals[:T] = plan.vals
    word = np.zeros((Tp, 8, LANES), np.int32)
    word[:T] = plan.word
    # padding tiles: identity routes (route 0 gathers slot (0,0) both
    # ways: diff 0) and byt 0 -- they add exact zeros to y tile 0
    byt = np.zeros(Tp, np.int32)
    byt[:T] = plan.byt
    K = plan.num_windows
    P = plan.num_panels
    tc3 = min(max(T, 1), 16)
    # S3 operates on T windows; pad to whole chunks
    nch3 = max(-(-T // tc3), 1)
    s3 = np.zeros((nch3 * tc3, 8, LANES), np.int32)
    s3[:T] = plan.s3
    arrays = {
        "vals": vals.reshape(nch, tchunk * 8, LANES),
        "word": word.reshape(nch, tchunk * 8, LANES),
        "byt": byt,
        "s1": plan.s1.reshape(P * K * 8, LANES),
        "s2": plan.s2.reshape(P * K * 8, LANES),
        "s3": s3.reshape(nch3 * tc3 * 8, LANES),
    }
    meta = {
        "K": K,
        "P": P,
        "panel_tiles": tuple(plan.panel_tiles),
        "T": T,
        "nch": nch,
        "tchunk": tchunk,
        "nch3": nch3,
        "tc3": tc3,
    }
    return arrays, meta


def spmv_gathered_tiles_pallas(
    vals3: jax.Array,  # f32 [nch, tchunk*8, 128]
    word3: jax.Array,  # i32 [nch, tchunk*8, 128]
    byt: jax.Array,  # i32 [Tp]
    xg: jax.Array,  # f32 [T*8, 128] from gathered_gather_apply
    num_ytiles: int,
    nch: int,
    tchunk: int,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the gathered tile kernel; returns y f32 [nyt*8, 128]."""
    Tp = nch * tchunk
    need = Tp * 8
    if xg.shape[0] < need:
        xg = jnp.pad(xg, ((0, need - xg.shape[0]), (0, 0)))
    xg3 = xg.reshape(nch, tchunk * 8, LANES)
    nytp = _bucket(max(num_ytiles, 1))

    def spec():
        return pl.BlockSpec(
            (1, tchunk * 8, LANES), lambda i, b: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[spec(), spec(), spec()],
        out_specs=pl.BlockSpec(
            (nytp * 8, LANES), lambda i, b: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_gathered_kernel, tchunk=tchunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nytp * 8, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * 1024,
            bytes_accessed=int(vals3.size + word3.size + xg.size) * 4,
            transcendentals=0,
        ),
    )(byt, vals3, word3, xg3)
    return out[: num_ytiles * 8]

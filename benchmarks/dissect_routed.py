#!/usr/bin/env python
"""Dissect the routed kernel's per-tile cost into DMA vs compute phases.

The v4 calibration says ~53 ns/tile base.  A tile's stream is 5 i32
(8,128) words = 20 KiB; at v5e HBM ~819 GB/s that is ~24 ns of DMA.  If
the Pallas grid pipeline overlaps DMA with compute, the per-tile time
should be max(DMA, compute) — if it is their SUM, the pipeline is
broken and the fix differs.  This bench times, per (W, l1, lmax) point:

  a. nwords sweep: a trivial kernel (sum all stream refs into y) with
     k = 1..5 stream words — the pure DMA floor and its slope (B/ns);
  b. phase sweep of the real kernel: products-only, products+prefix,
     full — attributing compute ns to each phase;
  c. the real kernel at several tchunk values.

Run: python benchmarks/dissect_routed.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# a. pure-DMA floor: k words per tile, trivial compute
# ---------------------------------------------------------------------------


def _dma_kernel(*refs, nwords, tchunk):
    y_ref = refs[-1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    acc = jnp.zeros((8, LANES), jnp.float32)
    for w in range(nwords):
        r = refs[w]
        for j in range(tchunk):
            acc = acc + r[0, j * 8:(j + 1) * 8, :].astype(jnp.float32)
    y_ref[0:8, :] = y_ref[0:8, :] + acc


def time_dma(nwords, T=4096, tchunk=32):
    from hispmv_tpu.utils.timing import measure_loop_time

    nch = T // tchunk
    arrs = tuple(
        jnp.asarray(
            np.random.default_rng(w).integers(
                0, 100, (nch, tchunk * 8, LANES)
            ).astype(np.int32)
        )
        for w in range(nwords)
    )

    def spec():
        return pl.BlockSpec(
            (1, tchunk * 8, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    fn = pl.pallas_call(
        functools.partial(_dma_kernel, nwords=nwords, tchunk=tchunk),
        grid=(nch,),
        in_specs=[spec() for _ in range(nwords)],
        out_specs=pl.BlockSpec(
            (64 * 8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((64 * 8, LANES), jnp.float32),
    )
    jf = jax.jit(lambda a: fn(*a))

    def step(c):
        a, acc = c
        y = jf(a)
        dep = y.ravel()[:1] * 1e-30
        a = tuple(x + dep[0].astype(x.dtype) for x in a[:1]) + a[1:]
        return (a, acc + dep[0])

    t = measure_loop_time(step, (arrs, jnp.zeros((), jnp.float32)))
    return t / T


# ---------------------------------------------------------------------------
# b. phase sweep of the real kernel
# ---------------------------------------------------------------------------


def _phase_kernel(
    base_ref, byt_ref, lt_ref, *refs, tchunk, W, l1, lmax, phase,
    prefix_mode="highest",
):
    """phase: 1 = products only, 2 = + prefix, 3 = full."""
    vals_ref, slot_ref, gsub_ref, bl_ref, bs_ref, x_ref, y_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _zero():
        y_ref[...] = jnp.zeros_like(y_ref)

    M = tchunk * 8
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)
    srl = jax.lax.shift_right_logical
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    upper = (iota_l <= iota_c).astype(jnp.float32)
    iml = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    imc = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    bd_strict = ((imc < iml) & ((imc // 8) == (iml // 8))).astype(
        jnp.float32
    )

    def products(j):
        slot = slot_ref[0, j * 8:(j + 1) * 8, :]
        gsub = gsub_ref[0, j * 8:(j + 1) * 8, :]
        vals = vals_ref[0, j * 8:(j + 1) * 8, :]
        lane = slot & 127
        rank = srl(slot, 7) & 7
        base = base_ref[i * tchunk + j]
        xg = jnp.zeros((8, LANES), jnp.float32)
        for l in range(l1):
            gs = (srl(gsub, 9 * l) if l < 3
                  else srl(slot, 10 + 9 * (l - 3))) & 511
            sub = gs & 7
            vid = srl(gs, 3)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for v in range(W):
                win8 = x_ref[pl.ds((base + v) * 8, 8), :]
                g = jnp.take_along_axis(win8, sub, axis=0)
                acc = jnp.where(vid == v, g, acc) if W > 1 else g
            g = jnp.take_along_axis(acc, lane, axis=1)
            xg = g if l1 == 1 else jnp.where(rank == l, g, xg)
        return vals * xg

    pall = jnp.concatenate([products(j) for j in range(tchunk)], axis=0)
    # keep bl/bs DMA live in every phase so only COMPUTE differs
    touch = (
        bl_ref[0, 0:8, :].astype(jnp.float32)
        + bs_ref[0, 0:8, :].astype(jnp.float32)
    ) * 1e-30
    if phase == 1:
        y_ref[0:8, :] = (
            y_ref[0:8, :]
            + pall[0:8, :] + touch
        )
        return
    if prefix_mode == "bf16x2":
        # hi/lo bf16 split: the triangular masks are EXACT in bf16, so
        # the only error is the bf16-pair truncation of the products
        # (~2^-17 relative) — two DEFAULT-precision MXU passes instead
        # of HIGHEST's six.
        hi = pall.astype(jnp.bfloat16)
        lo = (pall - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ub = upper.astype(jnp.bfloat16)
        incl = (
            jax.lax.dot_general(
                hi, ub, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                lo, ub, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    else:
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
    pf_all = incl + carry
    if phase == 2:
        y_ref[0:8, :] = y_ref[0:8, :] + pf_all[0:8, :] + touch
        return
    for j in range(tchunk):
        pf = pf_all[j * 8:(j + 1) * 8, :]
        for k in range(lmax):
            offp = (j * npair + k // 2) * 8
            raw = srl(bl_ref[0, offp:offp + 8, :], 14 * (k % 2))
            offq = (j * nquad + k // 4) * 8
            q = srl(bs_ref[0, offq:offq + 8, :], 8 * (k % 4))
            ga = jnp.take_along_axis(
                jnp.take_along_axis(pf, q & 7, axis=0), raw & 127, axis=1
            )
            gb = jnp.take_along_axis(
                jnp.take_along_axis(pf, srl(q, 4) & 7, axis=0),
                srl(raw, 7) & 127, axis=1,
            )
            b = byt_ref[(i * tchunk + j) * lmax + k]
            prev = y_ref[pl.ds(b * 8, 8), :]
            y_ref[pl.ds(b * 8, 8), :] = prev + ga - gb


def synth_packed(T, W, l1, lmax, nwin, nyt, tchunk, rng):
    nch = -(-T // tchunk)
    Tp = nch * tchunk
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)
    vals = rng.standard_normal((Tp, 8, LANES)).astype(np.float32)
    lane = rng.integers(0, LANES, (Tp, 8, LANES))
    rank = rng.integers(0, l1, (Tp, 8, LANES))
    slot = (lane | (rank << 7)).astype(np.int64)
    for l in range(3, l1):
        slot |= rng.integers(0, W * 8, (Tp, 8, LANES)).astype(
            np.int64) << (10 + 9 * (l - 3))
    slot = slot.astype(np.int32)
    gsub = np.zeros((Tp, 8, LANES), np.int64)
    for l in range(min(l1, 3)):
        gsub |= rng.integers(0, W * 8, (Tp, 8, LANES)).astype(
            np.int64) << (9 * l)
    gsub = gsub.astype(np.int32)
    bl = rng.integers(0, 1 << 28, (Tp, npair, 8, LANES)).astype(np.int32)
    bs = rng.integers(0, 1 << 30, (Tp, nquad, 8, LANES)).astype(np.int32)
    base = rng.integers(0, max(nwin - W, 1), Tp).astype(np.int32)
    byt = rng.integers(0, nyt, (Tp, lmax)).astype(np.int32)
    lt = np.full(Tp, lmax, np.int32)
    return (
        vals.reshape(nch, tchunk * 8, LANES),
        slot.reshape(nch, tchunk * 8, LANES),
        gsub.reshape(nch, tchunk * 8, LANES),
        bl.reshape(nch, tchunk * npair * 8, LANES),
        bs.reshape(nch, tchunk * nquad * 8, LANES),
        base.reshape(-1),
        byt.reshape(-1),
        lt.reshape(-1),
    ), (nch, tchunk, W, l1, lmax)


def time_phase(packed, dims, nwin, nyt, phase, prefix_mode="highest"):
    from hispmv_tpu.utils.timing import measure_loop_time

    nch, tchunk, W, l1, lmax = dims
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal(
            (nwin * 8, LANES)).astype(np.float32))
    arrs = tuple(jnp.asarray(a) for a in packed)

    def spec(rows):
        return pl.BlockSpec(
            (1, rows, LANES), lambda i, b, t, lt_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nch,),
        in_specs=[
            spec(tchunk * 8), spec(tchunk * 8), spec(tchunk * 8),
            spec(tchunk * npair * 8), spec(tchunk * nquad * 8),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nyt * 8, LANES), lambda i, b, t, lt_: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    fn = pl.pallas_call(
        functools.partial(
            _phase_kernel, tchunk=tchunk, W=W, l1=l1, lmax=lmax,
            phase=phase, prefix_mode=prefix_mode,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nyt * 8, LANES), jnp.float32),
    )
    jf = jax.jit(
        lambda a, xx: fn(a[5], a[6], a[7], a[0], a[1], a[2], a[3], a[4],
                         xx))

    def step(c):
        xx, acc = c
        y = jf(arrs, xx)
        dep = y.ravel()[:1] * 1e-30
        return (xx + dep[0], acc + dep[0])

    t = measure_loop_time(step, (x, jnp.zeros((), jnp.float32)))
    return t / (nch * tchunk)


def main():
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    rng = np.random.default_rng(0)
    nwin, nyt = 64, 64

    log("== a. pure-DMA floor (trivial compute, k words x 4 KiB/tile) ==")
    ts = {}
    for k in (1, 2, 3, 5):
        ts[k] = time_dma(k) * 1e9
        log(f"  {k} words: {ts[k]:6.1f} ns/tile")
    slope = (ts[5] - ts[1]) / 4
    log(f"  slope {slope:.2f} ns/word -> {4096/max(slope,0.01):.0f} B/ns")

    log("== b. phase sweep (T=4096) ==")
    for (W, l1, lmax, tch) in [
        (1, 1, 1, 32), (4, 1, 1, 32), (4, 2, 1, 32),
        (16, 2, 2, 32), (4, 2, 4, 16), (16, 3, 8, 16),
        (2, 4, 1, 32), (2, 5, 1, 32), (2, 5, 2, 32), (2, 5, 4, 32),
    ]:
        packed, dims = synth_packed(4096, W, l1, lmax, nwin, nyt, tch, rng)
        row = []
        for phase in (1, 2, 3):
            row.append(time_phase(packed, dims, nwin, nyt, phase) * 1e9)
        log(f"  W={W:2d} l1={l1} lmax={lmax:2d} tch={tch}: "
            f"prod={row[0]:5.1f} +prefix={row[1]:5.1f} "
            f"full={row[2]:5.1f} ns/tile "
            f"(prefix {row[1]-row[0]:4.1f}, bnd {row[2]-row[1]:4.1f})")

    log("== c. prefix mode (full kernel) ==")
    for (W, l1, lmax, tch) in [(2, 5, 1, 32), (4, 2, 1, 32), (2, 5, 4, 32),
                               (2, 5, 2, 32), (4, 1, 1, 32)]:
        packed, dims = synth_packed(4096, W, l1, lmax, nwin, nyt, tch, rng)
        for mode in ("highest", "bf16x2"):
            t = time_phase(packed, dims, nwin, nyt, 3, prefix_mode=mode) * 1e9
            log(f"  W={W} l1={l1} lmax={lmax} {mode:8s}: "
                f"{t:6.1f} ns/tile")


if __name__ == "__main__":
    main()

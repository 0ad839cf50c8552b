#!/usr/bin/env python
"""Calibrate the v5 routed kernel's per-tile cost constants on chip.

Builds synthetic RoutedStream objects over a controlled (W, l1, lmax)
grid, times spmv_routed_stream_pallas (through the real pack_stream, so
the lmax=1 merged-boundary-word path is exercised) with the loop-slope
method, and fits the linear model

    ns/tile = BASE + W_NS*(W-1) + OV_NS*(l1-1) + BND_NS*lmax

whose constants live in plan/routed.py (TILE_BASE_NS etc.).

Run: python benchmarks/microbench_slab.py
"""
import os
import time
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def synth_stream(T, W, l1, lmax, nwin, nyt, rng):
    from hispmv_tpu.plan.routed import RoutedStream

    vals = rng.standard_normal((T, 8, LANES)).astype(np.float32)
    lane = rng.integers(0, LANES, (T, 8, LANES))
    rank = rng.integers(0, l1, (T, 8, LANES))
    slot = (lane | (rank << 7)).astype(np.int64)
    for l in range(3, l1):
        slot |= rng.integers(0, W * 8, (T, 8, LANES)).astype(
            np.int64) << (10 + 9 * (l - 3))
    slot = slot.astype(np.int32)
    gsub = np.zeros((T, 8, LANES), np.int64)
    for l in range(min(l1, 3)):
        gsub |= rng.integers(0, W * 8, (T, 8, LANES)).astype(
            np.int64) << (9 * l)
    gsub = gsub.astype(np.int32)
    npair = -(-lmax // 2)
    nquad = -(-lmax // 4)
    bl = rng.integers(0, 1 << 28, (T, npair, 8, LANES)).astype(np.int32)
    bs = rng.integers(0, 1 << 30, (T, nquad, 8, LANES)).astype(np.int32)
    base = rng.integers(0, max(nwin - W, 1), T).astype(np.int32)
    byt = rng.integers(0, nyt, (T, lmax)).astype(np.int32)
    lt = np.full(T, lmax, np.int32)
    return RoutedStream(
        num_tiles=T, wmax=W, l1=l1, lmax=lmax, vals=vals, slot=slot,
        gsub=gsub, bl=bl, bs=bs, base=base, byt=byt, lt=lt,
    )


def time_stream(s, nwin, nyt, rng, tchunk=0):
    from hispmv_tpu.ops.spmv_routed import (
        pack_stream, spmv_routed_stream_pallas)
    from hispmv_tpu.utils.timing import measure_loop_time

    segs = pack_stream(s, tchunk=tchunk, bucket=False)
    assert len(segs) == 1
    packed, dims = segs[0]
    packed = tuple(jnp.asarray(a) for a in packed)
    x = rng.standard_normal((nwin * 8, LANES)).astype(np.float32)

    def fn(p, xx):
        return spmv_routed_stream_pallas(p, dims, xx, nyt)

    jf = jax.jit(fn)
    xj = jnp.asarray(x)

    def step(c):
        xx, acc = c
        y = jf(packed, xx)
        dep = y.ravel()[:1] * 1e-30
        return (xx + dep[0], acc + dep[0])

    t = measure_loop_time(step, (xj, jnp.zeros((), jnp.float32)))
    return t / s.num_tiles


def main():
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    rng = np.random.default_rng(0)
    nwin, nyt = 64, 64
    T = 4096
    grid = []
    print("   W  l1 lmax tchunk ns/tile", flush=True)
    for (W, l1, lmax, tch) in [
        (1, 1, 1, 32), (4, 1, 1, 32), (16, 1, 1, 32), (64, 1, 1, 32),
        (2, 2, 1, 32), (2, 4, 1, 32), (2, 5, 1, 32),
        (4, 2, 1, 32), (8, 3, 1, 32),
        (2, 5, 2, 32), (2, 5, 4, 32), (4, 2, 2, 32),
        (1, 1, 4, 32), (1, 1, 8, 16),
        (16, 2, 4, 16), (4, 3, 8, 16),
        (1, 1, 16, 8), (16, 2, 16, 8), (32, 4, 32, 8),
    ]:
        s = synth_stream(T, W, l1, lmax, nwin, nyt, rng)
        t = None
        for attempt in range(3):  # relay compiles fail transiently
            try:
                t = time_stream(s, nwin, nyt, rng, tchunk=tch) * 1e9
                break
            except Exception as e:
                print(f"  retry {W},{l1},{lmax}: {e!r}"[:120], flush=True)
                time.sleep(5)
        if t is None:
            continue
        grid.append((W, l1, lmax, t))
        print(f"{W:4d} {l1:3d} {lmax:4d} {tch:6d} {t:8.1f}", flush=True)
    # least squares fit
    A = np.array([[1.0, W - 1, l1 - 1, lm] for (W, l1, lm, _) in grid])
    b = np.array([t for (_, _, _, t) in grid])
    c, *_ = np.linalg.lstsq(A, b, rcond=None)
    print(f"fit: BASE={c[0]:.1f} W_NS={c[1]:.2f} OV_NS={c[2]:.2f} "
          f"BND_NS={c[3]:.2f}", flush=True)


if __name__ == "__main__":
    main()

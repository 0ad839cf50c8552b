#!/usr/bin/env python
"""Calibrate the gathered-stream executor's cost constants on chip.

Builds gathered plans from synthetic scattered matrices, then loop-slope
times (a) the tile kernel alone on precomputed xg and (b) the full
gather+tiles pipeline; fits

    tile kernel:  GATH_TILE_NS per tile
    gather:       GATH_STAGE_NS per stage window (2*P*K + T windows,
                  incl. the transpose share)

whose values live in plan/gathered.py.

Run: python benchmarks/microbench_gathered.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, carry):
    from hispmv_tpu.utils.timing import measure_loop_time

    for attempt in range(3):
        try:
            return measure_loop_time(step, carry)
        except Exception as e:
            print(f"  retry: {e!r}"[:110], flush=True)
            time.sleep(5)
    return float("nan")


def main():
    from hispmv_tpu.plan.gathered import build_gathered_plan
    from hispmv_tpu.ops.spmv_gathered import (
        gathered_gather_apply,
        pack_gathered,
        spmv_gathered_tiles_pallas,
    )
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    rng = np.random.default_rng(0)
    rows_fit = []
    for (R, C, n) in [
        (1 << 18, 1 << 18, 2_000_000),  # K=256, ~2000 tiles
        (1 << 16, 1 << 16, 1_000_000),  # K=64
        (1 << 19, 1 << 19, 4_000_000),  # K=512
    ]:
        K = C // 1024
        r = rng.integers(0, R, n)
        c = rng.integers(0, C, n)
        k = np.unique(r.astype(np.int64) * C + c)
        r, c = k // C, k % C
        v = rng.standard_normal(len(r)).astype(np.float32)
        plan, sr, sc, sv = build_gathered_plan(r, c, v, (R, C), K)
        T, P = plan.num_tiles, plan.num_panels
        arrays, meta = pack_gathered(plan)
        d = {k2: jnp.asarray(a) for k2, a in arrays.items()}
        x = rng.standard_normal(C).astype(np.float32)
        xp = np.zeros(K * 1024, np.float32)
        xp[:C] = x
        x2d = jnp.asarray(xp.reshape(-1, 128))
        nyt = plan.num_ytiles
        nch, tchunk = meta["nch"], meta["tchunk"]

        # (a) tile kernel alone (xg precomputed once)
        xg0 = gathered_gather_apply(d, meta, "", x2d)

        def fn_tiles(dd, xgv):
            return spmv_gathered_tiles_pallas(
                dd["vals"], dd["word"], dd["byt"], xgv, nyt, nch, tchunk
            )

        jt = jax.jit(fn_tiles)

        def step_t(cc):
            xgv, dd, acc = cc
            y = jt(dd, xgv)
            dep = y.ravel()[:1] * 1e-30
            return (xgv + dep[0], dd, acc + dep[0])

        t_tiles = timed(step_t, (xg0, d, jnp.zeros((), jnp.float32)))

        # (b) full pipeline
        def fn_full(dd, xx):
            xg = gathered_gather_apply(dd, meta, "", xx)
            return spmv_gathered_tiles_pallas(
                dd["vals"], dd["word"], dd["byt"], xg, nyt, nch, tchunk
            )

        jf = jax.jit(fn_full)

        def step_f(cc):
            xx, dd, acc = cc
            y = jf(dd, xx)
            dep = y.ravel()[:1] * 1e-30
            return (xx + dep[0], dd, acc + dep[0])

        t_full = timed(step_f, (x2d, d, jnp.zeros((), jnp.float32)))

        nwin_stages = 2 * P * K + T
        tile_ns = t_tiles * 1e9 / max(T, 1)
        stage_ns = (t_full - t_tiles) * 1e9 / max(nwin_stages, 1)
        print(
            f"K={K:4d} T={T:5d} P={P:3d}: tiles={t_tiles*1e6:8.1f}us "
            f"({tile_ns:6.1f} ns/tile)  full={t_full*1e6:8.1f}us "
            f"(stage {stage_ns:5.1f} ns/win over {nwin_stages} wins)",
            flush=True,
        )
        rows_fit.append((T, nwin_stages, t_tiles, t_full))

    ts = np.array([[T, 1.0] for (T, _, _, _) in rows_fit])
    bs = np.array([t * 1e9 for (_, _, t, _) in rows_fit])
    ct, *_ = np.linalg.lstsq(ts, bs, rcond=None)
    gs = np.array(
        [[w, 1.0] for (_, w, _, _) in rows_fit]
    )
    bg = np.array([(f - t) * 1e9 for (_, _, t, f) in rows_fit])
    cg, *_ = np.linalg.lstsq(gs, bg, rcond=None)
    print(
        f"fit: GATH_TILE_NS={ct[0]:.1f} (launchish {ct[1]/1e3:.1f}us)  "
        f"GATH_STAGE_NS={cg[0]:.2f} (fixed {cg[1]/1e3:.1f}us)",
        flush=True,
    )


if __name__ == "__main__":
    main()

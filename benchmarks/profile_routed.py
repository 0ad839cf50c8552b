#!/usr/bin/env python
"""Decompose a routed-format suite matrix's matvec time on the real chip.

For a suite matrix whose tuned plan is routed, reports:
- plan shape: streams x (tiles, l1, lmax, segments), residual size,
  permute stages, modeled ns per component;
- measured ns per component (loop-slope): each stream segment alone,
  residual alone, permute sandwich alone, full runner;
so the gap between model and machine is attributable line by line.

Usage: python benchmarks/profile_routed.py nxp1 [soc-Pokec ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def profile(name: str):
    import jax
    import jax.numpy as jnp

    from hispmv_tpu.api.handle import SpmvHandle, _run_routed_part
    from hispmv_tpu.formats.synth import suite_matrix
    from hispmv_tpu.ops.spmv_routed import (
        spmv_routed_stream_pallas, stream_array_names)
    from hispmv_tpu.plan.routed import (
        LAUNCH_NS, TILE_BASE_NS, TILE_BND_NS, TILE_OV_NS, TILE_W_NS,
        TILE_WL_NS, RESIDUAL_NS, BandedRoutedPlan, plan_cost_ns)
    from hispmv_tpu.plan.serialize import load_plan
    from hispmv_tpu.utils.timing import measure_loop_time

    coo = suite_matrix(name, scale=1.0)
    # find the cached plan
    import glob
    paths = glob.glob(f"/tmp/hispmv_plan_cache/{name}-1.0-*routed*.npz")
    if not paths:
        log(f"[{name}] no cached routed plan; building (rank_sort=False)")
        h = SpmvHandle(coo, format="routed")
    else:
        h = SpmvHandle.from_plan(load_plan(paths[0]))
        log(f"[{name}] loaded {paths[0]}")
    plan = h._routed_plan_meta
    meta = h._routed_meta
    d = h._d

    banded = isinstance(plan, BandedRoutedPlan)
    log(f"[{name}] nnz={coo.nnz} shape={coo.shape} banded={banded} "
        f"fill={plan.fill:.3f}")

    # ---- static plan anatomy ----
    def stream_rows(pfx, m):
        rows = []
        if m.get("cells") is not None:
            for c in m["cells"]:
                rows += stream_rows(c["prefix"], c["meta"])
            return rows
        for i, segs in enumerate(m["streams"]):
            for gi, sm in enumerate(segs):
                rows.append((pfx, i, gi) + tuple(sm["dims"]))
        return rows

    rows = stream_rows("", meta)
    total_model = 0.0
    log(f"[{name}] {len(rows)} stream segments:")
    for (pfx, i, gi, nch, tchunk, W, l1p, lp) in rows:
        tiles = nch * tchunk
        m_ns = LAUNCH_NS + tiles * (
            TILE_BASE_NS + TILE_W_NS * (W - 1)
            + (TILE_OV_NS + TILE_WL_NS * W) * (l1p - 1)
            + TILE_BND_NS * lp)
        total_model += m_ns
        log(f"  seg {pfx}s{i}g{gi}: tiles={tiles} (nch={nch}x{tchunk}) "
            f"W={W} l1p={l1p} lp={lp} model={m_ns/1e3:.1f}us")
    # residual
    nres = 0
    if banded:
        nres = plan.residual_nnz
    else:
        nres = len(plan.residual_vals)
    log(f"  residual nnz={nres} model={nres*RESIDUAL_NS/1e3:.1f}us")
    total_model += nres * RESIDUAL_NS
    nperm = 0
    if meta.get("xperm") is not None:
        nperm = len(meta["xperm"]) + len(meta["yperm"])
        log(f"  permute stages: {nperm} panels each way")
    log(f"[{name}] total model {total_model/1e3:.1f}us "
        f"(plan_cost {plan_cost_ns(plan)/1e3:.1f}us)" if not banded
        else f"[{name}] total model {total_model/1e3:.1f}us")

    # ---- measured components ----
    xf = np.random.default_rng(0).standard_normal(coo.num_cols)
    xf = xf.astype(np.float32)
    xp = jnp.asarray(h._pad_x(jnp.asarray(xf)))

    def timed(step, carry):
        for attempt in range(3):  # relay compiles fail transiently
            try:
                return measure_loop_time(step, carry)
            except Exception as e:
                log(f"    retry: {e!r}"[:120])
                time.sleep(5)
        return float("nan")

    # per-segment kernels (flat plans only, or per cell)
    def time_segments(pfx, m, xloc):
        if m.get("cells") is not None:
            for c in m["cells"]:
                xs = xloc[c["c0"]:c["c0"] + c["ncols"]]
                time_segments(c["prefix"], c["meta"], xs)
            return
        nwinp, nytp = m["nwinp"], m["nytp"]
        need = nwinp * 1024
        xl = xloc
        if xl.shape[0] < need:
            xl = jnp.pad(xl, (0, need - xl.shape[0]))
        x2d = xl.reshape(-1, 128)
        for i, segs in enumerate(m["streams"]):
            for gi, sm in enumerate(segs):
                names = stream_array_names(sm["dims"][4])
                p = pfx + f"s{i}g{gi}_"
                packed = tuple(d[p + n] for n in names) + (
                    d[p + "base"], d[p + "byt"], d[p + "lt"])
                def seg_fn(ar, xx):
                    return spmv_routed_stream_pallas(
                        ar, sm["dims"], xx, nytp)
                jf = jax.jit(seg_fn)
                def step(c, _packed=packed, _jf=jf):
                    x, acc = c
                    y = _jf(_packed, x)
                    dep = y.ravel()[:1] * 1e-30
                    return (x + dep[0] * jnp.ones_like(x), acc + dep[0])
                # NB: cheap dep; x2d shared
                t = timed(step, (x2d, jnp.zeros((), jnp.float32)))
                nch, tchunk, W, l1p, lp = sm["dims"]
                tiles = nch * tchunk
                per_tile = (t * 1e9 - LAUNCH_NS) / max(tiles, 1)
                mod = (TILE_BASE_NS + TILE_W_NS * (W - 1)
                       + (TILE_OV_NS + TILE_WL_NS * W) * (l1p - 1)
                       + TILE_BND_NS * lp)
                log(f"  seg {p}: {t*1e6:.1f}us measured "
                    f"({per_tile:.1f} ns/tile; model {mod:.1f})")

    if os.environ.get("PROFILE_SEGMENTS", "1") == "1":
        time_segments("", meta, xp)

    # full runner LAST (largest compile; a relay hiccup must not cost
    # the per-segment data).  Plan arrays ride the CARRY, never a
    # closure (closure capture ships them as lowered-module constants —
    # observed as HTTP 413 multi-GB remote-compile requests).
    fn, args = h.explicit_runner()

    def step_full(c):
        x, ar, acc = c
        y = fn(ar, x)
        # dep must consume ALL of y: a y[:1] tap lets XLA drop whole
        # pallas calls for banded plans (cells feeding other bands are
        # dead code from y[0]'s point of view) — measured 4.0ms vs the
        # honest 6.4ms on soc-Pokec
        dep = jnp.sum(y).astype(x.dtype) * 1e-30
        return (x + dep, ar, acc + dep)

    t_full = timed(step_full, (xp, args, jnp.zeros((), jnp.float32)))
    log(f"[{name}] FULL: {t_full*1e6:.1f}us "
        f"({2*(coo.nnz+coo.num_rows)/t_full/1e9:.1f} GFLOP/s)")
    return


if __name__ == "__main__":
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    for nm in sys.argv[1:]:
        profile(nm)

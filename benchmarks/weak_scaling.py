#!/usr/bin/env python
"""Weak-scaling harness: distributed SpMV over 1..N devices.

North-star target (BASELINE.md section 6): >=70% weak-scaling efficiency at
4 hosts.  On real multi-chip hardware this measures it; in this repo's
single-chip environment it runs on the virtual CPU mesh, which validates
sharding/collectives and reports *balance* (the planner-controlled part of
scaling) while marking timing as not-hardware.

Timing uses the loop-slope method (utils/timing.py) — per-call wall clock
through a relayed backend (or a contended CPU mesh) is meaningless; the
round-1 version of this file violated the repo's own timing doctrine.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/weak_scaling.py --devices 1 2 4 8
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from hispmv_tpu.dist.shard import (
        build_sharded_chunked_plan,
        make_mesh,
        spmv_sharded_chunked,
    )
    from hispmv_tpu.formats.synth import blocked_coo
    from hispmv_tpu.utils.timing import measure_loop_time

    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--nnz-per-device", type=int, default=500_000)
    ap.add_argument(
        "--x-mode", default="ring", choices=["ring", "replicated"]
    )
    ap.add_argument("--json", default="", help="write a JSON artifact here")
    args = ap.parse_args()

    interpret = jax.default_backend() not in ("tpu", "axon")
    on_hw = not interpret
    print(
        f"backend={jax.default_backend()} devices={len(jax.devices())} "
        f"timing={'hardware' if on_hw else 'NOT-hardware (virtual mesh)'}"
    )

    rows_out = []
    base_t = None
    for d in args.devices:
        if d > len(jax.devices()):
            print(f"D={d}: skipped (only {len(jax.devices())} devices)")
            continue
        # weak scaling: problem grows with device count
        rows = 4096 * d
        coo = blocked_coo(rows, rows, args.nnz_per_device * d, seed=d)
        mesh = make_mesh(d)
        sp = build_sharded_chunked_plan(coo, num_devices=d)
        x = np.random.default_rng(0).standard_normal(rows).astype(np.float32)

        def kernel(xx, sp=sp, mesh=mesh):
            return spmv_sharded_chunked(
                sp, xx, mesh, x_mode=args.x_mode, interpret=interpret
            )

        y = np.asarray(kernel(jnp.asarray(x)))  # compile + warm + verify
        want = coo.to_scipy() @ x.astype(np.float64)
        ok = np.allclose(y, want, rtol=1e-3, atol=1e-4)

        def step(carry, kernel=kernel):
            xx, acc = carry
            yy = kernel(xx)
            # full-sum dep: interpret-mode pallas is JAX-traceable, so a
            # single-element dep would let XLA DCE the body (timing.py)
            dep = jnp.sum(yy).astype(xx.dtype) * 1e-30
            return (xx + dep, acc + dep)

        t = measure_loop_time(
            step, (jnp.asarray(x), jnp.zeros((), jnp.float32))
        )
        if base_t is None:
            base_t = t
        eff = base_t / t  # weak scaling: ideal keeps t constant
        print(
            f"D={d}: nnz={coo.nnz} balance={sp.balance:.2f} ok={ok} "
            f"t={t*1e3:.2f}ms weak_eff={eff:.2f} "
            f"bytes/dev={sp.data5.nbytes // d}"
        )
        rows_out.append({
            "devices": d,
            "nnz": int(coo.nnz),
            "rows": rows,
            "balance": round(float(sp.balance), 3),
            "verified": bool(ok),
            "t_ms": round(t * 1e3, 3),
            "weak_efficiency": round(eff, 3),
            "bytes_per_device": int(sp.data5.nbytes // d),
        })

    if args.json:
        import json

        payload = {
            "backend": jax.default_backend(),
            "timing_is_hardware": on_hw,
            "note": (
                "virtual CPU mesh: validates sharding/collectives and the "
                "nnz-balance contract; timings are NOT hardware numbers "
                "unless timing_is_hardware is true.  N virtual devices "
                "share this host's physical cores, so weak_efficiency "
                "necessarily collapses (~1/D or worse) regardless of the "
                "sharding's quality; the hardware-relevant columns are "
                "balance (planner nnz balance across shards, ideal 1.0) "
                "and verified."
            ),
            "x_mode": args.x_mode,
            "nnz_per_device": args.nnz_per_device,
            "rows": rows_out,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

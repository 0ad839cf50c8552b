#!/usr/bin/env python
"""Measured batched-linear / sparse-MLP benchmark (BASELINE config #3).

The reference measures an end-to-end sparse MLP on hardware
(apps/model_test.py:53-92: 3-layer FC model, dense first layer then two
sparse layers, timed per layer and whole-model, vs a CPU baseline) with
the FPGA handle's double-buffered batched ``runLinear``
(pyhispmv/src/fpga_handle.cpp:323-388).  This is the TPU analog:

- layers 4096 -> 8192 -> 8192 -> 1024, sparse densities 0.1 and 0.25,
  batch sizes 1 and 64 (BASELINE.json config #3);
- each sparse layer goes through ``tune()`` (the automation-tool flow)
  and executes via ``SpmvHandle.linear`` — the batched panel kernel for
  routed plans, the chunked batch kernel for block plans;
- every timing is loop-slope (utils/timing.py), the only honest method
  through a relayed backend;
- a dense-MXU column (plain jitted f32 and bf16 matmuls of the same
  layer) gives the speed-of-light comparison the VERDICT asked for.

Writes MLPBENCH.json at the repo root and prints a summary table.

Run: python benchmarks/mlp_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sparse_layer_coo(rng, rows, cols, density):
    """Random masked weight matrix as COO (apps/model.py:20-44 contract:
    uniform mask at `density`, lecun-normal values)."""
    from hispmv_tpu.formats.matrix import COOMatrix

    n_target = int(rows * cols * density)
    # sample without replacement via unique linear indices
    lin = rng.choice(rows * cols, size=n_target, replace=False)
    r = (lin // cols).astype(np.int64)
    c = (lin % cols).astype(np.int64)
    v = (rng.standard_normal(n_target) / np.sqrt(cols * density)).astype(
        np.float32
    )
    return COOMatrix((rows, cols), r, c, v)


def time_step(step, carry0):
    from hispmv_tpu.utils.timing import measure_loop_time

    for _ in range(3):
        try:
            return measure_loop_time(step, carry0)
        except Exception as e:  # relay hiccups: retry
            log(f"  retry: {e!r}"[:110])
            time.sleep(5)
    return float("nan")


def bench_sparse_layer(coo, B, seed=0):
    """Loop-slope seconds per batched linear() on the tuned format."""
    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.tune import tune

    res = tune(coo, cache_path="/tmp/hispmv_best_configs.json", measure=0)
    h = SpmvHandle(coo, config=res.config, format=res.format)
    rng = np.random.default_rng(seed)
    xb = rng.standard_normal((B, coo.num_cols)).astype(np.float32)
    bias = rng.standard_normal(coo.num_rows).astype(np.float32)
    # correctness first (rtol 1e-3 acceptance, general_test.py:106)
    y = np.asarray(h.linear(xb, bias=bias))
    want = (coo.to_scipy() @ xb.astype(np.float64).T).T + bias
    bad = np.abs(y - want) > (1e-3 + 1e-3 * np.abs(want))
    assert not bad.any(), f"verify failed: {bad.sum()} mismatches"
    runner, args = h._batch_runners[B]
    xp = jnp.asarray(np.pad(xb, ((0, 0), (0, h.padded_cols - coo.num_cols))))
    bj = jnp.asarray(bias)

    # args ride in the CARRY (a closed-over plan becomes a lowered-module
    # constant: 256 MB dense layers 413'd the remote compile service) and
    # the dep consumes a FULL reduction of y (a y[0] dep lets XLA
    # slice-of-dot + DCE pure-XLA kernels — see utils/timing.py).
    def step(carry):
        a, x, acc = carry
        yb = runner(a, x, bj)
        dep = jnp.sum(yb).astype(x.dtype) * 1e-30
        return (a, x + dep, acc + dep)

    t = time_step(step, (args, xp, jnp.zeros((), jnp.float32)))
    return t, h.format, res.config.block_h


def bench_dense_layer(R, C, B, dtype, seed=0):
    """Speed-of-light comparison: plain jitted matmul y = x @ W.T + b."""
    rng = np.random.default_rng(seed)
    W = jnp.asarray(
        rng.standard_normal((R, C)).astype(np.float32), dtype=dtype
    )
    xb = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(R).astype(np.float32))

    @jax.jit
    def f(W, x, b):
        y = jnp.dot(
            x.astype(dtype), W.T, preferred_element_type=jnp.float32
        )
        return y + b

    def step(carry):
        Wc, x, acc = carry
        y = f(Wc, x, b)
        dep = jnp.sum(y).astype(x.dtype) * 1e-30
        return (Wc, x + dep, acc + dep)

    return time_step(step, (W, xb, jnp.zeros((), jnp.float32)))


def main():
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    rng = np.random.default_rng(42)
    IN, H, OUT = 4096, 8192, 1024
    out = {
        "config": {
            "layers": [[H, IN], [H, H], [OUT, H]],
            "densities": [0.1, 0.25],
            "batches": [1, 64],
            "method": "loop-slope (utils/timing.py), real chip",
        },
        "layers": [],
    }
    for density in (0.1, 0.25):
        # the reference model: dense first layer, two sparse layers
        # (apps/model.py:57-80); we measure the two sparse layers plus
        # the dense-MXU columns for every layer shape.
        l2 = sparse_layer_coo(rng, H, H, density)
        l3 = sparse_layer_coo(rng, OUT, H, density)
        for name, coo in (("fc2_8192x8192", l2), ("fc3_1024x8192", l3)):
            R, C = coo.shape
            for B in (1, 64):
                t, fmt, bh = bench_sparse_layer(coo, B)
                tf32 = bench_dense_layer(R, C, B, jnp.float32)
                tbf16 = bench_dense_layer(R, C, B, jnp.bfloat16)
                gfl = 2 * (coo.nnz + R) * B / t / 1e9
                row = {
                    "layer": name,
                    "density": density,
                    "batch": B,
                    "format": fmt,
                    "block_h": bh,
                    "sparse_us": round(t * 1e6, 2),
                    "sparse_gflops": round(gfl, 2),
                    "dense_f32_us": round(tf32 * 1e6, 2),
                    "dense_bf16_us": round(tbf16 * 1e6, 2),
                    "sparse_vs_dense_f32": round(tf32 / t, 3),
                }
                out["layers"].append(row)
                log(
                    f"[{name} d={density} B={B}] {fmt}: "
                    f"{t*1e6:.1f}us ({gfl:.1f} GFLOP/s) "
                    f"dense f32 {tf32*1e6:.1f}us bf16 {tbf16*1e6:.1f}us"
                )
    # batch-64 amortization ratio per layer (runLinear's double-buffered
    # contract amortizes stream DMA; compute does not amortize for SpMV)
    for row in out["layers"]:
        if row["batch"] == 64:
            one = next(
                r for r in out["layers"]
                if r["layer"] == row["layer"]
                and r["density"] == row["density"] and r["batch"] == 1
            )
            row["b64_speedup_vs_b1x64"] = round(
                64 * one["sparse_us"] / row["sparse_us"], 2
            )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "MLPBENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["layers"], indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Load a serialized plan, run it on the chip, verify + loop-slope time it.

Usage: python benchmarks/measure_plan.py <plan.npz> <suite_name>
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax.numpy as jnp

    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.formats.synth import suite_matrix
    from hispmv_tpu.plan.serialize import load_plan
    from hispmv_tpu.utils.errors import error_stats
    from hispmv_tpu.utils.timing import bench_spmv

    path, name = sys.argv[1], sys.argv[2]
    coo = suite_matrix(name, scale=1.0)
    h = SpmvHandle.from_plan(load_plan(path))
    x = np.random.default_rng(0).standard_normal(coo.num_cols)
    x = x.astype(np.float32)
    fn, args = h.explicit_runner()
    xp = jnp.asarray(h._pad_x(jnp.asarray(x)))
    t, y = bench_spmv(fn, xp, kernel_args=args)
    stats = error_stats(np.asarray(y), coo.matvec(x.astype(np.float64)))
    gflops = 2 * (coo.nnz + coo.num_rows) / t / 1e9
    print(
        f"[{name}] t={t*1e6:.0f}us {gflops:.1f} GFLOP/s "
        f"verified={stats.ok} max_rel={stats.max_rel_error:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    main()

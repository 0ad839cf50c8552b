"""Host CLI: prepare, verify and benchmark one matrix.

The ``spmv-host`` analog (reference common/src/spmv-host.cpp:12-15,41-191):

    python -m hispmv_tpu MATRIX.mtx [options]          # MatrixMarket file
    python -m hispmv_tpu ROWS COLS [options]           # dense GeMV mode
    python -m hispmv_tpu @name [options]               # suite stand-in

Where the reference took --bitstream/--device/--exec_ms, the TPU version
takes --format/--tune-cache/--min-ms; timing uses the loop-slope method
(utils/timing.py) — the rp_time repeat-loop analog.  Every run ends in a
golden comparison with error statistics (cpuSequential + printErrorStats
contract, spmv-helper.cpp:812-895).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hispmv_tpu",
        description="TPU SpMV/GeMV: prepare, verify, benchmark one matrix",
    )
    p.add_argument(
        "matrix",
        nargs="+",
        help=".mtx path | ROWS COLS (dense) | @suite_name[:scale]",
    )
    p.add_argument(
        "--format",
        default="auto",
        choices=[
            "auto", "tune", "block", "ellx", "split", "routed", "window",
            "stream", "dense",
        ],
        help="execution format; 'tune' runs the cost-model DSE",
    )
    p.add_argument("--block-h", type=int, default=None)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--tune-cache", default=None, help="DSE cache JSON path")
    p.add_argument(
        "--measure", type=int, default=0,
        help="with --format tune: time the top N candidates on device",
    )
    p.add_argument("--metrics-csv", default=None, help="append metrics row")
    p.add_argument(
        "--no-bench", action="store_true", help="verify only, skip timing"
    )
    p.add_argument("--seed", type=int, default=0)
    return p


def load_matrix(args):
    from hispmv_tpu.formats.matrix import coo_from_dense
    from hispmv_tpu.formats.mtx import load_mtx
    from hispmv_tpu.formats.synth import suite_matrix

    spec = args.matrix
    if len(spec) == 2 and spec[0].isdigit() and spec[1].isdigit():
        rows, cols = int(spec[0]), int(spec[1])
        rng = np.random.default_rng(args.seed)
        dense = rng.standard_normal((rows, cols)).astype(np.float32)
        return f"dense-{rows}x{cols}", coo_from_dense(dense)
    name = spec[0]
    if name.startswith("@"):
        scale = 1.0
        body = name[1:]
        if ":" in body:
            body, s = body.split(":", 1)
            scale = float(s)
        return f"{body}(synth x{scale})", suite_matrix(body, scale=scale)
    return name, load_mtx(name)


def main(argv=None) -> int:
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    args = build_parser().parse_args(argv)
    name, coo = load_matrix(args)

    from hispmv_tpu.api.handle import SpmvHandle
    from hispmv_tpu.config import SpmvConfig
    from hispmv_tpu.utils.errors import print_error_stats
    from hispmv_tpu.utils.metrics import MetricsRow, append_metrics

    cfg = SpmvConfig() if args.block_h is None else SpmvConfig(
        block_h=args.block_h
    )
    fmt = args.format
    predicted = float("nan")
    if fmt == "tune":
        from hispmv_tpu.tune import tune

        res = tune(coo, cache_path=args.tune_cache, measure=args.measure)
        cfg, fmt, predicted = res.config, res.format, res.est_seconds
        print(
            f"[{name}] tuned -> {fmt} "
            f"(est {predicted*1e6:.0f} us, {res.est_gflops:.1f} GFLOP/s); "
            f"candidates: {[(l, round(s*1e6)) for l, s in res.candidates[:4]]}"
        )

    t0 = time.perf_counter()
    handle = SpmvHandle(coo, config=cfg, format=fmt)
    prep_s = time.perf_counter() - t0
    print(
        f"[{name}] rows={coo.num_rows} cols={coo.num_cols} nnz={coo.nnz} "
        f"format={handle.format} fill={handle.stats.fill:.4f} "
        f"device_bytes={handle.device_bytes} prep={prep_s:.2f}s"
    )

    # golden model on host (cpuSequential analog) with timing
    i = np.arange(coo.num_cols, dtype=np.float32)
    x = (i + 2.0) / (i + 1.0)  # spmv-host.cpp:17-23 deterministic vector
    # deterministic bias so --beta participates in the run and the golden
    j = np.arange(coo.num_rows, dtype=np.float32)
    y_in = None if args.beta == 0.0 else ((j % 7) - 3.0) / (j + 1.0)
    t0 = time.perf_counter()
    want = coo.matvec(x.astype(np.float64))
    cpu_s = time.perf_counter() - t0
    cpu_gflops = 2 * (coo.nnz + coo.num_rows) / max(cpu_s, 1e-12) / 1e9

    got = np.asarray(
        handle.run(x, y_in=y_in, alpha=args.alpha, beta=args.beta)
    )
    want = args.alpha * want
    if y_in is not None:
        want = want + args.beta * y_in.astype(np.float64)
    from hispmv_tpu.utils.errors import error_stats

    stats = error_stats(got, want)
    print_error_stats(stats, name)

    kernel_s = float("nan")
    gflops = float("nan")
    if not args.no_bench:
        import jax.numpy as jnp

        from hispmv_tpu.utils.timing import bench_spmv

        fn, rargs = handle.explicit_runner()
        xp = jnp.asarray(handle._pad_x(jnp.asarray(x)))
        kernel_s, _ = bench_spmv(fn, xp, kernel_args=rargs)
        gflops = 2 * (coo.nnz + coo.num_rows) / kernel_s / 1e9
        print(
            f"[{name}] kernel={kernel_s*1e6:.1f}us {gflops:.2f} GFLOP/s "
            f"(host golden: {cpu_gflops:.2f} GFLOP/s)"
        )

    if args.metrics_csv:
        append_metrics(
            args.metrics_csv,
            MetricsRow(
                matrix=name,
                rows=coo.num_rows,
                cols=coo.num_cols,
                nnz=coo.nnz,
                format=handle.format,
                fill=handle.stats.fill,
                prep_s=prep_s,
                cpu_s=cpu_s,
                cpu_gflops=cpu_gflops,
                device_bytes=handle.device_bytes,
                predicted_s=predicted,
                kernel_s=kernel_s,
                gflops=gflops,
                verified=stats.ok,
                max_rel_err=stats.max_rel_error,
            ),
        )
    return 0 if stats.ok else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Benchmark orchestrator: run the full 20-matrix suite, collate a CSV.

The run_benchmarks.py analog (reference builds/run_benchmarks.py:46-133):
the reference iterated (config dir, matrix) pairs, rebuilt the host binary
per config, and ran spmv-host with exec/power budgets.  Here per matrix the
autotuner IS the config selection, and the CLI does prepare/verify/bench.

    python benchmarks/run_suite.py [--out metrics.csv] [--names a b c]
    python benchmarks/run_suite.py --compare   # vs reference U280 table
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Scale overrides (round 1 needed them for VMEM-resident x+y; the round-2
# tiled/ellx/routed paths run every fixture at full scale).
SCALE = {}

ALL = [
    "TSOPF_RS_b2383", "mouse_gene", "nd6k", "crankseg_2", "thread",
    "crystk03", "Si41Ge41H72", "PFlow_742", "lowThrust_7", "soc-Pokec",
    "hangGlider_3", "c-52", "nxp1", "trans5", "analytics", "ford2",
    "ASIC_680k", "boyd2", "language", "poli_large",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="suite_metrics.csv")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--compare", action="store_true")
    ap.add_argument("--tune-cache", default="/tmp/hispmv_best_configs.json")
    args = ap.parse_args()

    if args.compare:
        compare(args.out)
        return

    from hispmv_tpu.cli import main as cli_main

    names = args.names or ALL
    for name in names:
        scale = SCALE.get(name, 1.0)
        spec = f"@{name}" if scale == 1.0 else f"@{name}:{scale}"
        print(f"=== {spec} ===", flush=True)
        try:
            cli_main(
                [
                    spec,
                    "--format", "tune",
                    "--tune-cache", args.tune_cache,
                    "--metrics-csv", args.out,
                ]
            )
        except Exception as e:
            print(f"[{name}] ERROR: {type(e).__name__}: {e}", flush=True)


def compare(path):
    from bench import U280_GFLOPS
    from hispmv_tpu.utils.metrics import read_metrics

    rows = read_metrics(path)
    print(f"{'matrix':24} {'ours':>8} {'U280':>8} {'ratio':>6}")
    for r in rows:
        base = None
        for k, v in U280_GFLOPS.items():
            if r["matrix"].startswith(k):
                base = v
                break
        ours = float(r["gflops"])
        ratio = ours / base if base else float("nan")
        print(
            f"{r['matrix']:24} {ours:8.1f} "
            f"{base if base else float('nan'):8.1f} {ratio:6.2f}"
        )


if __name__ == "__main__":
    main()

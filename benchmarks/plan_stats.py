#!/usr/bin/env python
"""Print a routed plan's class/segment anatomy for suite matrices.

Usage: python benchmarks/plan_stats.py mouse_gene [soc-Pokec ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(names):
    import numpy as np

    from hispmv_tpu.formats.synth import suite_matrix
    from hispmv_tpu.ops.spmv_routed import chunk_for_stream, pack_stream
    from hispmv_tpu.plan.routed import (
        BandedRoutedPlan, build_banded_routed_plan,
        build_ranked_routed_plan, plan_cost_ns, routed_vmem_ok)

    for name in names:
        t0 = time.time()
        coo = suite_matrix(name, scale=1.0)
        t_synth = time.time() - t0
        t0 = time.time()
        if routed_vmem_ok(coo.shape):
            plan = build_ranked_routed_plan(coo)
        else:
            plan = build_banded_routed_plan(coo, rank_sort=True)
        t_plan = time.time() - t0
        print(f"[{name}] nnz={coo.nnz} shape={coo.shape} "
              f"synth={t_synth:.1f}s plan={t_plan:.1f}s", flush=True)
        banded = isinstance(plan, BandedRoutedPlan)
        print(f"  banded={banded} tiles={plan.num_tiles} "
              f"fill={plan.fill:.3f} "
              f"stream_MB={plan.stream_bytes/1e6:.1f}", flush=True)

        def show(p, pfx=""):
            total = 0.0
            for i, s in enumerate(p.streams):
                segs = pack_stream(s)
                seg_str = ",".join(str(d[0]) for _, d in segs)
                tch = chunk_for_stream(s)
                print(f"  {pfx}s{i}: T={s.num_tiles} W={s.wmax} "
                      f"l1={s.l1} lmax={s.lmax} tch={tch} "
                      f"segs=[{seg_str}]", flush=True)
            print(f"  {pfx}residual={len(p.residual_vals)} "
                  f"cost={plan_cost_ns(p)/1e3:.1f}us", flush=True)

        if banded:
            for c in plan.cells:
                print(f"  cell r0={c.r0} c0={c.c0}:", flush=True)
                show(c.plan, "  ")
        else:
            show(plan)


if __name__ == "__main__":
    main(sys.argv[1:])

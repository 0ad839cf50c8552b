"""Model demo CLI: CPU flax model vs accelerated model, timed and compared.

The ``model_test.py`` analog (reference apps/model_test.py:38-92):

    python -m hispmv_tpu.models.demo --batch-size 64 --input-size 4096 \
        --hidden-size 8192 --output-size 1024 --density 0.1

Builds the ThreeLayerFCModel (dense -> sparse -> sparse with ReLU), clones
it onto the Accelerator via the layer manager, times both (loop-slope on
the accelerated path), and compares outputs with error statistics
(compare_model_outputs, apps/model.py:82-142 analog).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    from hispmv_tpu.utils.platform import honor_platform_env

    honor_platform_env()

    ap = argparse.ArgumentParser(prog="hispmv_tpu.models.demo")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--input-size", type=int, default=1024)
    ap.add_argument("--hidden-size", type=int, default=2048)
    ap.add_argument("--output-size", type=int, default=256)
    ap.add_argument("--density", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hispmv_tpu.models import (
        AcceleratorLayerManager,
        ThreeLayerFCModel,
        compare_model_outputs,
    )
    from hispmv_tpu.utils.errors import print_error_stats

    model = ThreeLayerFCModel(
        hidden=args.hidden_size,
        out=args.output_size,
        density=args.density,
    )
    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.ones((1, args.input_size))
    t0 = time.perf_counter()
    variables = model.init(rng, x0)
    print(f"model init: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    mgr = AcceleratorLayerManager()
    accel_model = mgr.replace_layers(variables)
    fmts = [h.format for h, _ in accel_model.layers]
    print(
        f"layer swap: {time.perf_counter()-t0:.2f}s; formats per layer: "
        f"{dict(zip(mgr.layer_names, fmts))}"
    )

    xb = np.random.default_rng(args.seed + 1).standard_normal(
        (args.batch_size, args.input_size)
    ).astype(np.float32)

    # CPU (pure flax/XLA) reference, timed
    apply = jax.jit(lambda v, x: model.apply(v, x))
    want = np.asarray(apply(variables, jnp.asarray(xb)))  # compile + run
    t0 = time.perf_counter()
    want = np.asarray(apply(variables, jnp.asarray(xb)))
    t_ref = time.perf_counter() - t0
    print(f"flax model:        {t_ref*1e3:8.2f} ms/batch")

    # accelerated model (eager layer-by-layer through the Accelerator)
    got = np.asarray(accel_model(xb))  # warm compiles
    t0 = time.perf_counter()
    got = np.asarray(accel_model(xb))
    t_acc = time.perf_counter() - t0
    print(f"accelerated model: {t_acc*1e3:8.2f} ms/batch")

    stats = compare_model_outputs(got, want)
    print_error_stats(stats, "model outputs")
    return 0 if stats.ok else 1


if __name__ == "__main__":
    sys.exit(main())

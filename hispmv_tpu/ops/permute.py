"""Within-window permutation Pallas kernel + full-permutation driver.

Executes plan/permute.py stages: each (8,128) window is permuted by
EXACTLY three take_along_axis gathers — sublane, lane, sublane — routed
at plan time by an 8-color Clos edge coloring; all three index fields
ride one i32 route word per element.

The full permutation is S1 -> transpose -> S2 -> transpose -> S3 with the
transposes left to XLA (near memory speed on 2-D f32).  This is what
makes rank-space (degree-sorted) SpMV execution affordable vs ~7-16 ns
per element for an XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hispmv_tpu.plan.permute import PermutePlan, WindowStage, WINDOW

LANES = 128
TCHUNK = 16


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _srl(x, n):
    return jax.lax.shift_right_logical(x, n)


def pack_stage(stage: WindowStage, tchunk: int = TCHUNK, bucket: bool = True):
    """Pad a stage's route array to whole chunks (optionally bucketing the
    chunk count to a power of two for executable reuse).  Returns
    (arrays, (nch, tchunk)).  Padding windows get identity routing
    (route word 0 = subA 0 | laneB 0 | subC 0) — they only permute
    padding data, so any fixed routing is fine."""
    W = stage.num_windows
    nch = max(-(-W // tchunk), 1)
    if bucket:
        nch = _bucket(nch)
    Wp = nch * tchunk

    route = np.zeros((Wp, 8, LANES), np.int32)
    route[:W] = stage.route
    return (route.reshape(nch, tchunk * 8, LANES),), (nch, tchunk)


def _permute_kernel(route_ref, in_ref, out_ref, *, tchunk: int):
    for j in range(tchunk):
        sl = slice(j * 8, (j + 1) * 8)
        win8 = in_ref[0, sl, :]
        route = route_ref[0, sl, :]
        subA = route & 7
        laneB = _srl(route, 3) & 127
        subC = _srl(route, 10) & 7
        a = jnp.take_along_axis(win8, subA, axis=0)
        b = jnp.take_along_axis(a, laneB, axis=1)
        out_ref[0, sl, :] = jnp.take_along_axis(b, subC, axis=0)


def permute_stage_pallas(
    arrays, dims, a: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Apply one within-window stage to ``a`` f32 [Wp*8, 128] (Wp from
    dims); returns the permuted array of the same shape."""
    nch, tchunk = dims[0], dims[1]
    rows = tchunk * 8

    def spec():
        return pl.BlockSpec(
            (1, rows, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    a3 = a.reshape(nch, rows, LANES)
    kernel = functools.partial(_permute_kernel, tchunk=tchunk)
    out = pl.pallas_call(
        kernel,
        grid=(nch,),
        in_specs=[spec()] * (len(arrays) + 1),
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((nch, rows, LANES), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=sum(int(x.size) * 4 for x in arrays)
            + 2 * a.size * 4,
            transcendentals=0,
        ),
    )(*arrays, a3)
    return out.reshape(nch * rows, LANES)


def pack_permute_plan(plan: PermutePlan) -> dict:
    """Device-ready dict of all three stages + shape metadata."""
    s1_arrays, s1_dims = pack_stage(plan.s1)
    s2_arrays, s2_dims = pack_stage(plan.s2, bucket=False)
    s3_arrays, s3_dims = pack_stage(plan.s3)
    return {
        "arrays": [
            [jnp.asarray(x) for x in s1_arrays],
            [jnp.asarray(x) for x in s2_arrays],
            [jnp.asarray(x) for x in s3_arrays],
        ],
        "dims": [s1_dims, s2_dims, s3_dims],
        "n": plan.n,
        "num_windows": plan.num_windows,
    }


def pack_permute_into(d: dict, plan: PermutePlan, prefix: str) -> dict:
    """Store a plan's stage arrays in device dict ``d`` under ``prefix``;
    returns the static meta (dims/shapes + array counts) the runner needs
    to reassemble them (plan arrays ride as explicit jit args)."""
    packed = pack_permute_plan(plan)
    counts = []
    for si, arrays in enumerate(packed["arrays"]):
        counts.append(len(arrays))
        for ai, a in enumerate(arrays):
            d[f"{prefix}a{si}_{ai}"] = a
    return {
        "n": packed["n"],
        "num_windows": packed["num_windows"],
        "dims": packed["dims"],
        "counts": counts,
    }


def permute_apply_from(
    d: dict, meta: dict, prefix: str, x: jax.Array, *,
    interpret: bool = False,
) -> jax.Array:
    """Apply a plan stored by ``pack_permute_into``."""
    arrays = [
        [d[f"{prefix}a{si}_{ai}"] for ai in range(cnt)]
        for si, cnt in enumerate(meta["counts"])
    ]
    return permute_apply(meta, arrays, x, interpret=interpret)


def panel_permute_apply_from(
    d: dict, metas: list, prefix: str, x: jax.Array, *,
    interpret: bool = False,
) -> jax.Array:
    """Apply per-panel plans to consecutive slices of ``x`` (panels of
    plan/permute.py PANEL elements; the last may be shorter)."""
    outs = []
    base = 0
    for i, meta in enumerate(metas):
        seg = x[base : base + meta["n"]]
        outs.append(
            permute_apply_from(
                d, meta, f"{prefix}{i}_", seg, interpret=interpret
            )
        )
        base += meta["n"]
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def permute_apply(
    meta: dict, arrays, x: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """``y = x[perm]`` on device.  ``meta`` holds dims/shapes (static),
    ``arrays`` the stage route arrays (explicit jit args).  ``x`` is f32
    [n] (or longer; extra entries ignored).  Returns f32 [n]."""
    n = meta["n"]
    W = meta["num_windows"]
    d1, d2, d3 = meta["dims"]
    Wp1 = d1[0] * d1[1]
    need = Wp1 * WINDOW
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    else:
        x = x[:need]
    a = permute_stage_pallas(
        arrays[0], d1, x.reshape(Wp1 * 8, LANES), interpret=interpret
    )
    # transpose to (1024, Wp1), pad cols to the S2 width (always 1024)
    at = a.reshape(Wp1, WINDOW).T
    Wp2 = d2[0] * d2[1]
    at = jnp.pad(at, ((0, Wp2 - WINDOW), (0, WINDOW - Wp1)))
    b = permute_stage_pallas(
        arrays[1], d2, at.reshape(Wp2 * 8, LANES), interpret=interpret
    )
    # transpose back: rows become original window index; keep Wp3 of them
    # (Wp3 <= 1024 always since W <= 1024)
    bt = b.reshape(Wp2, WINDOW)[:WINDOW].T
    Wp3 = d3[0] * d3[1]
    bt = bt[:Wp3]
    y = permute_stage_pallas(
        arrays[2], d3, bt.reshape(Wp3 * 8, LANES), interpret=interpret
    )
    return y.reshape(-1)[:n]

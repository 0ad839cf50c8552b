"""Plan serialization: persist prepared execution plans to disk.

The reference's persistence story is "prepare once, keep resident in HBM"
(fpga_handle.cpp:189-206) plus the best-configs.csv autotuning cache.  The
TPU analog adds durable prepared plans: preprocessing large matrices costs
seconds to minutes (sort + pack over nnz), so plans can be saved as .npz
and reloaded into a handle without touching the raw matrix again —
checkpoint/resume for the preprocessing pipeline.

Supports every plan family, including the nested round-2 plans (EllxPlan
holds an overflow BlockPlan; SplitPlan holds an EllxPlan body): nested
dataclasses are flattened with ``prefix..field`` keys.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Union

import numpy as np

from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.ops.spmv_ellx import EllxPlan
from hispmv_tpu.plan.blocks import BlockPlan
from hispmv_tpu.plan.partition import StreamPlan
from hispmv_tpu.plan.routed import (
    BandedRoutedPlan,
    RoutedCell,
    RoutedPlan,
    RoutedStream,
)
from hispmv_tpu.plan.gathered import GatheredPlan
from hispmv_tpu.plan.split import SplitPlan
from hispmv_tpu.plan.windows import WindowPlan

_PLAN_TYPES = {
    "block": BlockPlan,
    "window": WindowPlan,
    "stream": StreamPlan,
    "ellx": EllxPlan,
    "split": SplitPlan,
    "routed": RoutedPlan,
    "routedstream": RoutedStream,
    "bandedrouted": BandedRoutedPlan,
    "routedcell": RoutedCell,
    "gathered": GatheredPlan,
}
_SEP = ".."


def _type_name(plan) -> str:
    for name, cls in _PLAN_TYPES.items():
        if isinstance(plan, cls):
            return name
    raise TypeError(f"unknown plan type: {type(plan)}")


def _flatten(plan, prefix, fields, meta):
    meta[prefix + "__plan_type__"] = _type_name(plan)
    for f in dataclasses.fields(plan):
        key = prefix + f.name
        v = getattr(plan, f.name)
        if isinstance(v, np.ndarray):
            fields[key] = v
        elif (
            isinstance(v, list) and v
            and all(isinstance(a, np.ndarray) for a in v)
        ):
            # list of arrays (rank-space panel perms): one field per panel
            meta[key + "__arraylist__"] = len(v)
            for i, a in enumerate(v):
                fields[key + f"__al{i}"] = a
        elif (
            isinstance(v, list) and v
            and all(
                dataclasses.is_dataclass(a) and not isinstance(a, type)
                for a in v
            )
        ):
            # list of nested plans (banded routed cells): one sub-tree each
            meta[key + "__planlist__"] = len(v)
            for i, a in enumerate(v):
                _flatten(a, key + f"__pl{i}" + _SEP, fields, meta)
        elif isinstance(v, SpmvConfig):
            meta[key + "__config__"] = dataclasses.asdict(v)
        elif dataclasses.is_dataclass(v) and not isinstance(v, type):
            _flatten(v, key + _SEP, fields, meta)
        elif v is None:
            meta[key] = ("__none__",)
        else:
            meta[key] = v


def _unflatten(prefix, z, meta):
    cls = _PLAN_TYPES[meta[prefix + "__plan_type__"]]
    kwargs = {}
    for f in dataclasses.fields(cls):
        key = prefix + f.name
        if key in z.files:
            kwargs[f.name] = z[key]
        elif key + "__arraylist__" in meta:
            kwargs[f.name] = [
                z[key + f"__al{i}"]
                for i in range(meta[key + "__arraylist__"])
            ]
        elif key + "__planlist__" in meta:
            kwargs[f.name] = [
                _unflatten(key + f"__pl{i}" + _SEP, z, meta)
                for i in range(meta[key + "__planlist__"])
            ]
        elif key + "__config__" in meta:
            kwargs[f.name] = SpmvConfig(**meta[key + "__config__"])
        elif (key + _SEP + "__plan_type__") in meta:
            kwargs[f.name] = _unflatten(key + _SEP, z, meta)
        elif key in meta:
            v = meta[key]
            if v == ["__none__"] or v == ("__none__",):
                v = None
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
    if "shape" in kwargs and isinstance(kwargs["shape"], list):
        kwargs["shape"] = tuple(kwargs["shape"])
    return cls(**kwargs)


def save_plan(
    path: str,
    plan: Union[BlockPlan, WindowPlan, StreamPlan, EllxPlan, SplitPlan],
    *,
    compress: bool = True,
):
    """Serialize a plan (possibly with nested sub-plans) to .npz.

    ``compress=False`` trades disk for speed — zlib over multi-hundred-MB
    routed streams costs tens of seconds, which defeats a prep cache."""
    fields, meta = {}, {}
    _flatten(plan, "", fields, meta)
    fields["__meta__"] = np.frombuffer(
        json.dumps(meta, default=list).encode(), dtype=np.uint8
    )
    (np.savez_compressed if compress else np.savez)(path, **fields)


def load_plan(path: str):
    """Load a plan saved with :func:`save_plan`."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        return _unflatten("", z, meta)

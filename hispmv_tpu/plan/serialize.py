"""Plan serialization: persist prepared execution plans to disk.

The reference's persistence story is "prepare once, keep resident in HBM"
(fpga_handle.cpp:189-206) plus the best-configs.csv autotuning cache.  The
TPU analog adds durable prepared plans: preprocessing large matrices costs
seconds to minutes (sort + pack over nnz), so plans can be saved as .npz
and reloaded into a handle without touching the raw matrix again —
checkpoint/resume for the preprocessing pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import numpy as np

from hispmv_tpu.plan.blocks import BlockPlan
from hispmv_tpu.plan.partition import StreamPlan
from hispmv_tpu.plan.windows import WindowPlan
from hispmv_tpu.config import SpmvConfig

_PLAN_TYPES = {
    "block": BlockPlan,
    "window": WindowPlan,
    "stream": StreamPlan,
}


def _type_name(plan) -> str:
    for name, cls in _PLAN_TYPES.items():
        if isinstance(plan, cls):
            return name
    raise TypeError(f"unknown plan type: {type(plan)}")


def save_plan(path: str, plan: Union[BlockPlan, WindowPlan, StreamPlan]):
    """Serialize a plan to a compressed .npz archive."""
    fields = {}
    meta = {"__plan_type__": _type_name(plan)}
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name)
        if isinstance(v, np.ndarray):
            fields[f.name] = v
        elif isinstance(v, SpmvConfig):
            meta["__config__"] = dataclasses.asdict(v)
        elif v is None:
            meta[f.name] = ("__none__",)
        else:
            meta[f.name] = v
    import json

    fields["__meta__"] = np.frombuffer(
        json.dumps(meta, default=list).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **fields)


def load_plan(path: str):
    """Load a plan saved with :func:`save_plan`."""
    import json

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        cls = _PLAN_TYPES[meta.pop("__plan_type__")]
        cfg = meta.pop("__config__", None)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in z.files:
                kwargs[f.name] = z[f.name]
            elif f.name in meta:
                v = meta[f.name]
                if v == ["__none__"] or v == ("__none__",):
                    v = None
                elif isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
            elif f.name == "config" and cfg is not None:
                kwargs["config"] = SpmvConfig(**cfg)
        # tuple-typed fields stored via json lists
        if "shape" in kwargs and isinstance(kwargs["shape"], list):
            kwargs["shape"] = tuple(kwargs["shape"])
        return cls(**kwargs)

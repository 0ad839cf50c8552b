"""Split planner: hub rows/columns -> dense MXU parts, body -> ELLX.

The reference's hybrid row-distribution network exists because power-law
matrices have a few pathologically dense rows that break any per-PE
balance; its crossbar lets ALL PEs cooperate on such rows
(base_functions.cpp:356-436, spmv-helper.cpp:265-347).  The TPU-native
re-derivation does the balancing entirely at plan time by SPLITTING the
matrix:

    A = Hc + Hr + B

- ``Hc``: columns whose degree makes a dense column cheaper than sparse
  blocks ("hub columns": every row touches them, so the column is a nearly
  dense length-R vector).  Stored as a dense [R_pad, kc_pad] panel;
  ``y += Hc @ x[hub_cols]`` runs on the MXU/VPU at full DMA rate.
- ``Hr``: remaining rows dense enough that a dense row costs less than its
  scattered blocks ("hub rows" — the shared-row analog: the whole vector
  unit cooperates on one row).  Stored dense [kr_pad, C_pad];
  ``y[hub_rows] += Hr @ x``.
- ``B``: everything else — the balanced body, executed by the scalar-free
  ELLX engine (ops/spmv_ellx.py).

Every part is bandwidth-bound dense compute or bounded-K ELL; nothing in
the run path depends on per-row degree anymore — that is the crossbar's
load-balance contract, met by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hispmv_tpu.formats.matrix import COOMatrix
from hispmv_tpu.ops.spmv_ellx import EllxPlan, build_ellx_plan
from hispmv_tpu.plan.blocks import LANES, build_block_plan

# modeled cost of one body nonzero in bytes (ELLX unit amortization +
# overflow time expressed as bytes at the fused rate) — measured ~740 B on
# trans5-class bodies; used only to pick hub thresholds
_BODY_BYTES_PER_NNZ = 740.0
_MAX_HUBS = 2048


@dataclasses.dataclass
class SplitPlan:
    shape: tuple
    nnz: int
    block_h: int
    hub_col_idx: Optional[np.ndarray]  # i32 [kc]
    hub_col_dense: Optional[np.ndarray]  # f32 [R_pad, kc_pad]
    hub_row_idx: Optional[np.ndarray]  # i32 [kr]
    hub_row_dense: Optional[np.ndarray]  # f32 [kr_pad, C_pad]
    body: Optional[object]  # EllxPlan or plan.routed.RoutedPlan

    @property
    def device_bytes(self) -> int:
        n = 0
        if self.hub_col_dense is not None:
            n += self.hub_col_dense.nbytes
        if self.hub_row_dense is not None:
            n += self.hub_row_dense.nbytes
        if isinstance(self.body, EllxPlan):
            n += self.body.base_bytes
            if self.body.overflow is not None:
                n += self.body.overflow.data.nbytes
        elif self.body is not None:  # RoutedPlan
            n += self.body.stream_bytes
        return n

    @property
    def stats(self) -> dict:
        d = {
            "kc": 0 if self.hub_col_idx is None else len(self.hub_col_idx),
            "kr": 0 if self.hub_row_idx is None else len(self.hub_row_idx),
            "body_nnz": 0 if self.body is None else self.body.nnz,
            "body_fmt": (
                "none" if self.body is None
                else ("ellx" if isinstance(self.body, EllxPlan) else "routed")
            ),
        }
        if isinstance(self.body, EllxPlan):
            d["body_k"] = self.body.k_base
            d["body_overflow"] = self.body.overflow_blocks
        return d


def _pad(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_body_format(body: COOMatrix) -> str:
    """Routed when the v2 macro-cell estimate beats the ELLX base pass."""
    from hispmv_tpu.plan.routed import (
        best_routed_estimate, routed_vmem_ok)

    R, C = body.shape
    if not routed_vmem_ok(body.shape):
        return "ellx"
    est = best_routed_estimate(body.rows, body.cols, body.shape)
    tiles = est["tiles"]
    t_routed = est["est_ns"] * 1e-9 + min(
        est["residual"] * 1.6e-8, R * 516 / 450e9
    )
    # ELLX body cost: actual base-K choice + overflow time
    from hispmv_tpu.ops.spmv_ellx import choose_k_base

    uk = np.unique(
        body.rows.astype(np.int64) * (C // 128 + 1) + body.cols // 128
    )
    counts = np.bincount(
        (uk // (C // 128 + 1)).astype(np.int64), minlength=R
    )
    k = choose_k_base(counts, 1)
    ov = int(np.maximum(counts - k, 0).sum())
    t_ellx = R * k * 516 / 450e9 + ov * 4.5e-8
    return "routed" if tiles and t_routed < t_ellx else "ellx"


def build_split_plan(
    coo: COOMatrix,
    block_h: int = 1,
    body_bytes_per_nnz: float = _BODY_BYTES_PER_NNZ,
    max_hubs: int = _MAX_HUBS,
    body_format: str = "auto",  # "auto" | "ellx" | "routed"
) -> SplitPlan:
    """Split A by degree thresholds, then plan the body (routed when its
    (band, window) group structure is tile-friendly, else ELLX)."""
    R, C = coo.shape
    rows, cols, vals = coo.rows, coo.cols, coo.values

    # hub columns: dense column costs R_pad*4 B; sparse costs
    # deg * body_bytes_per_nnz.  Densify when sparse would cost more.
    col_deg = np.bincount(cols, minlength=C)
    thresh_c = max(_pad(R, 8) * 4.0 / body_bytes_per_nnz, 4.0)
    hub_c = np.nonzero(col_deg > thresh_c)[0]
    if len(hub_c) > max_hubs:
        hub_c = hub_c[np.argsort(-col_deg[hub_c], kind="stable")[:max_hubs]]
        hub_c.sort()
    in_hc = np.zeros(C, bool)
    in_hc[hub_c] = True
    nnz_hc = in_hc[cols]

    # hub rows among the REMAINING nnz
    rest = ~nnz_hc
    row_deg = np.bincount(rows[rest], minlength=R)
    thresh_r = max(_pad(C, LANES) * 4.0 / body_bytes_per_nnz, 4.0)
    hub_r = np.nonzero(row_deg > thresh_r)[0]
    if len(hub_r) > max_hubs:
        hub_r = hub_r[np.argsort(-row_deg[hub_r], kind="stable")[:max_hubs]]
        hub_r.sort()
    in_hr = np.zeros(R, bool)
    in_hr[hub_r] = True
    nnz_hr = rest & in_hr[rows]

    body_sel = rest & ~nnz_hr

    hub_col_idx = hub_col_dense = None
    if len(hub_c):
        kc_pad = _pad(len(hub_c), LANES)
        r_pad = _pad(R, 8)
        hub_col_dense = np.zeros((r_pad, kc_pad), np.float32)
        # position of each hub col within hub_c (hub_c sorted)
        pos = np.searchsorted(hub_c, cols[nnz_hc])
        np.add.at(hub_col_dense, (rows[nnz_hc], pos), vals[nnz_hc])
        hub_col_idx = hub_c.astype(np.int32)

    hub_row_idx = hub_row_dense = None
    if len(hub_r):
        kr_pad = _pad(len(hub_r), 8)
        c_pad = _pad(C, LANES)
        hub_row_dense = np.zeros((kr_pad, c_pad), np.float32)
        pos = np.searchsorted(hub_r, rows[nnz_hr])
        np.add.at(hub_row_dense, (pos, cols[nnz_hr]), vals[nnz_hr])
        hub_row_idx = hub_r.astype(np.int32)

    body = None
    if body_sel.any():
        body_coo = COOMatrix(
            coo.shape, rows[body_sel], cols[body_sel], vals[body_sel]
        )
        fmt = body_format
        if fmt == "auto":
            fmt = _pick_body_format(body_coo)
        if fmt == "routed":
            from hispmv_tpu.plan.routed import build_routed_plan

            body = build_routed_plan(body_coo)
        else:
            body = build_ellx_plan(
                build_block_plan(body_coo, block_h=block_h)
            )

    return SplitPlan(
        shape=coo.shape,
        nnz=coo.nnz,
        block_h=block_h,
        hub_col_idx=hub_col_idx,
        hub_col_dense=hub_col_dense,
        hub_row_idx=hub_row_idx,
        hub_row_dense=hub_row_dense,
        body=body,
    )


def split_matvec_numpy(plan: SplitPlan, x: np.ndarray) -> np.ndarray:
    """Golden numpy executor (float64), for tests."""
    R, C = plan.shape
    y = np.zeros(R, np.float64)
    if plan.hub_col_dense is not None:
        xh = x[plan.hub_col_idx].astype(np.float64)
        kc = len(plan.hub_col_idx)
        y += plan.hub_col_dense[:R, :kc].astype(np.float64) @ xh
    if plan.hub_row_dense is not None:
        yr = plan.hub_row_dense[: len(plan.hub_row_idx), :C].astype(
            np.float64
        ) @ x.astype(np.float64)
        y[plan.hub_row_idx] += yr
    if isinstance(plan.body, EllxPlan):
        from hispmv_tpu.ops.spmv_ellx import ellx_matvec_numpy

        y += ellx_matvec_numpy(plan.body, x.astype(np.float32)).astype(
            np.float64
        )
    elif plan.body is not None:  # RoutedPlan (incl. its residual)
        from hispmv_tpu.plan.routed import routed_matvec_numpy

        y += routed_matvec_numpy(plan.body, x.astype(np.float32)).astype(
            np.float64
        )
    return y.astype(np.float32)

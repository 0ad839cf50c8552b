"""Prepare-once / run-many execution handles.

TPU-native re-design of the reference's two runtime classes:

- ``HiSpmvHandle`` (common/include/spmv-helper.h:62-202): owns one prepared
  matrix, runs it, verifies it.  Here: :class:`SpmvHandle` — holds the
  device-resident plan arrays and a jitted runner; ``run()`` executes
  ``y = alpha * A @ x + beta * y_in``.
- ``FpgaHandle`` (pyhispmv/src/fpga_handle.cpp): keeps MANY prepared
  matrices resident in device HBM, ``selectMatrix`` switches between them,
  ``runLinear`` does batched GeMV/SpMV for DNN layers.  Here:
  :class:`Accelerator` — a registry of handles; "residency" is literal
  (plan arrays are device arrays held alive by the registry), and
  ``linear()`` dispatches to the batched MXU block kernel or the dense
  matmul overlay.

Formats ("auto" dispatch is the matrix-adaptive contract, the analog of the
automation tool's DSE, automation_tool/src/dse.py:23-95; the full cost-model
search lives in hispmv_tpu.tune):

- ``dense``  — the dense overlay: A stored as a padded dense array, GeMV on
  the MXU (BUILD_DENSE_OVERLAY analog, assets/base_functions.cpp:174-226).
- ``block``  — chunked block-ELL Pallas stream (ops/spmv_chunked.py), with
  column-paneled and fully-tiled (x+y panel) variants by VMEM budget.
- ``ellx``   — scalar-free pure-XLA base-K ELL + Pallas overflow
  (ops/spmv_ellx.py); the irregular-matrix engine (block_h=1 gives
  row-granular units).
- ``split``  — hub-hybrid (plan/split.py): dense hub rows/columns on the
  MXU + ELLX body — the HI-crossbar load-balance analog for power-law
  and arrowhead matrices.
- ``window`` — windowed block-ELL (ops/spmv_windowed.py): per-lane
  sub-index gathering within 1024-column windows, for scattered matrices.
- ``stream`` — lane-stream gather/segment-sum path (ops/spmv_ref.py); the
  portable/debug path (kept for CPU parity testing).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from hispmv_tpu.config import SpmvConfig
from hispmv_tpu.formats.matrix import COOMatrix
from hispmv_tpu.ops.gemv import gemv_xla
from hispmv_tpu.ops.spmv_block import (
    spmv_block_batched_pallas,
    spmv_block_pallas,
)
from hispmv_tpu.ops.spmv_chunked import (
    chunk_for,
    pack_chunks,
    pack_chunks_paneled,
    pack_chunks_tiled,
    spmv_chunked_batched_pallas,
    spmv_chunked_paneled_pallas,
    spmv_chunked_pallas,
    spmv_chunked_tiled_pallas,
)
from hispmv_tpu.ops.spmv_ellx import (
    build_ellx_plan,
    ellx_matvec,
    ellx_matvec_batched,
)
from hispmv_tpu.ops.spmv_windowed import (
    chunk_for_windowed,
    pack_window_chunks,
    spmv_windowed_pallas,
)
from hispmv_tpu.ops.spmv_ref import spmv_xla
from hispmv_tpu.plan.blocks import (
    LANES,
    build_block_plan,
    degree_column_perm,
)
from hispmv_tpu.plan.partition import build_plan


def _use_interpret() -> bool:
    """Pallas kernels need interpret mode off-TPU (the csim analog)."""
    return jax.default_backend() not in ("tpu", "axon")


def _extend_perm(col_perm: np.ndarray, num_cols: int, target: int) -> np.ndarray:
    """Identity-extend a column permutation to ``target`` padded entries so
    the runner can gather padded x in one take()."""
    return np.concatenate(
        [np.asarray(col_perm, np.int32),
         np.arange(num_cols, target, dtype=np.int32)]
    )


def _run_routed_part(d, x, R, meta, prefix, interp):
    """Execute a routed-stream plan (+ its residual) from device dict ``d``
    with key ``prefix``; returns y[:R].  Shared by the 'routed' format and
    the split format's routed body.  Each cost-class stream runs its own
    kernel (light tiles are not charged heavy tiles' layers); their y
    tiles are summed.  A banded meta (matrices whose x + y exceed VMEM,
    plan/routed.py BandedRoutedPlan) dispatches to the cell grid."""
    from hispmv_tpu.ops.spmv_routed import (
        spmv_routed_stream_pallas, stream_array_names)

    if meta.get("cells") is not None:
        return _run_routed_banded(d, x, R, meta, prefix, interp)

    nwinp, nytp = meta["nwinp"], meta["nytp"]
    if meta.get("xperm") is not None:
        # rank-space plan: x -> rank space via the 3-stage permute kernels
        from hispmv_tpu.ops.permute import panel_permute_apply_from

        x = panel_permute_apply_from(
            d, meta["xperm"], prefix + "xp", x, interpret=interp
        )
    need = nwinp * 1024
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    x2d = x.reshape(-1, LANES)
    y2d = None
    if meta.get("gathered") is not None:
        from hispmv_tpu.ops.spmv_gathered import (
            gathered_gather_apply, spmv_gathered_tiles_pallas)

        gm = meta["gathered"]
        xk = x2d[: gm["K"] * 8]
        xg = gathered_gather_apply(
            d, gm, prefix + "g_", xk, interpret=interp
        )
        yg = spmv_gathered_tiles_pallas(
            d[prefix + "g_vals"], d[prefix + "g_word"],
            d[prefix + "g_byt"], xg, gm["num_ytiles"],
            gm["nch"], gm["tchunk"], interpret=interp,
        )
        ypad = nytp * 8 - yg.shape[0]
        y2d = jnp.pad(yg, ((0, ypad), (0, 0))) if ypad else yg
    for i, seg_metas in enumerate(meta["streams"]):
        for gi, sm in enumerate(seg_metas):
            names = stream_array_names(sm["dims"][4])
            p = prefix + f"s{i}g{gi}_"
            packed = tuple(d[p + n] for n in names) + (
                d[p + "base"], d[p + "byt"], d[p + "lt"])
            ys = spmv_routed_stream_pallas(
                packed, sm["dims"], x2d, nytp, interpret=interp,
            )
            y2d = ys if y2d is None else y2d + ys
    if y2d is None:
        y = jnp.zeros((R,), jnp.float32)
    else:
        y = y2d.reshape(-1)[:R]
    if (prefix + "r_rows") in d:  # small residual: element scatter
        contrib = d[prefix + "r_vals"] * jnp.take(
            x, d[prefix + "r_cols"], axis=0
        )
        y = y.at[d[prefix + "r_rows"]].add(contrib)
    if meta["res"] is not None:  # large residual: row-granular ELLX
        rd = {"base_data": d[prefix + "r_base_data"],
              "base_cols": d[prefix + "r_base_cols"]}
        if (prefix + "r_odata") in d:
            rd["odata"] = d[prefix + "r_odata"]
            rd["ometa"] = d[prefix + "r_ometa"]
            rd["ov_expand"] = d[prefix + "r_ov_expand"]
        yr = ellx_matvec(
            rd, x.reshape(-1, LANES), meta["res"].num_row_blocks, 1,
            meta["rchunk"], meta["res_ov"], interpret=interp,
        )
        y = y + yr.reshape(-1)[:R]
    if meta.get("yperm") is not None:
        from hispmv_tpu.ops.permute import panel_permute_apply_from

        y = panel_permute_apply_from(
            d, meta["yperm"], prefix + "yp", y, interpret=interp
        )
    return y


def _run_routed_banded(d, x, R, meta, prefix, interp):
    """Execute a banded routed plan (plan/routed.py BandedRoutedPlan):
    per-cell streams over static x slices, panel results summed into each
    row band, bands concatenated.  The rank-space permute sandwich (when
    present) wraps the WHOLE grid — hub nonzeros are concentrated into
    the top-left cells at plan time.

    This is the routed format's row-tiling answer for y > VMEM matrices
    (reference: spmv-helper.cpp:139-263 row tiles)."""
    if meta.get("xperm") is not None:
        from hispmv_tpu.ops.permute import panel_permute_apply_from

        x = panel_permute_apply_from(
            d, meta["xperm"], prefix + "xp", x, interpret=interp
        )
    band_rows = meta["band_rows"]
    nb = meta["nbands"]
    bands = [None] * nb
    for cell in meta["cells"]:
        xs = x[cell["c0"]:cell["c0"] + cell["ncols"]]
        yc = _run_routed_part(
            d, xs, cell["nrows"], cell["meta"], cell["prefix"], interp
        )
        bi = cell["r0"] // band_rows
        bands[bi] = yc if bands[bi] is None else bands[bi] + yc
    parts = []
    for bi in range(nb):
        n = min(band_rows, R - bi * band_rows)
        parts.append(
            bands[bi]
            if bands[bi] is not None
            else jnp.zeros((n,), jnp.float32)
        )
    y = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    if meta.get("yperm") is not None:
        from hispmv_tpu.ops.permute import panel_permute_apply_from

        y = panel_permute_apply_from(
            d, meta["yperm"], prefix + "yp", y, interpret=interp
        )
    return y


@dataclasses.dataclass
class PrepareStats:
    format: str
    prep_time_s: float
    device_bytes: int
    fill: float  # block fill or 1 - padding (stream); 1.0 for dense


class SpmvHandle:
    """One prepared matrix, device-resident, with a jitted runner."""

    def __init__(
        self,
        matrix: Union[COOMatrix, np.ndarray],
        config: Optional[SpmvConfig] = None,
        format: str = "auto",  # noqa: A002 — mirrors the reference naming
        interpret: Optional[bool] = None,
    ):
        import time

        t0 = time.perf_counter()
        self.config = config or SpmvConfig()
        # set before the prepare dispatch: packers pick smaller chunk
        # sizes in interpret mode (unrolled kernel bodies are traced and
        # executed per-op there; tracing cost scales with the unroll)
        self.interpret = (
            _use_interpret() if interpret is None else interpret
        )
        if isinstance(matrix, np.ndarray):
            self._from_dense_array(matrix)
            fmt = "dense"
        else:
            self.coo = matrix
            self.shape = matrix.shape
            self.nnz = matrix.nnz
            fmt = format
            if fmt == "auto":
                fmt = choose_format(matrix, self.config)
            if fmt == "dense":
                self._from_dense_array(matrix.to_dense())
            elif fmt == "block":
                self._prepare_block(matrix)
            elif fmt == "ellx":
                self._prepare_ellx(matrix)
            elif fmt == "split":
                self._prepare_split(matrix)
            elif fmt == "routed":
                self._prepare_routed(matrix)
            elif fmt == "window":
                self._prepare_window(matrix)
            elif fmt == "stream":
                self._prepare_stream(matrix)
            else:
                raise ValueError(f"unknown format: {fmt}")
        self.format = fmt
        self._runner = None
        self._batch_runners: Dict[int, object] = {}
        self.stats = PrepareStats(
            format=fmt,
            prep_time_s=time.perf_counter() - t0,
            device_bytes=self.device_bytes,
            fill=self._fill,
        )

    @classmethod
    def from_plan(cls, plan, interpret: Optional[bool] = None):
        """Build a handle directly from a prepared (possibly deserialized)
        plan, skipping preprocessing — the load-resident-matrix analog
        (fpga_handle.cpp:189-206 + plan/serialize.py)."""
        from hispmv_tpu.ops.spmv_ellx import EllxPlan
        from hispmv_tpu.plan.blocks import BlockPlan
        from hispmv_tpu.plan.partition import StreamPlan
        from hispmv_tpu.plan.routed import BandedRoutedPlan, RoutedPlan
        from hispmv_tpu.plan.split import SplitPlan
        from hispmv_tpu.plan.windows import WindowPlan

        self = cls.__new__(cls)
        self.config = getattr(plan, "config", None) or SpmvConfig()
        self.coo = None
        self.shape = tuple(plan.shape)
        self.nnz = plan.nnz
        self.interpret = (
            _use_interpret() if interpret is None else interpret
        )
        if isinstance(plan, BandedRoutedPlan):
            self._routed_plan_meta = plan
            self._d = {}
            self._routed_meta = self._routed_pack_banded_into(
                self._d, plan
            )
            self._routed_residual = None
            self._routed_residual_coo = False
            self._fill = plan.fill
            self.device_bytes = sum(
                int(v.nbytes) for v in self._d.values()
            )
            fmt = "routed"
        elif isinstance(plan, RoutedPlan):
            self._routed_plan_meta = plan
            self._d = {}
            self._routed_meta = self._routed_pack_into(
                self._d, plan, self.shape
            )
            self._routed_residual = self._routed_meta["res"]
            self._routed_residual_coo = self._routed_meta["res_coo"]
            self._fill = plan.fill
            self.device_bytes = sum(
                int(v.nbytes) for v in self._d.values()
            )
            fmt = "routed"
        elif isinstance(plan, EllxPlan):
            self.config = dataclasses.replace(
                self.config, block_h=plan.block_h
            )
            self._build_ellx_arrays(plan, self.shape[1])
            fmt = "ellx"
        elif isinstance(plan, SplitPlan):
            self.config = dataclasses.replace(
                self.config, block_h=plan.block_h
            )
            self._build_split_arrays(plan)
            fmt = "split"
        elif isinstance(plan, BlockPlan):
            self.config = dataclasses.replace(
                self.config, block_h=plan.block_h
            )
            # Same dispatch + perm rebuild as _prepare_block: a reloaded
            # column-reordered plan must still permute x.
            self._build_block_arrays(plan, self.shape[1])
            fmt = "block"
        elif isinstance(plan, WindowPlan):
            self.config = dataclasses.replace(
                self.config, block_h=plan.block_h
            )
            self._window_plan_meta = plan
            self._wchunk = chunk_for_windowed(plan.block_h)
            data3d, subidx3d, meta, _ = pack_window_chunks(
                plan, self._wchunk
            )
            self._d = {
                "data": jnp.asarray(data3d),
                "subidx": jnp.asarray(subidx3d),
                "meta": jnp.asarray(meta),
            }
            self._fill = plan.fill
            fmt = "window"
        elif isinstance(plan, StreamPlan):
            self._stream_plan_meta = plan
            self._d = {
                "vals": jnp.asarray(plan.vals),
                "cols": jnp.asarray(plan.cols),
                "round_ids": jnp.asarray(plan.round_ids()),
                "seg_rows": jnp.asarray(plan.seg_rows),
            }
            self._fill = 1.0 - plan.padding_ratio
            fmt = "stream"
        else:
            raise TypeError(f"unsupported plan type {type(plan)}")
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())
        self.format = fmt
        self._runner = None
        self._batch_runners = {}
        self.stats = PrepareStats(
            format=fmt,
            prep_time_s=0.0,
            device_bytes=self.device_bytes,
            fill=self._fill,
        )
        return self

    # -- preparation ------------------------------------------------------

    def _from_dense_array(self, arr: np.ndarray):
        arr = np.asarray(arr, np.float32)
        self.shape = arr.shape
        if not hasattr(self, "coo"):
            self.coo = None
        self.nnz = getattr(self.coo, "nnz", arr.size)
        r, c = arr.shape
        rp = -(-r // 8) * 8
        cp = -(-c // LANES) * LANES
        padded = np.zeros((rp, cp), np.float32)
        padded[:r, :c] = arr
        self._dense = jnp.asarray(padded)
        self._fill = 1.0
        self.device_bytes = int(self._dense.nbytes)

    # VMEM budget for the chunked kernel's resident x + y (+2 chunk buffers
    # and slack); conservatively below the ~16 MiB/core VMEM.
    _CHUNKED_VMEM_BUDGET = 10 * 2**20

    def _block_fits_chunked(self, plan) -> bool:
        xy = (plan.num_col_blocks * LANES + plan.num_row_blocks * plan.block_h) * 4
        chunk = chunk_for(plan.block_h)
        chunk_bytes = 2 * chunk * plan.block_h * LANES * 4
        return xy + chunk_bytes <= self._CHUNKED_VMEM_BUDGET

    # x panel width for the column-paneled kernel (2 MiB of x per panel;
    # 4 MiB double-buffered — must leave budget room for resident y and the
    # two chunk buffers, or the paneled path can never fire)
    _PANEL_NCB = 4096

    def _block_fits_paneled(self, plan) -> bool:
        chunk = chunk_for(plan.block_h)
        need = (
            plan.num_row_blocks * plan.block_h * 4  # y resident
            + self._PANEL_NCB * LANES * 4 * 2  # x panel, double-buffered
            + 2 * chunk * plan.block_h * LANES * 4
        )
        return need <= self._CHUNKED_VMEM_BUDGET

    # y-panel height in bytes for the fully-tiled kernel (1 MiB panels,
    # double-buffered by the output pipeline)
    _PANEL_Y_BYTES = 1 << 20

    def _panel_nrb(self, block_h: int) -> int:
        return max(self._PANEL_Y_BYTES // (block_h * 4), 8)

    def _prepare_block(self, coo: COOMatrix):
        cfg = self.config
        perm = None
        if cfg.col_reorder:
            perm = degree_column_perm(coo)
        plan = build_block_plan(coo, block_h=cfg.block_h, col_perm=perm)
        self._build_block_arrays(plan, coo.num_cols)

    def _build_block_arrays(self, plan, num_cols: int):
        """Dispatch a BlockPlan to chunked / x-paneled / fully-tiled arrays
        by VMEM budget, build the device dict (+ identity-extended x
        permutation when the plan is column-reordered)."""
        cfg = self.config
        self._block_plan_meta = plan
        self._chunked = self._block_fits_chunked(plan)
        self._paneled = (
            not self._chunked and self._block_fits_paneled(plan)
        )
        self._tiled = not self._chunked and not self._paneled
        if self._chunked:
            self._chunk = chunk_for(plan.block_h)
            data3d, meta, _ = pack_chunks(
                plan, self._chunk, dtype=cfg.value_dtype
            )
            self._d = {
                "data": jnp.asarray(data3d),
                "meta": jnp.asarray(meta),
            }
        elif self._paneled:
            self._chunk = chunk_for(plan.block_h)
            data3d, meta, panel_ids, _ = pack_chunks_paneled(
                plan, self._chunk, self._PANEL_NCB, dtype=cfg.value_dtype
            )
            self._d = {
                "data": jnp.asarray(data3d),
                "meta": jnp.asarray(meta),
                "panels": jnp.asarray(panel_ids),
            }
        else:
            # x AND y exceed VMEM: fully-tiled kernel (row-tiling analog,
            # spmv-helper.cpp:139-263) — both vectors panel-streamed.
            self._chunk = chunk_for(plan.block_h)
            data3d, meta, xp, yp, yf, _ = pack_chunks_tiled(
                plan, self._chunk, self._PANEL_NCB,
                self._panel_nrb(plan.block_h), dtype=cfg.value_dtype,
            )
            self._d = {
                "data": jnp.asarray(data3d),
                "meta": jnp.asarray(meta),
                "xpanels": jnp.asarray(xp),
                "ypanels": jnp.asarray(yp),
                "yfirst": jnp.asarray(yf),
            }
        if plan.col_perm is not None:
            # Extend to the FULL padded width (the paneled/tiled paths pad x
            # past num_col_blocks*LANES to a whole number of panels).
            if self._paneled or self._tiled:
                npanels = -(-plan.num_col_blocks // self._PANEL_NCB)
                target = npanels * self._PANEL_NCB * LANES
            else:
                target = plan.num_col_blocks * LANES
            self._d["perm"] = jnp.asarray(
                _extend_perm(plan.col_perm, num_cols, target)
            )
        self._fill = plan.fill
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())

    def _prepare_ellx(self, coo: COOMatrix):
        """Scalar-free pure-XLA ELL executor (ops/spmv_ellx.py): base-K
        dense slots + Pallas overflow for heavy rows.  The production path
        for irregular matrices; block_h=1 gives row-granular units."""
        cfg = self.config
        perm = None
        if cfg.col_reorder:
            perm = degree_column_perm(coo)
        plan = build_block_plan(coo, block_h=cfg.block_h, col_perm=perm)
        self._build_ellx_arrays(build_ellx_plan(plan), coo.num_cols)

    def _build_ellx_arrays(self, eplan, num_cols: int):
        cfg = self.config
        self._ellx_plan_meta = eplan
        dt = jnp.bfloat16 if cfg.value_dtype == "bfloat16" else jnp.float32
        self._d = {
            "base_data": jnp.asarray(eplan.base_data, dt),
            "base_cols": jnp.asarray(eplan.base_cols),
        }
        if eplan.overflow is not None:
            self._chunk = chunk_for(eplan.block_h)
            odata, ometa, _ = pack_chunks(
                eplan.overflow, self._chunk, dtype=cfg.value_dtype
            )
            self._d["odata"] = jnp.asarray(odata)
            self._d["ometa"] = jnp.asarray(ometa)
            self._d["ov_expand"] = jnp.asarray(eplan.ov_expand)
        else:
            self._chunk = None
        if eplan.col_perm is not None:
            self._d["perm"] = jnp.asarray(
                _extend_perm(
                    eplan.col_perm, num_cols,
                    eplan.num_col_blocks * LANES,
                )
            )
        self._fill = eplan.fill
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())

    def _prepare_split(self, coo: COOMatrix):
        """Hub-split hybrid (plan/split.py): dense hub columns/rows on the
        MXU + ELLX body — the load-balance (HI crossbar) analog."""
        from hispmv_tpu.plan.split import build_split_plan

        self._build_split_arrays(
            build_split_plan(coo, block_h=self.config.block_h)
        )

    def _build_split_arrays(self, plan):
        cfg = self.config
        self._split_plan_meta = plan
        dt = jnp.bfloat16 if cfg.value_dtype == "bfloat16" else jnp.float32
        d = {}
        if plan.hub_col_dense is not None:
            d["hc"] = jnp.asarray(plan.hub_col_dense, dt)
            d["hc_idx"] = jnp.asarray(plan.hub_col_idx)
        if plan.hub_row_dense is not None:
            d["hr"] = jnp.asarray(plan.hub_row_dense, dt)
            d["hr_idx"] = jnp.asarray(plan.hub_row_idx)
        from hispmv_tpu.plan.routed import RoutedPlan as _RP

        self._split_body_routed_meta = None
        if isinstance(plan.body, _RP):
            self._chunk = None
            self._split_body_routed_meta = self._routed_pack_into(
                d, plan.body, plan.shape, prefix="b_"
            )
        elif plan.body is not None:
            eplan = plan.body
            d["base_data"] = jnp.asarray(eplan.base_data, dt)
            d["base_cols"] = jnp.asarray(eplan.base_cols)
            if eplan.overflow is not None:
                self._chunk = chunk_for(eplan.block_h)
                odata, ometa, _ = pack_chunks(
                    eplan.overflow, self._chunk, dtype=cfg.value_dtype
                )
                d["odata"] = jnp.asarray(odata)
                d["ometa"] = jnp.asarray(ometa)
                d["ov_expand"] = jnp.asarray(eplan.ov_expand)
            else:
                self._chunk = None
        else:
            self._chunk = None
        self._d = d
        tot_slots = plan.device_bytes / 4.0
        self._fill = plan.nnz / max(tot_slots, 1.0)
        self.device_bytes = sum(int(v.nbytes) for v in d.values())

    def _routed_pack_into(self, d, plan, shape, prefix=""):
        """Pack a RoutedPlan (+ residual executor) into device dict ``d``
        under ``prefix``; returns the static meta the runner needs."""
        from hispmv_tpu.formats.matrix import COOMatrix as _COO
        from hispmv_tpu.ops.spmv_routed import (
            _bucket, pack_stream, stream_array_names)

        # Interpret mode (tests / csim analog): the kernel body is unrolled
        # tchunk-fold and traced per-op, so tracing+lowering time scales
        # with the chunk; small chunks keep the suite fast without
        # touching the hardware path (tchunk=0 = per-stream default).
        tchunk = 4 if getattr(self, "interpret", False) else 0
        streams_meta = []
        for i, s in enumerate(plan.streams):
            seg_metas = []
            for gi, (packed, dims) in enumerate(
                pack_stream(s, tchunk=tchunk)
            ):
                names = stream_array_names(dims[4]) + (
                    "base", "byt", "lt")
                for n, a in zip(names, packed):
                    d[prefix + f"s{i}g{gi}_" + n] = jnp.asarray(a)
                seg_metas.append({"dims": dims})
            streams_meta.append(seg_metas)
        meta = {
            "streams": streams_meta,
            # pow-2 buckets -> shared compiled kernels across matrices
            "nwinp": _bucket(plan.num_windows),
            "nytp": _bucket(plan.num_ytiles),
            "res": None,
            "res_coo": False,
            "res_ov": 0,
            "rchunk": None,
            "xperm": None,
            "yperm": None,
            "gathered": None,
        }
        if plan.gathered is not None:
            from hispmv_tpu.ops.spmv_gathered import pack_gathered

            garrays, gmeta = pack_gathered(
                plan.gathered,
                tchunk=4 if getattr(self, "interpret", False) else 32,
            )
            for n, a in garrays.items():
                d[prefix + "g_" + n] = jnp.asarray(a)
            gmeta["num_ytiles"] = plan.gathered.num_ytiles
            meta["gathered"] = gmeta
        if plan.col_perms is not None:
            meta["xperm"], meta["yperm"] = self._pack_rank_perms(
                d, plan.col_perms, plan.row_perms, prefix
            )
        n_res = len(plan.residual_vals)
        if n_res:
            # Small residuals: element scatter/gather beats an ELLX base
            # spanning the full row space.  Both constants MEASURED on
            # chip (2026-08-20): XLA scatter-add 16 ns/nnz; bh=1
            # full-height ELLX ~11 ns/ROW fixed + ~2.5 ns/nnz (the old
            # bandwidth-only ELLX model was 10x optimistic — it charged
            # mouse_gene 52 us for a residual that measured 495 us and
            # ate 21% of the matvec).
            if n_res * 16e-9 < shape[0] * 11e-9 + n_res * 2.5e-9:
                meta["res_coo"] = True
                d[prefix + "r_rows"] = jnp.asarray(
                    plan.residual_rows.astype(np.int32)
                )
                d[prefix + "r_cols"] = jnp.asarray(
                    plan.residual_cols.astype(np.int32)
                )
                d[prefix + "r_vals"] = jnp.asarray(plan.residual_vals)
            else:
                res = _COO(
                    shape, plan.residual_rows, plan.residual_cols,
                    plan.residual_vals,
                )
                eplan = build_ellx_plan(
                    build_block_plan(res, block_h=1),
                    max_base_bytes=2 << 30,
                )
                meta["res"] = eplan
                d[prefix + "r_base_data"] = jnp.asarray(eplan.base_data)
                d[prefix + "r_base_cols"] = jnp.asarray(eplan.base_cols)
                if eplan.overflow is not None:
                    meta["rchunk"] = chunk_for(1)
                    meta["res_ov"] = eplan.overflow.num_row_blocks
                    odata, ometa, _ = pack_chunks(
                        eplan.overflow, meta["rchunk"]
                    )
                    d[prefix + "r_odata"] = jnp.asarray(odata)
                    d[prefix + "r_ometa"] = jnp.asarray(ometa)
                    d[prefix + "r_ov_expand"] = jnp.asarray(eplan.ov_expand)
        return meta

    def _pack_rank_perms(self, d, col_perms, row_perms, prefix=""):
        """Pack the rank-space permute sandwich: x is permuted into rank
        space before the streams, y permuted back after (plan/permute.py
        3-stage kernels; panel-local perms).  Returns (xperm, yperm)
        metas."""
        from hispmv_tpu.ops.permute import pack_permute_into
        from hispmv_tpu.plan.permute import build_permute_plan

        xperm = [
            pack_permute_into(
                d, build_permute_plan(p), prefix + f"xp{i}_"
            )
            for i, p in enumerate(col_perms)
        ]
        yperms = []
        for p in row_perms:
            inv = np.empty(len(p), np.int64)
            inv[p] = np.arange(len(p))
            yperms.append(inv)
        yperm = [
            pack_permute_into(
                d, build_permute_plan(p), prefix + f"yp{i}_"
            )
            for i, p in enumerate(yperms)
        ]
        return xperm, yperm

    def _routed_pack_banded_into(self, d, plan, prefix=""):
        """Pack a BandedRoutedPlan: every cell's RoutedPlan under its own
        key prefix + the top-level rank-perm sandwich."""
        meta = {
            "cells": [],
            "nbands": plan.num_bands,
            "band_rows": plan.band_rows,
            "xperm": None,
            "yperm": None,
            "res": None,
            "res_coo": False,
        }
        for i, c in enumerate(plan.cells):
            cp = prefix + f"c{i}_"
            sm = self._routed_pack_into(
                d, c.plan, (c.nrows, c.ncols), prefix=cp
            )
            meta["cells"].append({
                "r0": c.r0, "c0": c.c0,
                "nrows": c.nrows, "ncols": c.ncols,
                "prefix": cp, "meta": sm,
            })
        if plan.col_perms is not None:
            meta["xperm"], meta["yperm"] = self._pack_rank_perms(
                d, plan.col_perms, plan.row_perms, prefix
            )
        return meta

    def _prepare_routed(self, coo: COOMatrix):
        """Routed-stream format (plan/routed.py + ops/spmv_routed.py):
        per-nnz vectorized execution with plan-time routing — the crossbar
        analog.  Conflict/noise residual rides an internal element-scatter
        or row-granular ELLX executor added to y.  With
        ``config.rank_sort`` the plan is built in rank space (degree-sorted
        rows/cols) and x/y ride the fast permutation kernels in and out —
        the scale-free/HI-crossbar answer (plan/routed.py
        build_ranked_routed_plan)."""
        from hispmv_tpu.plan.routed import (
            build_banded_routed_plan,
            build_ranked_routed_plan,
            build_routed_plan,
            routed_vmem_ok,
        )

        self._d = {}
        if not routed_vmem_ok(coo.shape):
            # x + y exceed VMEM (soc-Pokec scale): grid of VMEM-feasible
            # cells, rank-sorted so power-law hubs concentrate top-left
            # (the y row-tiling answer, spmv-helper.cpp:139-263)
            plan = build_banded_routed_plan(
                coo, rank_sort=self.config.rank_sort
            )
            self._routed_plan_meta = plan
            self._routed_meta = self._routed_pack_banded_into(
                self._d, plan
            )
        else:
            if self.config.rank_sort:
                plan = build_ranked_routed_plan(coo)
            else:
                plan = build_routed_plan(coo)
            self._routed_plan_meta = plan
            self._routed_meta = self._routed_pack_into(
                self._d, plan, coo.shape
            )
        # back-compat introspection fields
        self._routed_residual = self._routed_meta["res"]
        self._routed_residual_coo = self._routed_meta["res_coo"]
        self._fill = plan.fill
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())

    def _prepare_window(self, coo: COOMatrix):
        from hispmv_tpu.plan.windows import build_window_plan

        plan = build_window_plan(coo, block_h=self.config.block_h)
        self._window_plan_meta = plan
        self._wchunk = chunk_for_windowed(plan.block_h)
        data3d, subidx3d, meta, _ = pack_window_chunks(
            plan, self._wchunk, dtype=self.config.value_dtype
        )
        self._d = {
            "data": jnp.asarray(data3d),
            "subidx": jnp.asarray(subidx3d),
            "meta": jnp.asarray(meta),
        }
        self._fill = plan.fill
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())

    def _prepare_stream(self, coo: COOMatrix):
        plan = build_plan(coo, self.config)
        self._stream_plan_meta = plan
        self._d = {
            "vals": jnp.asarray(plan.vals),
            "cols": jnp.asarray(plan.cols),
            "round_ids": jnp.asarray(plan.round_ids()),
            "seg_rows": jnp.asarray(plan.seg_rows),
        }
        self._fill = 1.0 - plan.padding_ratio
        self.device_bytes = sum(int(v.nbytes) for v in self._d.values())

    # -- execution --------------------------------------------------------

    @property
    def plan(self):
        """The prepared plan object for this handle's format — serializable
        via plan/serialize.py and reloadable with :meth:`from_plan` (the
        prepare-once persistence analog of fpga_handle.cpp:189-206).
        ``None`` for the dense overlay (no preprocessing to persist)."""
        for attr in (
            "_split_plan_meta", "_routed_plan_meta", "_window_plan_meta",
            "_stream_plan_meta", "_ellx_plan_meta", "_block_plan_meta",
        ):
            p = getattr(self, attr, None)
            if p is not None:
                return p
        return None

    @property
    def padded_cols(self) -> int:
        if self.format == "dense":
            return int(self._dense.shape[1])
        if self.format == "block":
            if getattr(self, "_paneled", False) or getattr(
                self, "_tiled", False
            ):
                ncb = self._block_plan_meta.num_col_blocks
                npanels = -(-ncb // self._PANEL_NCB)
                return npanels * self._PANEL_NCB * LANES
            return self._block_plan_meta.num_col_blocks * LANES
        if self.format == "ellx":
            return self._ellx_plan_meta.num_col_blocks * LANES
        if self.format == "split":
            return -(-self.shape[1] // LANES) * LANES
        if self.format == "routed":
            from hispmv_tpu.plan.routed import WINDOW as RW

            if self._routed_meta.get("cells") is not None:
                # banded: cells slice x at original offsets (each cell
                # pads its own slice); x only needs its true length
                return self.shape[1]
            return self._routed_meta["nwinp"] * RW
        if self.format == "window":
            from hispmv_tpu.plan.windows import SEGS

            return self._window_plan_meta.num_windows * SEGS * LANES
        return self.shape[1]

    def _pad_x(self, x: jax.Array) -> jax.Array:
        if x.shape[-1] != self.shape[1]:
            raise ValueError(
                f"x has {x.shape[-1]} entries, matrix has {self.shape[1]} "
                "columns"
            )
        pad = self.padded_cols - x.shape[-1]
        if pad > 0:
            widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
            x = jnp.pad(x, widths)
        return x

    def _make_runner(self):
        # Plan arrays are passed as EXPLICIT jit arguments (the ``d`` dict),
        # never closures: closed-over arrays get captured as lowered-module
        # constants, which ships/compiles hundreds of MBs per jit on remote
        # backends.
        fmt = self.format
        interp = self.interpret
        R = self.shape[0]
        if fmt == "dense":

            def run(d, x, y_in, alpha, beta):
                y = gemv_xla(d["dense"], x)[:R]
                y = alpha * y
                return y if y_in is None else y + beta * y_in

        elif fmt == "block":
            plan = self._block_plan_meta
            nrb = plan.num_row_blocks
            chunked = self._chunked
            paneled = getattr(self, "_paneled", False)
            tiled = getattr(self, "_tiled", False)
            bh = plan.block_h
            chunk = self._chunk if (chunked or paneled or tiled) else None
            panel_ncb = self._PANEL_NCB
            panel_nrb = self._panel_nrb(bh)
            npy = -(-nrb // panel_nrb)

            def run(d, x, y_in, alpha, beta):
                if "perm" in d:
                    x = jnp.take(x, d["perm"], axis=0)
                if chunked:
                    y = spmv_chunked_pallas(
                        d["data"], d["meta"], x.reshape(-1, LANES),
                        nrb, bh, chunk, interpret=interp,
                    )
                elif paneled:
                    y = spmv_chunked_paneled_pallas(
                        d["data"], d["meta"], d["panels"],
                        x.reshape(-1, LANES), nrb, bh, chunk, panel_ncb,
                        interpret=interp,
                    )
                elif tiled:
                    y = spmv_chunked_tiled_pallas(
                        d["data"], d["meta"], d["xpanels"], d["ypanels"],
                        d["yfirst"], x.reshape(-1, LANES),
                        npy, panel_nrb, bh, chunk, panel_ncb,
                        interpret=interp,
                    )
                else:
                    y = spmv_block_pallas(
                        d["data"], d["rows"], d["cols"], d["firsts"],
                        d["lasts"], x.reshape(-1, 1, LANES), nrb,
                        interpret=interp,
                    )
                y = alpha * y.reshape(-1)[:R]
                return y if y_in is None else y + beta * y_in

        elif fmt == "ellx":
            eplan = self._ellx_plan_meta
            nrb = eplan.num_row_blocks
            bh = eplan.block_h
            chunk = self._chunk
            ov_nrb = (
                eplan.overflow.num_row_blocks
                if eplan.overflow is not None else 0
            )

            def run(d, x, y_in, alpha, beta):
                if "perm" in d:
                    x = jnp.take(x, d["perm"], axis=0)
                y = ellx_matvec(
                    d, x.reshape(-1, LANES), nrb, bh, chunk, ov_nrb,
                    interpret=interp,
                )
                y = alpha * y.reshape(-1)[:R]
                return y if y_in is None else y + beta * y_in

        elif fmt == "split":
            from hispmv_tpu.ops.spmv_ellx import EllxPlan as _EP

            splan = self._split_plan_meta
            body = splan.body
            bh = splan.block_h
            chunk = self._chunk
            body_is_ellx = isinstance(body, _EP)
            nrb = body.num_row_blocks if body_is_ellx else 0
            ov_nrb = (
                body.overflow.num_row_blocks
                if body_is_ellx and body.overflow is not None else 0
            )
            bmeta = getattr(self, "_split_body_routed_meta", None)
            kc = (
                len(splan.hub_col_idx)
                if splan.hub_col_idx is not None else 0
            )
            kc_pad = (
                splan.hub_col_dense.shape[1]
                if splan.hub_col_dense is not None else 0
            )
            kr = (
                len(splan.hub_row_idx)
                if splan.hub_row_idx is not None else 0
            )

            def run(d, x, y_in, alpha, beta):
                if bmeta is not None:  # routed body (+ its residual)
                    y = _run_routed_part(d, x, R, bmeta, "b_", interp)
                elif "base_data" in d:
                    y = ellx_matvec(
                        d, x.reshape(-1, LANES), nrb, bh, chunk, ov_nrb,
                        interpret=interp,
                    ).reshape(-1)[:R]
                else:
                    y = jnp.zeros((R,), jnp.float32)
                if "hc" in d:
                    xh = jnp.take(x, d["hc_idx"], axis=0)
                    xh = jnp.pad(xh, (0, kc_pad - kc))
                    y = y + jnp.dot(
                        d["hc"].astype(jnp.float32), xh,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )[:R]
                if "hr" in d:
                    yr = jnp.dot(
                        d["hr"].astype(jnp.float32), x,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )[:kr]
                    y = y.at[d["hr_idx"]].add(yr)
                y = alpha * y
                return y if y_in is None else y + beta * y_in

        elif fmt == "routed":
            rmeta = self._routed_meta

            def run(d, x, y_in, alpha, beta):
                y = _run_routed_part(d, x, R, rmeta, "", interp)
                y = alpha * y
                return y if y_in is None else y + beta * y_in

        elif fmt == "window":
            plan = self._window_plan_meta
            nrb = plan.num_row_blocks
            bh = plan.block_h
            wchunk = self._wchunk

            def run(d, x, y_in, alpha, beta):
                y = spmv_windowed_pallas(
                    d["data"], d["subidx"], d["meta"],
                    x.reshape(-1, LANES), nrb, bh, wchunk,
                    interpret=interp,
                )
                y = alpha * y.reshape(-1)[:R]
                return y if y_in is None else y + beta * y_in

        else:  # stream
            plan = self._stream_plan_meta

            def run(d, x, y_in, alpha, beta):
                y = spmv_xla(
                    d["vals"], d["cols"], d["round_ids"], d["seg_rows"],
                    plan.num_rounds, R, x,
                )
                y = alpha * y
                return y if y_in is None else y + beta * y_in

        return jax.jit(run)

    def _runner_args(self) -> dict:
        if self.format == "dense":
            return {"dense": self._dense}
        return self._d

    def explicit_runner(self):
        """``(fn, args)`` where ``fn(args, x_padded) -> y`` with plan
        arrays as EXPLICIT arguments — for external timing harnesses that
        wrap the runner in another jit (closure capture would ship the plan
        as lowered-module constants; observed as multi-GB remote-compile
        requests)."""
        if self._runner is None:
            self._runner = self._make_runner()
        runner = self._runner

        def fn(d, x):
            return runner(d, x, None, jnp.float32(1.0), jnp.float32(0.0))

        return fn, self._runner_args()

    def run(self, x, y_in=None, alpha=1.0, beta=0.0) -> jax.Array:
        """``y = alpha * A @ x + beta * y_in`` (single vector)."""
        if self._runner is None:
            self._runner = self._make_runner()
        x = self._pad_x(jnp.asarray(x, jnp.float32))
        y_in = None if y_in is None else jnp.asarray(y_in, jnp.float32)
        return self._runner(
            self._runner_args(), x, y_in, jnp.float32(alpha),
            jnp.float32(beta),
        )

    # -- batched ----------------------------------------------------------

    def _make_batch_runner(self, batch: int):
        # Same explicit-argument rule as _make_runner (no closed-over plan
        # arrays — they become lowered-module constants).  Returns
        # ``(jitted_runner, args_dict)``: the argument set is chosen HERE,
        # per batch size, because the chunked-batch kernel and the per-block
        # fallback consume different plan arrays (a handle can serve both
        # across different batch sizes).
        fmt = self.format
        interp = self.interpret
        R = self.shape[0]
        args = self._d if fmt != "dense" else {"dense": self._dense}
        if fmt == "dense":

            def run(d, xb, bias):
                # xb [B, Cp] -> y [B, R]
                y = gemv_xla(d["dense"], xb)[:, :R]
                return y if bias is None else y + bias[None, :]

        elif fmt == "block":
            plan = self._block_plan_meta
            nrb = plan.num_row_blocks
            bh = plan.block_h
            # Batched chunked kernel when x[B]+y[B] still fit VMEM;
            # otherwise the per-block batched kernel (no residency needs).
            use_chunked_batch = self._chunked and (
                (plan.num_col_blocks * LANES + nrb * bh) * batch * 4
                + 2 * self._chunk * bh * LANES * 4
                <= self._CHUNKED_VMEM_BUDGET
            )
            if not use_chunked_batch:
                # per-block batched kernel wants per-block arrays; build
                # them as CONCRETE device arrays even if linear() was called
                # under an outer jit trace (else the uploads leak tracers)
                if not hasattr(self, "_batch_d"):
                    with jax.ensure_compile_time_eval():
                        self._batch_d = {
                            "data": jnp.asarray(plan.data),
                            "rows": jnp.asarray(plan.block_rows),
                            "cols": jnp.asarray(plan.block_cols),
                            "firsts": jnp.asarray(plan.block_firsts),
                            "lasts": jnp.asarray(plan.block_lasts),
                        }
                    if "perm" in self._d:
                        with jax.ensure_compile_time_eval():
                            self._batch_d["perm"] = jnp.asarray(
                                _extend_perm(
                                    plan.col_perm, self.shape[1],
                                    plan.num_col_blocks * LANES,
                                )
                            )
                args = self._batch_d
            chunk = self._chunk if self._chunked else None

            def run(d, xb, bias):
                if "perm" in d:
                    xb = jnp.take(xb, d["perm"], axis=1)
                # [B, Cp] -> [ncb, LANES, B]
                xt = xb.T.reshape(-1, LANES, xb.shape[0])
                if use_chunked_batch:
                    y = spmv_chunked_batched_pallas(
                        d["data"], d["meta"], xt, nrb, bh, chunk,
                        interpret=interp,
                    )  # [nrb, bh, B]
                else:
                    y = spmv_block_batched_pallas(
                        d["data"], d["rows"], d["cols"], d["firsts"],
                        d["lasts"], xt, nrb, interpret=interp,
                    )  # [nrb, block_h, B]
                y = y.reshape(-1, xb.shape[0])[:R].T  # [B, R]
                return y if bias is None else y + bias[None, :]

        elif fmt == "ellx":
            eplan = self._ellx_plan_meta
            nrb = eplan.num_row_blocks
            bh = eplan.block_h
            chunk = self._chunk
            ov_nrb = (
                eplan.overflow.num_row_blocks
                if eplan.overflow is not None else 0
            )

            def run(d, xb, bias):
                if "perm" in d:
                    xb = jnp.take(xb, d["perm"], axis=1)
                xt = xb.T.reshape(-1, LANES, xb.shape[0])
                y = ellx_matvec_batched(
                    d, xt, nrb, bh, chunk, ov_nrb, interpret=interp
                )  # [nrb, bh, B]
                y = y.reshape(-1, xb.shape[0])[:R].T
                return y if bias is None else y + bias[None, :]

        elif fmt == "split":
            from hispmv_tpu.ops.spmv_ellx import EllxPlan as _EP

            splan = self._split_plan_meta
            body = splan.body
            bh = splan.block_h
            chunk = self._chunk
            body_is_ellx = isinstance(body, _EP)
            nrb = body.num_row_blocks if body_is_ellx else 0
            ov_nrb = (
                body.overflow.num_row_blocks
                if body_is_ellx and body.overflow is not None else 0
            )
            bmeta = getattr(self, "_split_body_routed_meta", None)
            kc = (
                len(splan.hub_col_idx)
                if splan.hub_col_idx is not None else 0
            )
            kc_pad = (
                splan.hub_col_dense.shape[1]
                if splan.hub_col_dense is not None else 0
            )
            kr = (
                len(splan.hub_row_idx)
                if splan.hub_row_idx is not None else 0
            )

            def run(d, xb, bias):
                B = xb.shape[0]
                if bmeta is not None:  # routed body: per-vector loop
                    y = jnp.stack([
                        _run_routed_part(d, xb[b], R, bmeta, "b_", interp)
                        for b in range(B)
                    ])
                elif "base_data" in d:
                    xt = xb.T.reshape(-1, LANES, B)
                    y = ellx_matvec_batched(
                        d, xt, nrb, bh, chunk, ov_nrb, interpret=interp
                    ).reshape(-1, B)[:R].T  # [B, R]
                else:
                    y = jnp.zeros((B, R), jnp.float32)
                if "hc" in d:
                    xh = jnp.take(xb, d["hc_idx"], axis=1)
                    xh = jnp.pad(xh, ((0, 0), (0, kc_pad - kc)))
                    y = y + jnp.dot(
                        xh, d["hc"].astype(jnp.float32).T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )[:, :R]
                if "hr" in d:
                    yr = jnp.dot(
                        xb, d["hr"].astype(jnp.float32).T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )[:, :kr]
                    y = y.at[:, d["hr_idx"]].add(yr)
                return y if bias is None else y + bias[None, :]

        elif fmt == "routed":
            rmeta = self._routed_meta
            if (
                rmeta.get("cells") is not None
                or rmeta.get("xperm") is not None
                or rmeta.get("gathered") is not None
            ):
                # banded grids slice x at per-cell offsets, rank-space
                # plans run per-vector permute kernels, and gathered
                # side-plans run per-vector gather stages: keep the
                # per-vector loop for these (DNN-layer matrices are
                # VMEM-feasible and un-ranked in practice)
                if self._runner is None:
                    self._runner = self._make_runner()
                single = self._runner

                def run(d, xb, bias):
                    ys = [
                        single(d, xb[b], None, jnp.float32(1.0),
                               jnp.float32(0.0))
                        for b in range(xb.shape[0])
                    ]
                    y = jnp.stack(ys)
                    return y if bias is None else y + bias[None, :]

            else:
                # panel-batched kernel: the stream is DMA'd once per
                # panel of P vectors (x[P] + y[P] VMEM-resident), the
                # runLinear stream-reuse contract
                # (fpga_handle.cpp:323-388)
                from hispmv_tpu.ops.spmv_routed import (
                    spmv_routed_stream_batched_pallas,
                    stream_array_names,
                )

                nwinp, nytp = rmeta["nwinp"], rmeta["nytp"]
                per_vec = (nwinp + nytp) * 8 * LANES * 4
                panel_b = max(
                    1, min(8, int(6 * 2**20 // max(per_vec, 1)))
                )
                # cap the panel at the (pow-2 bucketed) batch: padding B
                # up to a fixed panel executes dead vectors — B=1 through
                # an 8-wide panel measured 161.6 us vs 38 us single on
                # ford2 (pow-2 keeps executables shared across sizes)
                bb = 1
                while bb < batch:
                    bb *= 2
                panel_b = max(1, min(panel_b, bb))
                res_plan = rmeta["res"]
                res_coo = rmeta["res_coo"]
                rchunk, res_ov = rmeta["rchunk"], rmeta["res_ov"]

                def run(d, xb, bias):
                    B = xb.shape[0]
                    Bp = -(-B // panel_b) * panel_b
                    need = nwinp * 1024
                    xp = jnp.pad(
                        xb, ((0, Bp - B), (0, need - xb.shape[1]))
                    )
                    ys = []
                    for b0 in range(0, Bp, panel_b):
                        xpan = xp[b0 : b0 + panel_b]  # [P, need]
                        xb2d = xpan.reshape(-1, LANES)
                        y2d = None
                        for i, segs in enumerate(rmeta["streams"]):
                            for gi, sm in enumerate(segs):
                                names = stream_array_names(sm["dims"][4])
                                p = f"s{i}g{gi}_"
                                packed = tuple(
                                    d[p + n] for n in names
                                ) + (d[p + "base"], d[p + "byt"],
                                     d[p + "lt"])
                                yseg = spmv_routed_stream_batched_pallas(
                                    packed, sm["dims"], xb2d, nytp,
                                    panel_b, interpret=interp,
                                )
                                y2d = (
                                    yseg if y2d is None else y2d + yseg
                                )
                        if y2d is None:
                            yp = jnp.zeros(
                                (panel_b, nytp * 1024), jnp.float32
                            )
                        else:
                            yp = y2d.reshape(panel_b, -1)
                        if "r_rows" in d:  # small residual: scatter
                            contrib = d["r_vals"][None, :] * jnp.take(
                                xpan, d["r_cols"], axis=1
                            )
                            yp = yp.at[:, d["r_rows"]].add(contrib)
                        if res_plan is not None:  # large residual: ELLX
                            rd = {
                                "base_data": d["r_base_data"],
                                "base_cols": d["r_base_cols"],
                            }
                            if "r_odata" in d:
                                rd["odata"] = d["r_odata"]
                                rd["ometa"] = d["r_ometa"]
                                rd["ov_expand"] = d["r_ov_expand"]
                            xt = xpan.T.reshape(-1, LANES, panel_b)
                            yr = ellx_matvec_batched(
                                rd, xt, res_plan.num_row_blocks, 1,
                                rchunk, res_ov, interpret=interp,
                            ).reshape(-1, panel_b)[:R]  # [R, P]
                            yp = yp.at[:, :R].add(yr.T)
                        ys.append(yp[:, :R])
                    y = jnp.concatenate(ys, axis=0)[:B]
                    return y if bias is None else y + bias[None, :]

        elif fmt == "window":
            from hispmv_tpu.ops.spmv_windowed import (
                pack_batch_x,
                spmv_windowed_batched_pallas,
            )

            plan = self._window_plan_meta
            nrb = plan.num_row_blocks
            bh = plan.block_h
            wchunk = self._wchunk
            nwin = plan.num_windows
            # wide-gather kernel: panel of <=64 vectors (verified gather
            # width) whose x[P]+y[P] fit VMEM; larger batches TILE the
            # batch dimension over such panels (A re-streamed once per
            # panel, NOT once per vector — the runLinear double-buffering
            # contract, fpga_handle.cpp:323-388)
            panel_b = 64
            while panel_b > 1 and (
                (nwin * 8 * LANES + nrb * bh) * panel_b * 4
                + 2 * wchunk * (bh + 1) * LANES * 4
                > self._CHUNKED_VMEM_BUDGET
            ):
                panel_b //= 2

            def run(d, xb, bias):
                B = xb.shape[0]
                if panel_b > 1:
                    ys = []
                    for b0 in range(0, B, panel_b):
                        xp_part = xb[b0: b0 + panel_b]
                        xp = pack_batch_x(xp_part, nwin)
                        yp = spmv_windowed_batched_pallas(
                            d["data"], d["subidx"], d["meta"], xp,
                            nrb, bh, wchunk, interpret=interp,
                        )  # [nrb, bh, P]
                        ys.append(
                            yp.reshape(-1, xp_part.shape[0])[:R].T
                        )
                    y = jnp.concatenate(ys, axis=0)
                else:
                    # degenerate VMEM budget: per-vector kernel calls
                    ys = [
                        spmv_windowed_pallas(
                            d["data"], d["subidx"], d["meta"],
                            xb[b].reshape(-1, LANES), nrb, bh, wchunk,
                            interpret=interp,
                        ).reshape(-1)[:R]
                        for b in range(B)
                    ]
                    y = jnp.stack(ys)
                return y if bias is None else y + bias[None, :]

        else:  # stream: vmap the single-vector path over the batch
            plan = self._stream_plan_meta

            def run(d, xb, bias):
                y = jax.vmap(
                    lambda x: spmv_xla(
                        d["vals"], d["cols"], d["round_ids"], d["seg_rows"],
                        plan.num_rounds, R, x,
                    )
                )(xb)
                return y if bias is None else y + bias[None, :]

        return jax.jit(run), args

    def linear(self, x_batch, bias=None) -> jax.Array:
        """Batched ``y[B,R] = x[B,C] @ A.T + bias`` — the DNN-layer entry
        point (runLinear contract, fpga_handle.cpp:323-388)."""
        xb = jnp.asarray(x_batch, jnp.float32)
        squeeze = xb.ndim == 1
        if squeeze:
            xb = xb[None, :]
        xb = self._pad_x(xb)
        B = int(xb.shape[0])
        if B not in self._batch_runners:
            self._batch_runners[B] = self._make_batch_runner(B)
        runner, args = self._batch_runners[B]
        bias = None if bias is None else jnp.asarray(bias, jnp.float32)
        y = runner(args, xb, bias)
        return y[0] if squeeze else y

    def verify(self, x=None, rtol=1e-3, atol=1e-5):
        """Golden check vs the host matrix (cpuSequential + printErrorStats
        analog, spmv-helper.cpp:812-895)."""
        from hispmv_tpu.utils.errors import error_stats

        if x is None:
            i = np.arange(self.shape[1], dtype=np.float32)
            x = (i + 2.0) / (i + 1.0)  # spmv-host.cpp:17-23 test vector
        got = np.asarray(self.run(x))
        if self.coo is not None:
            want = self.coo.matvec(np.asarray(x, np.float64))
        else:
            dense = np.asarray(self._dense)[: self.shape[0], : self.shape[1]]
            want = dense.astype(np.float64) @ np.asarray(x, np.float64)
        return error_stats(got, want, rtol=rtol, atol=atol)


def choose_format(coo: COOMatrix, config: SpmvConfig) -> str:
    """Cheap structural dispatch (full cost-model DSE in hispmv_tpu.tune).

    Mirrors the reference's density rule (fpga_layer_manager.py:40-47:
    density > 0.5 -> dense) plus a block-fill estimate for the middle
    ground.
    """
    if config.dense_overlay:
        return "dense"
    density = coo.nnz / max(coo.num_rows * coo.num_cols, 1)
    if density > 0.25:
        return "dense"
    # Estimate 8x128 block fill from a sample of coordinates.
    n = coo.nnz
    if n == 0:
        return "stream"
    take = min(n, 250_000)
    idx = np.linspace(0, n - 1, take).astype(np.int64)
    rb = coo.rows[idx] // config.block_h
    cb = coo.cols[idx] // LANES
    ncb = max(-(-coo.num_cols // LANES), 1)
    uniq = len(np.unique(rb.astype(np.int64) * ncb + cb))
    est_blocks = uniq * (n / take)
    est_fill = n / (est_blocks * config.block_h * LANES)
    # Low plain-block fill -> the windowed format (merges scattered blocks
    # via per-lane sub-index gathering); VERY low fill (hypersparse) -> the
    # scalar-free ELLX engine, whose per-unit cost is ~4x lower than any
    # Pallas block step.  The gather stream is never picked automatically
    # on TPU (measured ~0.1 Gnnz/s, see tune/cost.py).
    if est_fill >= config.min_block_fill:
        return "block"
    return "window" if est_fill >= 0.01 else "ellx"


def prepare(
    matrix: Union[COOMatrix, np.ndarray],
    config: Optional[SpmvConfig] = None,
    format: str = "auto",  # noqa: A002
) -> SpmvHandle:
    """Module-level convenience: prepare a matrix for repeated execution."""
    return SpmvHandle(matrix, config=config, format=format)


class Accelerator:
    """Multi-matrix residency + selection + batched linear.

    The FpgaHandle analog (pyhispmv/src/fpga_handle.cpp): create handles for
    many matrices up front, keep them device-resident, then run any of them
    back-to-back.  Device "allocation" is JAX arrays held by this registry;
    ``budget_bytes`` imitates the reference's fixed 256 MiB-per-channel
    arena (fpga_handle.h:12) by refusing new matrices past the budget.
    """

    def __init__(self, budget_bytes: Optional[int] = None):
        self.budget_bytes = budget_bytes
        self._handles: Dict[int, SpmvHandle] = {}
        self._next_id = 0
        self._selected: Optional[int] = None
        self.loaded = False

    @property
    def resident_bytes(self) -> int:
        return sum(h.device_bytes for h in self._handles.values())

    def create_sparse_handle(
        self,
        coo: COOMatrix,
        config: Optional[SpmvConfig] = None,
        format: str = "auto",  # noqa: A002
    ) -> int:
        """Returns a matrix id, or -1 if the memory budget is exhausted
        (fpga_handle.cpp:192-195 contract)."""
        h = SpmvHandle(coo, config=config, format=format)
        return self._register(h)

    def create_dense_handle(self, arr: np.ndarray) -> int:
        h = SpmvHandle(np.asarray(arr))
        return self._register(h)

    def _register(self, h: SpmvHandle) -> int:
        if (
            self.budget_bytes is not None
            and self.resident_bytes + h.device_bytes > self.budget_bytes
        ):
            return -1
        mid = self._next_id
        self._next_id += 1
        self._handles[mid] = h
        if self._selected is None:
            self._selected = mid
        return mid

    def load_matrices(self) -> None:
        """Parity with the reference's one-shot sync (fpga_handle.cpp:
        252-264); arrays are already device-resident, so this just blocks
        until uploads complete."""
        for h in self._handles.values():
            if hasattr(h, "_d"):
                jax.block_until_ready(list(h._d.values()))
            elif hasattr(h, "_dense"):
                jax.block_until_ready(h._dense)
        self.loaded = True

    def select_matrix(self, mid: int) -> None:
        if mid not in self._handles:
            raise KeyError(f"unknown matrix id {mid}")
        self._selected = mid

    def handle(self, mid: Optional[int] = None) -> SpmvHandle:
        mid = self._selected if mid is None else mid
        if mid is None:
            raise RuntimeError("no matrix loaded")
        return self._handles[mid]

    def run_kernel(self, x, y_in=None, alpha=1.0, beta=0.0) -> jax.Array:
        return self.handle().run(x, y_in=y_in, alpha=alpha, beta=beta)

    def linear(self, mid: int, x_batch, bias=None) -> jax.Array:
        return self.handle(mid).linear(x_batch, bias=bias)

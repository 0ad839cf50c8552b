"""Canonical configuration object for a prepared SpMV/GeMV design.

TPU-native analog of the reference's ``SpMVConfig`` dataclass and its
``[Dense-][PA-][HI-]SpMV-A-B-C`` name encoding
(reference automation_tool/src/commons.py:21-78).  Where the reference picks
FPGA channel counts and crossbar options, we pick VPU lane-grid geometry,
x-window size, accumulator depth and the long-row split threshold — the knobs
the autotuner (``hispmv_tpu.tune``) searches per matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SpmvConfig:
    """Static design parameters of one prepared matrix execution plan.

    Attributes:
      sublanes: VPU sublane count of the virtual PE grid (8 for fp32 tiles).
      lanes: VPU lane count of the virtual PE grid (always 128 on TPU).
      window: x-vector window staged in VMEM, in fp32 elements.  Analog of the
        reference's ``B_WINDOW = B_PART*1024`` BRAM window
        (assets/spmv.h:30-32); matrices wider than this are column-tiled.
      depth: number of row-segment accumulator slots per virtual PE.  Analog
        of ``MAX_ROWS_PER_PE = URAMS_PER_PE*4096`` URAM depth
        (assets/spmv.h:35), but small: the Pallas kernel keeps ``depth``
        accumulator planes of shape (sublanes, lanes) in VMEM/registers.
      split_threshold: rows with more nonzeros than this are split into
        multiple segments processed by different PEs — the "shared row" /
        hybrid-row-distribution analog (spmv-helper.cpp:265-347).  ``None``
        lets the planner derive it from the load distribution.
      dense_overlay: if True the handle dispatches to the fused dense GeMV
        path instead of the sparse stream (BUILD_DENSE_OVERLAY analog,
        assets/base_functions.cpp:174-226).
      dual_accumulate: keep two interleaved accumulators per PE and merge at
        the end, breaking the fp-add dependency chain between consecutive
        stream steps — the Pre-Accumulator / adder-chain analog
        (assets/base_functions.cpp:257-353).
      index_dtype: dtype name for window-local column indices ("int16" when
        window <= 32768, else "int32"); determines stream bytes/nnz.
      block_h: block height for the block-ELL format (rows per dense
        (block_h, 128) sub-block); 8/16/32 are natural vreg tiles.
      col_reorder: apply the degree-based column permutation before block
        extraction (densifies power-law matrices; x is permuted at run time).
      min_block_fill: minimum estimated block fill for the "auto" format
        dispatch to pick the block path over the gather stream.
    """

    sublanes: int = 8
    lanes: int = 128
    window: int = 2048
    depth: int = 4
    split_threshold: Optional[int] = None
    dense_overlay: bool = False
    dual_accumulate: bool = True
    index_dtype: str = "int32"
    block_h: int = 8
    col_reorder: bool = False
    min_block_fill: float = 0.125
    value_dtype: str = "float32"  # "bfloat16" halves A bytes (fp32 accum)

    @property
    def num_pes(self) -> int:
        return self.sublanes * self.lanes

    def __post_init__(self):
        if self.lanes % 128 != 0:
            raise ValueError("lanes must be a multiple of 128 (TPU lane width)")
        if self.window % self.lanes != 0:
            raise ValueError("window must be a multiple of the lane width")
        if self.depth < 1:
            raise ValueError("depth must be >= 1")


def encode_config_name(cfg: SpmvConfig) -> str:
    """Human-readable design name, analog of ``encodeSpMVConfig``
    (automation_tool/src/commons.py:60-78)."""
    parts = []
    if cfg.dense_overlay:
        parts.append("Dense")
    if cfg.dual_accumulate:
        parts.append("DA")  # dual-accumulate ~ the reference's "PA"
    if cfg.value_dtype == "bfloat16":
        parts.append("BF16")
    parts.append(f"SpMV-{cfg.num_pes}p-w{cfg.window}-d{cfg.depth}")
    return "-".join(parts)

"""Native (C++) preprocessing acceleration, loaded via ctypes.

The shared library is compiled on first use with the system g++ (cached
next to this file); every entry point has a pure-numpy fallback, so the
package works without a toolchain.  Analog of the reference's C++ host
library role (common/src/spmv-helper.cpp hot loops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hispmv_native.cpp")
_SO = os.path.join(_HERE, f"_hispmv_native_{sys.implementation.cache_tag}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    # Portable -O3 (no -march=native): the .so may be produced on one host
    # and reused on another; ISA-specific codegen would SIGILL there.
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return _SO
    except Exception:
        # toolchains without OpenMP still get the serial build
        try:
            subprocess.run(
                [c for c in cmd if c != "-fopenmp"],
                check=True, capture_output=True, timeout=120,
            )
            return _SO
        except Exception:
            return None


def _stale() -> bool:
    """True when the source is newer than the built library (edits to the
    .cpp must trigger a rebuild, not be silently ignored)."""
    try:
        return os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    except OSError:
        return True


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("HISPMV_NO_NATIVE"):
            return None
        path = _SO if (os.path.exists(_SO) and not _stale()) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.parse_mtx_body.restype = ctypes.c_longlong
        lib.parse_mtx_body.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pack_blocks_count.restype = ctypes.c_void_p
        lib.pack_blocks_count.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.pack_blocks_fill.restype = None
        lib.pack_blocks_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.pack_blocks_free.restype = None
        lib.pack_blocks_free.argtypes = [ctypes.c_void_p]
        lib.euler_color.restype = ctypes.c_int
        lib.euler_color.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.greedy_cell_merge.restype = ctypes.c_longlong
        lib.greedy_cell_merge.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.radix_argsort_u64.restype = None
        lib.radix_argsort_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
        ]
        lib.distinct_rank_u64.restype = None
        lib.distinct_rank_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_ulonglong,
            ctypes.c_void_p,
        ]
        lib.routed_tile_stats.restype = None
        lib.routed_tile_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_mtx_body(
    body: bytes, expect: int, has_value: bool
):
    """Parse a MatrixMarket coordinate body; returns (rows, cols, vals) or
    None if the native library is unavailable or the body is malformed."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.empty(expect, np.int32)
    cols = np.empty(expect, np.int32)
    vals = np.empty(expect, np.float32)
    n = lib.parse_mtx_body(
        body, len(body), expect, int(has_value),
        _ptr(rows), _ptr(cols), _ptr(vals),
    )
    if n != expect:
        return None
    return rows, cols, vals


def greedy_cell_merge(
    strip: np.ndarray, bc: np.ndarray, cap: int
) -> Optional[np.ndarray]:
    """Greedy same-strip cell merging (plan/routed.py group loop): returns
    int64 group ids per cell, or None when the native library is
    unavailable (callers fall back to the pure-Python loop)."""
    lib = get_lib()
    if lib is None:
        return None
    strip = np.ascontiguousarray(strip, np.int64)
    bc = np.ascontiguousarray(bc, np.int64)
    gid = np.empty(len(strip), np.int64)
    lib.greedy_cell_merge(
        _ptr(strip), _ptr(bc), len(strip), int(cap), _ptr(gid)
    )
    return gid


def euler_color(
    sw: np.ndarray, dw: np.ndarray, d: int
) -> Optional[np.ndarray]:
    """Proper d-edge-coloring of a d-regular bipartite multigraph via
    recursive Euler splits (permutation-plan stage construction,
    plan/permute.py).  Returns int32 colors or None when the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    sw = np.ascontiguousarray(sw, np.int32)
    dw = np.ascontiguousarray(dw, np.int32)
    colors = np.empty(len(sw), np.int32)
    rc = lib.euler_color(_ptr(sw), _ptr(dw), len(sw), int(d), _ptr(colors))
    if rc != 0:
        return None
    return colors


def radix_argsort(keys: np.ndarray) -> Optional[np.ndarray]:
    """Stable parallel argsort of uint64/int64 keys (LSD radix, OpenMP);
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, np.uint64)
    order = np.empty(len(keys), np.int64)
    lib.radix_argsort_u64(_ptr(keys), len(keys), _ptr(order))
    return order


def distinct_rank(key: np.ndarray, width: int) -> Optional[np.ndarray]:
    """Per entry: #distinct key values preceding it within its group
    (group = key // width; entries sharing a key share a rank).  Mirrors
    plan/routed.py::_distinct_rank; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, np.uint64)
    rank = np.empty(len(key), np.int64)
    lib.distinct_rank_u64(_ptr(key), len(key), int(width), _ptr(rank))
    return rank


def routed_tile_stats(
    p_win: np.ndarray, p_band: np.ndarray, pad: np.ndarray
):
    """Per-tile (nnz, wmin, span, distinct bands) over contiguous
    1024-slot tiles in one parallel pass; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(p_win)
    T = n // 1024
    p_win = np.ascontiguousarray(p_win, np.int32)
    p_band = np.ascontiguousarray(p_band, np.int32)
    pad = np.ascontiguousarray(pad, np.uint8)
    nnz_t = np.empty(T, np.int32)
    wmin_t = np.empty(T, np.int32)
    span_t = np.empty(T, np.int32)
    band_t = np.empty(T, np.int32)
    lib.routed_tile_stats(
        _ptr(p_win), _ptr(p_band), _ptr(pad), T,
        _ptr(nnz_t), _ptr(wmin_t), _ptr(span_t), _ptr(band_t),
    )
    return nnz_t, wmin_t, span_t, band_t


def pack_blocks(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    block_h: int,
    ncb: int,
):
    """Native block packing; returns (block_rows, block_cols, data) sorted by
    (row_block, col_block), or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    nnz = len(rows)
    nb = ctypes.c_longlong(0)
    ctx = lib.pack_blocks_count(
        _ptr(rows), _ptr(cols), nnz, block_h, ncb, ctypes.byref(nb)
    )
    try:
        nblocks = int(nb.value)
        block_rows = np.empty(nblocks, np.int32)
        block_cols = np.empty(nblocks, np.int32)
        data = np.zeros((nblocks, block_h, 128), np.float32)
        lib.pack_blocks_fill(
            ctx, _ptr(rows), _ptr(cols), _ptr(vals), nnz, block_h, ncb,
            _ptr(block_rows), _ptr(block_cols), _ptr(data),
        )
    finally:
        lib.pack_blocks_free(ctx)
    return block_rows, block_cols, data


"""Routed-stream planner: per-nnz vectorized SpMV with plan-time routing.

THE load-balance/crossbar answer for scattered matrices, round 2.  Every
other format pays either ~4 KiB of payload per touched (block, window)
unit or ~1.8 ns per gathered unit — both collapse when units ~= nnz.  This
format processes nnz at VECTOR rate with ~16-36 B/nnz of stream traffic by
resolving ALL routing at plan time (the role the reference's butterfly
crossbar + out-of-order scheduler play in hardware,
base_functions.cpp:356-436 + spmv-helper.cpp:429-515):

- nnz are sorted by (1024-row band, 1024-column window, row) and packed
  into (8,128) tiles of 1024 SLOTS — one tile reads ONE (8,128) x window
  slice and accumulates into ONE (8,128) y tile;
- pass 1 (x gather): slot (s,j) reads x[win*1024 + sub*128 + lane] via the
  two supported in-tile gathers — a sublane take_along_axis composed with
  a lane take_along_axis: out[s,j] = win8[sub1[s, lane1[s,j]], lane1[s,j]].
  The planner guarantees the composition is consistent (per payload row
  and source lane, one distinct source sublane); conflicting nnz (a few
  percent) are evicted to a COO residual handled by the caller;
- pass 2 (segmented reduce): products are prefix-summed over the flat tile
  order (lane prefix via a triangular MXU matmul + sublane carry), and
  each row-run's sum is extracted as P'[end] - P'[start-1];
- pass 3 (y accumulate): boundary values are routed straight into y tile
  slots by further plan-built gather LAYERS: layer k of a tile is one
  (8,128) two-level gather from the prefix tile, signed (+end / -start),
  added into y rows [yt*1024, yt*1024+1024).  A row spanning several tiles
  or windows simply accumulates multiple partials.

Stream cost: vals 4 B + pass-1 route 8 B + ~2 signed layers ~16 B
= ~28 B/nnz (before padding), all consumed by ~50 vector ops per 1024
nnz — no per-nnz scalar work anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hispmv_tpu.formats.matrix import COOMatrix

WINDOW = 1024  # columns per window = one (8,128) x tile
TILE = 1024  # nnz slots per tile (8 sublanes x 128 lanes)


@dataclasses.dataclass
class RoutedPlan:
    shape: tuple
    nnz: int
    num_tiles: int
    l1: int  # pass-1 gather layers
    lmax: int  # pass-3 boundary layers
    num_windows: int
    num_ytiles: int
    vals: np.ndarray  # f32 [T, L1, 8, 128] per-layer slot values
    lane1: np.ndarray  # i32 [T, L1, 8, 128] pass-1 source lane per slot
    sub1: np.ndarray  # i32 [T, L1, 8, 128] source sublane BY SOURCE LANE
    win: np.ndarray  # i32 [T] window id per tile
    blane: np.ndarray  # i32 [T, L, 8, 128] '+' source lane | valid<<7
    bsub: np.ndarray  # i32 [T, L, 8, 128] '+' source sublane BY SOURCE LANE
    blane_b: np.ndarray  # i32 [T, L, 8, 128] '-' source lane | valid<<7
    bsub_b: np.ndarray  # i32 [T, L, 8, 128] '-' source sublane BY SRC LANE
    byt: np.ndarray  # i32 [T] y tile (row band) per tile
    residual_rows: np.ndarray  # conflict-evicted nnz (COO)
    residual_cols: np.ndarray
    residual_vals: np.ndarray

    @property
    def stream_bytes(self) -> int:
        return (
            self.vals.nbytes + self.lane1.nbytes + self.sub1.nbytes
            + self.blane.nbytes + self.bsub.nbytes
            + self.blane_b.nbytes + self.bsub_b.nbytes
        )

    @property
    def fill(self) -> float:
        slots = self.num_tiles * TILE
        return (self.nnz - len(self.residual_vals)) / max(slots, 1)


def build_routed_plan(
    coo: COOMatrix, min_group: int = 16
) -> RoutedPlan:
    R, C = coo.shape
    nwin = max(-(-C // WINDOW), 1)
    nyt = max(-(-R // WINDOW), 1)

    rows = coo.rows.astype(np.int64)
    cols = coo.cols.astype(np.int64)
    vals = coo.values.astype(np.float32)

    win = cols // WINDOW
    band = rows // WINDOW
    order = np.lexsort((cols, rows, win, band))
    rows, cols, vals = rows[order], cols[order], vals[order]
    win, band = win[order], band[order]

    # ---- drop sparse (band, window) groups to the residual ---------------
    # Uniform background noise creates thousands of near-empty groups
    # (measured 100x tile fragmentation on circuit fixtures); groups with
    # fewer than ``min_group`` nnz cost more as padded tiles (~170 ns
    # each) than as residual entries (~16 ns/nnz element scatter).
    gkey0 = band * nwin + win
    _, gstart0, ginv = np.unique(
        gkey0, return_index=True, return_inverse=True
    )
    gsize0 = np.diff(np.concatenate([gstart0, [len(rows)]]))
    sparse_grp = gsize0[ginv] < min_group
    res0_rows = rows[sparse_grp]
    res0_cols = cols[sparse_grp]
    res0_vals = vals[sparse_grp]
    keep0 = ~sparse_grp
    rows, cols, vals = rows[keep0], cols[keep0], vals[keep0]
    win, band = win[keep0], band[keep0]

    if len(rows) == 0:
        # fully-residual degenerate plan: one empty tile
        return RoutedPlan(
            shape=(R, C), nnz=coo.nnz, num_tiles=1, l1=1, lmax=1,
            num_windows=nwin, num_ytiles=nyt,
            vals=np.zeros((1, 1, 8, 128), np.float32),
            lane1=np.zeros((1, 1, 8, 128), np.int32),
            sub1=np.zeros((1, 1, 8, 128), np.int32),
            win=np.zeros(1, np.int32),
            blane=np.zeros((1, 1, 8, 128), np.int32),
            bsub=np.zeros((1, 1, 8, 128), np.int32),
            blane_b=np.zeros((1, 1, 8, 128), np.int32),
            bsub_b=np.zeros((1, 1, 8, 128), np.int32),
            byt=np.zeros(1, np.int32),
            residual_rows=res0_rows, residual_cols=res0_cols,
            residual_vals=res0_vals,
        )

    # ---- pad each (row band, window) group to whole tiles ---------------
    # One group -> one x window AND one y tile: every tile reads one
    # (8,128) x slice and writes one (8,128) y slice (lmax stays tiny).
    gkey = band * nwin + win
    _, gstart = np.unique(gkey, return_index=True)
    gsize = np.diff(np.concatenate([gstart, [len(rows)]]))
    gpad = -(-gsize // TILE) * TILE
    T = int(gpad.sum() // TILE)
    N = T * TILE

    # destination position of each real nnz in the padded stream
    goff = np.concatenate([[0], np.cumsum(gpad)])[:-1]
    within = np.arange(len(rows)) - np.repeat(gstart, gsize)
    pos = np.repeat(goff, gsize) + within

    p_rows = np.full(N, -1, np.int64)
    p_cols = np.zeros(N, np.int64)
    p_vals = np.zeros(N, np.float32)
    p_rows[pos] = rows
    p_cols[pos] = cols
    p_vals[pos] = vals
    # padding slots extend the previous row's run with zeros (no extra
    # boundary needed) — set their row to the preceding real row
    pad_mask = p_rows < 0
    if pad_mask.any():
        idx = np.where(~pad_mask, np.arange(N), 0)
        np.maximum.accumulate(idx, out=idx)
        p_rows = p_rows[idx]
        # a window group that is entirely padding (can't happen: groups come
        # from real nnz) — leading pad impossible since groups start real

    tile_of = np.arange(N) // TILE
    s_of = (np.arange(N) % TILE) // 128
    j_of = np.arange(N) % 128

    tile_win = np.zeros(T, np.int32)
    tile_win[tile_of[pos].astype(np.int64)] = win.astype(np.int32)
    tile_band = np.zeros(T, np.int32)
    tile_band[tile_of[pos].astype(np.int64)] = band.astype(np.int32)

    # ---- pass-1 routing: LAYERED gather assignments ---------------------
    # A (payload row, source lane) pair can serve only one source sublane
    # per gather layer; nonzeros whose (lane -> sub) need conflicts with
    # earlier ones go to the next layer (each layer = one more composed
    # gather + multiply in the kernel).  Padding slots (vals 0) are
    # excluded.  Ranks beyond L1_CAP go to the COO residual.
    L1_CAP = 4
    src_lane = (p_cols % 128).astype(np.int32)
    src_sub = ((p_cols // 128) % 8).astype(np.int32)
    real = np.nonzero(~pad_mask)[0]
    prow_r = (tile_of * 8 + s_of)[real]  # payload-row id of real slots
    lane_r = src_lane[real].astype(np.int64)
    sub_r = src_sub[real].astype(np.int64)
    okey = np.lexsort((sub_r, lane_r, prow_r))
    pl_key = (prow_r * 128 + lane_r)[okey]
    new_pl = np.ones(len(real), bool)
    new_pl[1:] = pl_key[1:] != pl_key[:-1]
    new_sub1 = np.ones(len(real), bool)
    new_sub1[1:] = new_pl[1:] | (sub_r[okey][1:] != sub_r[okey][:-1])
    did = np.cumsum(new_sub1) - 1
    first_did = np.where(new_pl, did, 0)
    np.maximum.accumulate(first_did, out=first_did)
    rank_r_sorted = did - first_did  # distinct-sub rank per (prow, lane)
    rank_r = np.empty(len(real), np.int64)
    rank_r[okey] = rank_r_sorted

    evict_r = rank_r >= L1_CAP
    evict = np.zeros(N, bool)
    evict[real] = evict_r
    residual_rows = p_rows[evict].astype(np.int64)  # merged with res0 below
    residual_cols = p_cols[evict]
    residual_vals = p_vals[evict].copy()
    p_vals = np.where(evict, 0.0, p_vals)

    L1 = int(min(rank_r.max() + 1 if len(rank_r) else 1, L1_CAP))
    keep = real[~evict_r]
    krank = rank_r[~evict_r]
    vals4 = np.zeros((T, L1, 8, 128), np.float32)
    lane1 = np.zeros((T, L1, 8, 128), np.int32)
    sub1 = np.zeros((T, L1, 8, 128), np.int32)
    # layer 0 holds every slot's value by default position 0?  No: each
    # kept nnz contributes at ITS OWN slot in ITS rank layer (the slot
    # position — hence the run structure — never moves; only the gather
    # that feeds it is layered).
    vals4[tile_of[keep], krank, s_of[keep], j_of[keep]] = p_vals[keep]
    lane1[tile_of[keep], krank, s_of[keep], j_of[keep]] = src_lane[keep]
    sub1[tile_of[keep], krank, s_of[keep], src_lane[keep]] = src_sub[keep]
    vals3 = vals4

    # ---- row runs & boundary entries -----------------------------------
    brk = np.ones(N, bool)
    brk[1:] = (p_rows[1:] != p_rows[:-1]) | (np.arange(1, N) % TILE == 0)
    starts = np.nonzero(brk)[0]
    ends = np.concatenate([starts[1:], [N]]) - 1
    run_rows = p_rows[starts]
    keep = run_rows >= 0  # drop all-padding leading runs (none expected)
    starts, ends, run_rows = starts[keep], ends[keep], run_rows[keep]

    # Boundary entries per run: '+' reads P'[end]; '-' reads P'[start-1]
    # when the run does not start the tile.  The two sides form
    # INDEPENDENT layer series (their routing constraints are separate);
    # layer = distinct-sub rank within (tile, out row, source lane).
    # Out slots (sy, jy) are unique per tile: a row runs once per tile and
    # rows within a tile live in one 1024-row band.
    e_tile = (starts // TILE).astype(np.int64)
    e_ypos = run_rows
    a_src = (ends % TILE).astype(np.int64)
    has_b = (starts % TILE) != 0
    b_src = np.where(has_b, (starts - 1) % TILE, 0).astype(np.int64)

    sy = ((e_ypos % WINDOW) // 128).astype(np.int64)
    jy = (e_ypos % 128).astype(np.int64)
    a_lane, a_sub = a_src % 128, a_src // 128
    b_lane, b_sub = b_src % 128, b_src // 128

    def _distinct_rank(lane, sub):
        grp = (e_tile * 8 + sy) * 128 + lane
        o3 = np.lexsort((sub, grp))
        g_s, sub_s = grp[o3], sub[o3]
        new_g = np.ones(len(o3), bool)
        new_g[1:] = g_s[1:] != g_s[:-1]
        new_sub = np.ones(len(o3), bool)
        new_sub[1:] = new_g[1:] | (sub_s[1:] != sub_s[:-1])
        did = np.cumsum(new_sub) - 1
        fd = np.where(new_g, did, 0)
        np.maximum.accumulate(fd, out=fd)
        rank = np.empty(len(e_tile), np.int64)
        rank[o3] = did - fd
        return rank

    rank_a = _distinct_rank(a_lane, a_sub)
    # rank b only among entries that HAVE a '-' side
    rank_b = np.zeros(len(e_tile), np.int64)
    if has_b.any():
        eb_t, eb_sy = e_tile[has_b], sy[has_b]
        bl, bs_ = b_lane[has_b], b_sub[has_b]
        grp = (eb_t * 8 + eb_sy) * 128 + bl
        o3 = np.lexsort((bs_, grp))
        g_s, sub_s = grp[o3], bs_[o3]
        new_g = np.ones(len(o3), bool)
        new_g[1:] = g_s[1:] != g_s[:-1]
        new_sub = np.ones(len(o3), bool)
        new_sub[1:] = new_g[1:] | (sub_s[1:] != sub_s[:-1])
        did = np.cumsum(new_sub) - 1
        fd = np.where(new_g, did, 0)
        np.maximum.accumulate(fd, out=fd)
        rb = np.empty(int(has_b.sum()), np.int64)
        rb[o3] = did - fd
        rank_b[has_b] = rb

    La = int(rank_a.max()) + 1 if len(rank_a) else 1
    Lb = int(rank_b[has_b].max()) + 1 if has_b.any() else 0
    L = max(La, Lb, 1)

    blane = np.zeros((T, L, 8, 128), np.int32)
    bsub = np.zeros((T, L, 8, 128), np.int32)
    blane_b = np.zeros((T, L, 8, 128), np.int32)
    bsub_b = np.zeros((T, L, 8, 128), np.int32)
    blane[e_tile, rank_a, sy, jy] = (a_lane | (1 << 7)).astype(np.int32)
    bsub[e_tile, rank_a, sy, a_lane] = a_sub.astype(np.int32)
    blane_b[e_tile[has_b], rank_b[has_b], sy[has_b], jy[has_b]] = (
        b_lane[has_b] | (1 << 7)
    ).astype(np.int32)
    bsub_b[e_tile[has_b], rank_b[has_b], sy[has_b], b_lane[has_b]] = (
        b_sub[has_b].astype(np.int32)
    )
    byt = tile_band.copy()

    return RoutedPlan(
        shape=(R, C),
        nnz=coo.nnz,
        num_tiles=T,
        l1=L1,
        lmax=L,
        num_windows=nwin,
        num_ytiles=nyt,
        vals=vals3,
        lane1=lane1,
        sub1=sub1,
        win=tile_win,
        blane=blane,
        bsub=bsub,
        blane_b=blane_b,
        bsub_b=bsub_b,
        byt=byt,
        residual_rows=np.concatenate([residual_rows, res0_rows]),
        residual_cols=np.concatenate([residual_cols, res0_cols]),
        residual_vals=np.concatenate([residual_vals, res0_vals]),
    )


def routed_matvec_numpy(plan: RoutedPlan, x: np.ndarray) -> np.ndarray:
    """Golden numpy executor mirroring the kernel's exact dataflow
    (float64 accumulate), incl. the residual COO."""
    R, C = plan.shape
    xp = np.zeros(plan.num_windows * WINDOW, np.float64)
    xp[:C] = x
    x2d = xp.reshape(plan.num_windows * 8, 128)
    y = np.zeros(plan.num_ytiles * WINDOW, np.float64)
    lanes = np.arange(128)

    for t in range(plan.num_tiles):
        win8 = x2d[plan.win[t] * 8 : plan.win[t] * 8 + 8]  # (8,128)
        # pass 1: one composed gather + multiply per layer
        p = np.zeros((8, 128), np.float64)
        for l in range(plan.l1):
            t1 = win8[plan.sub1[t, l], lanes[None, :]]  # sublane TAA
            xg = np.take_along_axis(t1, plan.lane1[t, l], axis=1)
            p += plan.vals[t, l].astype(np.float64) * xg
        # pass 2: flat prefix
        pf = np.cumsum(p.reshape(-1))
        pf2 = pf.reshape(8, 128)
        # pass 3: boundary layers, each reading +P'[end] - P'[start-1]
        for k in range(plan.lmax):
            rawa = plan.blane[t, k]
            ga = np.take_along_axis(
                pf2[plan.bsub[t, k], lanes[None, :]], rawa & 127, axis=1
            ) * (rawa >> 7)
            rawb = plan.blane_b[t, k]
            gb = np.take_along_axis(
                pf2[plan.bsub_b[t, k], lanes[None, :]], rawb & 127, axis=1
            ) * (rawb >> 7)
            base = plan.byt[t] * WINDOW
            y[base : base + WINDOW] += (ga - gb).reshape(-1)

    if len(plan.residual_vals):
        np.add.at(
            y, plan.residual_rows,
            plan.residual_vals.astype(np.float64) * x[plan.residual_cols],
        )
    return y[:R].astype(np.float32)

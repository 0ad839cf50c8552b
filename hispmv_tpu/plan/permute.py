"""Fast arbitrary-permutation plans: 3 within-window stages + 2 transposes.

TPUs have no fast element gather (measured 0.10-0.14 Gelem/s via XLA
gather), but they DO have two fast primitives:

- within-(8,128)-tile two-level gathers (sublane take_along_axis composed
  with lane take_along_axis) — the machinery the routed-stream kernel uses
  for pass 1 (ops/spmv_routed.py), ~4 ns per (8,128) tile per layer;
- XLA 2-D transposes, which run near memory speed.

Any permutation of ``N = W * 1024`` elements (``W <= 1024``) decomposes
into three stages that each permute WITHIN a 1024-element window, with a
transpose between stages (the classic Benes/Hall routing argument):

    y = S3( T( S2( T( S1(x) ) ) ) )

where S1 permutes within the W source windows, S2 within the 1024 rows of
the transposed (1024, W) view, and S3 within the W destination windows.
Stage construction needs a proper 1024-edge-coloring of the W-vertex
bipartite multigraph {src_window -> dst_window}; a coloring always exists
(Konig) and is computed by recursive Euler splitting (d = 1024 = 2^10
levels), in native C++ for large N (hispmv_native.euler_color) with a
pure-Python fallback.

A within-window permutation always fits the two-level gather with at most
8 layers (there are only 8 sublanes, and the layer construction assigns
one distinct source sublane per (payload row, source lane) pair per
layer — the same conflict rule as routed pass 1, plan/routed.py:159-176).

This is the plan-time answer to the reference's hardware shuffle networks
(base_functions.cpp:417-436 SSW): data movement is resolved into static
routing tables once, then executed at vector rate.  It is what makes
rank-space (degree-sorted) SpMV execution affordable: x is permuted into
rank space and y back out of it in ~0.1 ns/element instead of ~7-16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

WINDOW = 1024
L1_CAP = 8


# ---------------------------------------------------------------------------
# Bipartite 1024-regular multigraph edge coloring (recursive Euler split)
# ---------------------------------------------------------------------------


def _euler_split_py(sw: np.ndarray, dw: np.ndarray) -> np.ndarray:
    """Split a d-regular (d even) bipartite multigraph into two halves of
    degree d/2 by walking Eulerian circuits with alternating assignment.
    Returns side 0/1 per edge."""
    n = len(sw)
    side = np.zeros(n, np.int8)
    used = np.zeros(n, bool)

    l_order = np.argsort(sw, kind="stable")
    r_order = np.argsort(dw, kind="stable")
    nl = int(sw.max()) + 1 if n else 0
    nr = int(dw.max()) + 1 if n else 0
    l_start = np.searchsorted(sw[l_order], np.arange(nl + 1))
    r_start = np.searchsorted(dw[r_order], np.arange(nr + 1))
    l_cur = l_start[:-1].copy()
    r_cur = r_start[:-1].copy()

    def next_left(v):
        c = l_cur[v]
        end = l_start[v + 1]
        while c < end and used[l_order[c]]:
            c += 1
        l_cur[v] = c
        return l_order[c] if c < end else -1

    def next_right(v):
        c = r_cur[v]
        end = r_start[v + 1]
        while c < end and used[r_order[c]]:
            c += 1
        r_cur[v] = c
        return r_order[c] if c < end else -1

    for seed in range(n):
        if used[seed]:
            continue
        e = seed
        s = 0
        while e >= 0:
            used[e] = True
            side[e] = s
            if s == 0:  # traversed L->R: continue from the right vertex
                e = next_right(dw[e])
            else:  # traversed R->L: continue from the left vertex
                e = next_left(sw[e])
            s ^= 1
    return side


def _color_py(sw: np.ndarray, dw: np.ndarray, d: int) -> np.ndarray:
    """Recursive Euler-split coloring: d colors (d a power of two) such
    that edges sharing a left or right vertex get distinct colors."""
    n = len(sw)
    colors = np.zeros(n, np.int32)
    if d == 1 or n == 0:
        return colors
    side = _euler_split_py(sw, dw)
    for s, base in ((side == 0, 0), (side == 1, d // 2)):
        idx = np.nonzero(s)[0]
        colors[idx] = base + _color_py(sw[idx], dw[idx], d // 2)
    return colors


def color_permutation(sw: np.ndarray, dw: np.ndarray) -> np.ndarray:
    """Edge-color the window multigraph of a padded permutation (every
    window has exactly WINDOW edges on each side).  Uses the native C++
    pass when available (the pure-Python walk is O(N) but slow at
    millions of elements)."""
    from hispmv_tpu import native

    colors = native.euler_color(
        sw.astype(np.int32), dw.astype(np.int32), WINDOW
    )
    if colors is not None:
        return colors
    return _color_py(
        sw.astype(np.int64), dw.astype(np.int64), WINDOW
    )


# ---------------------------------------------------------------------------
# Within-window gather-route packing (shared by all three stages)
# ---------------------------------------------------------------------------


def _distinct_sub_rank(group: np.ndarray, sub: np.ndarray) -> np.ndarray:
    # identical contract to plan/routed.py:_distinct_sub_rank
    key = group * 8 + sub
    o = np.argsort(key, kind="stable")
    k_s = key[o]
    new_s = np.ones(len(o), bool)
    new_s[1:] = k_s[1:] != k_s[:-1]
    new_g = np.ones(len(o), bool)
    new_g[1:] = (k_s[1:] >> 3) != (k_s[:-1] >> 3)
    did = np.cumsum(new_s) - 1
    fd = np.where(new_g, did, 0)
    np.maximum.accumulate(fd, out=fd)
    rank = np.empty(len(group), np.int64)
    rank[o] = did - fd
    return rank


@dataclasses.dataclass
class WindowStage:
    """One within-window permutation stage, packed for the Pallas kernel.

    ``out[w, s, j] = in[w, sub_l(s, lane_l(s, j)), lane_l(s, j)]`` where
    ``l = rank(s, j)`` — the routed pass-1 decode (ops/spmv_routed.py)."""

    num_windows: int
    l1: int
    route: np.ndarray  # i32 [W, 8, 128]: lane 7b/layer (l%4) | rank<<28
    route2: Optional[np.ndarray]  # i32 [W, 8, 128]: lanes for layers 4-7
    rsub: np.ndarray  # i32 [W, 8, 128] per SOURCE lane: sub 3b/layer

    @property
    def stream_bytes(self) -> int:
        n = self.route.nbytes + self.rsub.nbytes
        if self.route2 is not None:
            n += self.route2.nbytes
        return n


def pack_window_stage(src: np.ndarray) -> WindowStage:
    """Pack within-window source indices ``src`` [W, 1024] (each row a
    permutation of 0..1023) into gather-route bitfields."""
    W = src.shape[0]
    src = src.astype(np.int64)
    lane = src % 128
    sub = src // 128
    s_of = np.broadcast_to(
        (np.arange(WINDOW) // 128)[None, :], src.shape
    )
    w_of = np.broadcast_to(np.arange(W)[:, None], src.shape)
    group = (w_of * 8 + s_of) * 128 + lane
    rank = _distinct_sub_rank(group.ravel(), sub.ravel()).reshape(src.shape)
    l1 = int(rank.max()) + 1 if src.size else 1
    # only 8 sublanes exist, so ranks are < 8 by construction
    assert l1 <= L1_CAP

    route = np.where(rank < 4, lane << (7 * (rank % 4)), 0) | (rank << 28)
    route = route.astype(np.int64).astype(np.uint32).view(np.int32)
    route = route.reshape(W, 8, 128)
    route2 = None
    if l1 > 4:
        r2 = np.where(rank >= 4, lane << (7 * (rank - 4)), 0)
        route2 = (
            r2.astype(np.int64).astype(np.uint32).view(np.int32)
            .reshape(W, 8, 128)
        )
    # rsub: per (window, payload row, SOURCE lane, layer) — unique by the
    # rank construction, so a plain scatter-accumulate of shifted subs
    rsub = np.zeros(W * 8 * 128, np.int64)
    cell = (w_of * 8 + s_of) * 128 + lane
    np.add.at(rsub, cell.ravel(), (sub << (3 * rank)).ravel())
    rsub = rsub.astype(np.uint32).view(np.int32).reshape(W, 8, 128)
    return WindowStage(
        num_windows=W, l1=l1, route=route, route2=route2, rsub=rsub
    )


def stage_matvec_numpy(stage: WindowStage, a: np.ndarray) -> np.ndarray:
    """Golden executor: apply one stage to ``a`` [W, 1024] (any dtype)."""
    W = stage.num_windows
    out = np.zeros_like(a)
    route_u = stage.route.view(np.uint32)
    rsub_u = stage.rsub.view(np.uint32)
    lanes = np.arange(128)
    for w in range(W):
        win8 = a[w].reshape(8, 128)
        rank = (route_u[w] >> 28) & 7
        acc = np.zeros((8, 128), a.dtype)
        for l in range(stage.l1):
            if l < 4:
                lane = (route_u[w] >> (7 * l)) & 127
            else:
                lane = (stage.route2[w].view(np.uint32) >> (7 * (l - 4))) \
                    & 127
            sub = (rsub_u[w] >> (3 * l)) & 7
            t1 = win8[sub, lanes[None, :]]
            g = np.take_along_axis(t1, lane.astype(np.int64), axis=1)
            acc = np.where(rank == l, g, acc)
        out[w] = acc.reshape(-1)
    return out


# ---------------------------------------------------------------------------
# Full permutation plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PermutePlan:
    """``y[i] = x[perm[i]]`` for ``i < n`` via S1 -> T -> S2 -> T -> S3.

    S2 always operates on the (1024, 1024)-padded transposed view; its
    window count is fixed at 1024 regardless of W (wasteful for small N —
    the planner is only worth using when N is large; see
    ``estimate_permute_cost_ns``)."""

    n: int  # logical length
    num_windows: int  # W = ceil(n / 1024), <= 1024
    s1: WindowStage  # W windows
    s2: WindowStage  # 1024 windows (transposed view, cols padded to 1024)
    s3: WindowStage  # W windows

    @property
    def stream_bytes(self) -> int:
        return (
            self.s1.stream_bytes + self.s2.stream_bytes
            + self.s3.stream_bytes
        )


def build_permute_plan(perm: np.ndarray) -> PermutePlan:
    """Build the 3-stage plan for ``y = x[perm]`` (perm a permutation of
    ``len(perm)`` <= 1024*1024 elements)."""
    n = len(perm)
    W = max(-(-n // WINDOW), 1)
    if W > WINDOW:
        raise ValueError(
            f"permutation of {n} elements exceeds the single-panel limit "
            f"({WINDOW * WINDOW}); split into panels"
        )
    Np = W * WINDOW
    full = np.concatenate(
        [np.asarray(perm, np.int64), np.arange(n, Np, dtype=np.int64)]
    )
    d_idx = np.arange(Np, dtype=np.int64)
    sw = full // WINDOW
    dw = d_idx // WINDOW
    colors = color_permutation(sw, dw).astype(np.int64)

    s1src = np.zeros((W, WINDOW), np.int64)
    s1src[sw, colors] = full % WINDOW
    # transposed view: row = color, col = window (cols >= W are identity)
    s2src = np.broadcast_to(
        np.arange(WINDOW, dtype=np.int64)[None, :], (WINDOW, WINDOW)
    ).copy()
    s2src[colors, dw] = sw
    s3src = np.zeros((W, WINDOW), np.int64)
    s3src[dw, d_idx % WINDOW] = colors

    return PermutePlan(
        n=n,
        num_windows=W,
        s1=pack_window_stage(s1src),
        s2=pack_window_stage(s2src),
        s3=pack_window_stage(s3src),
    )


def permute_numpy(plan: PermutePlan, x: np.ndarray) -> np.ndarray:
    """Golden executor for the full plan (mirrors the device dataflow)."""
    W = plan.num_windows
    xp = np.zeros(W * WINDOW, x.dtype)
    xp[: plan.n] = x[: plan.n]
    a = stage_matvec_numpy(plan.s1, xp.reshape(W, WINDOW))
    at = np.zeros((WINDOW, WINDOW), x.dtype)
    at[:, :W] = a.T
    b = stage_matvec_numpy(plan.s2, at)
    bt = b.T[:W]
    y = stage_matvec_numpy(plan.s3, np.ascontiguousarray(bt))
    return y.reshape(-1)[: plan.n]


PANEL = WINDOW * WINDOW  # single-plan element limit (1 Mi)


def degree_rank_perms(deg: np.ndarray):
    """Degree-descending stable ranks, computed within PANEL-sized panels
    (the permutation plans are panel-local, so axes longer than 1 Mi are
    ranked per panel — concentration within a 1 Mi neighborhood is nearly
    as good as global for the routed planner).

    Returns ``(rank, perms)``: ``rank[i]`` = rank-space position of
    original index i (``panel(rank[i]) == panel(i)``), and ``perms`` the
    per-panel local permutations with ``ranked[p*PANEL + k] =
    orig[p*PANEL + perms[p][k]]``."""
    n = len(deg)
    rank = np.empty(n, np.int64)
    perms = []
    for base in range(0, max(n, 1), PANEL):
        end = min(base + PANEL, n)
        local = np.argsort(-deg[base:end], kind="stable")
        perms.append(local)
        rank[base + local] = base + np.arange(end - base)
    return rank, perms


def build_panel_permute_plans(perms) -> list:
    """One PermutePlan per panel-local permutation."""
    return [build_permute_plan(p) for p in perms]


def panel_permute_numpy(plans: list, x: np.ndarray) -> np.ndarray:
    """Golden: apply per-panel plans to consecutive PANEL slices of x."""
    out = np.empty_like(x)
    base = 0
    for plan in plans:
        out[base : base + plan.n] = permute_numpy(
            plan, x[base : base + plan.n]
        )
        base += plan.n
    assert base == len(x)
    return out


# measured v5e per-window stage cost model (calibrated after build):
# within-window kernel ~base + per-layer gather, plus two 4 MiB-class
# transposes; see ops/permute.py for the kernel
STAGE_BASE_NS = 25.0
STAGE_LAYER_NS = 4.0
TRANSPOSE_NS_PER_MB = 2600.0  # ~400 GB/s effective r+w


def estimate_permute_cost_ns(n: int) -> float:
    """Rough device cost of applying a permutation of n elements: three
    stage kernels (S2 fixed at 1024 windows) + two transposes."""
    W = max(-(-n // WINDOW), 1)
    stage_w = STAGE_BASE_NS + STAGE_LAYER_NS * 4  # typical l1 ~4-5
    t_stages = (2 * W + WINDOW) * stage_w
    t_transpose = 2 * (WINDOW * W * 4 / 1e6) * TRANSPOSE_NS_PER_MB
    return t_stages + t_transpose + 3000.0

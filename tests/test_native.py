"""Native C++ preprocessing path: equivalence with numpy + speed sanity."""

import time

import numpy as np
import pytest

from hispmv_tpu import native
from hispmv_tpu.formats.synth import blocked_coo, powerlaw_coo
from hispmv_tpu.plan.blocks import LANES, build_block_plan

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@needs_native
def test_pack_blocks_matches_numpy():
    for coo in [
        blocked_coo(500, 700, 20_000, seed=0),
        powerlaw_coo(1000, 1000, 30_000, seed=1),
    ]:
        ncb = -(-coo.num_cols // LANES)
        got = native.pack_blocks(coo.rows, coo.cols, coo.values, 8, ncb)
        assert got is not None
        brn, bcn, datan = got
        # numpy reference
        key = (coo.rows.astype(np.int64) // 8) * ncb + coo.cols // LANES
        uniq, inv = np.unique(key, return_inverse=True)
        datap = np.zeros((len(uniq), 8, LANES), np.float32)
        np.add.at(datap, (inv, coo.rows % 8, coo.cols % LANES), coo.values)
        np.testing.assert_array_equal(brn, (uniq // ncb).astype(np.int32))
        np.testing.assert_array_equal(bcn, (uniq % ncb).astype(np.int32))
        np.testing.assert_allclose(datan, datap, rtol=1e-6)


@needs_native
def test_build_block_plan_uses_native_and_agrees():
    coo = powerlaw_coo(2000, 2000, 60_000, seed=2)
    plan_native = build_block_plan(coo, block_h=16)
    import os

    os.environ["HISPMV_NO_NATIVE"] = "1"
    try:
        # force a fresh decision inside native.get_lib? The flag is read at
        # load; library already loaded, so emulate numpy by calling the
        # internal fallback: rebuild with a monkeypatched pack
        import hispmv_tpu.native as nat

        orig = nat.pack_blocks
        nat.pack_blocks = lambda *a, **k: None
        try:
            plan_numpy = build_block_plan(coo, block_h=16)
        finally:
            nat.pack_blocks = orig
    finally:
        os.environ.pop("HISPMV_NO_NATIVE", None)
    np.testing.assert_array_equal(plan_native.block_rows, plan_numpy.block_rows)
    np.testing.assert_array_equal(plan_native.block_cols, plan_numpy.block_cols)
    np.testing.assert_array_equal(
        plan_native.block_firsts, plan_numpy.block_firsts
    )
    np.testing.assert_allclose(plan_native.data, plan_numpy.data, rtol=1e-6)


@needs_native
def test_parse_mtx_body():
    body = b"1 2 3.5\n2 1 -1.25e2\n3 3 0.125\n"
    out = native.parse_mtx_body(body, 3, True)
    assert out is not None
    r, c, v = out
    np.testing.assert_array_equal(r, [0, 1, 2])
    np.testing.assert_array_equal(c, [1, 0, 2])
    np.testing.assert_allclose(v, [3.5, -125.0, 0.125])


@needs_native
def test_native_pack_speed():
    # High-fill case: the output data array stays small, so this times the
    # sort+fill loops themselves.  (Low-fill matrices are dominated by
    # zero-initializing the huge block payload — a property of the format,
    # not the packer.)
    coo = blocked_coo(100_000, 100_000, 5_000_000, seed=3)
    ncb = -(-coo.num_cols // LANES)
    t0 = time.perf_counter()
    out = native.pack_blocks(coo.rows, coo.cols, coo.values, 8, ncb)
    dt = time.perf_counter() - t0
    assert out is not None
    assert dt < 10.0, f"native pack too slow: {dt:.1f}s"


def test_mtx_roundtrip_uses_native(tmp_path):
    from hispmv_tpu.formats import load_mtx, save_mtx
    from hispmv_tpu.formats.synth import random_coo

    coo = random_coo(50, 60, 300, seed=4)
    p = str(tmp_path / "m.mtx")
    save_mtx(p, coo)
    loaded = load_mtx(p)
    np.testing.assert_allclose(
        loaded.to_dense(), coo.to_dense(), rtol=1e-6, atol=1e-7
    )


def test_greedy_cell_merge_matches_python():
    from hispmv_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(9)
    n = 50_000
    strip = np.sort(rng.integers(0, 200, n)).astype(np.int64)
    bc = rng.integers(1, 6, n).astype(np.int64)
    cap = 32
    gid = native.greedy_cell_merge(strip, bc, cap)
    # reference loop (the pure-Python fallback in plan/routed.py)
    ref = np.empty(n, np.int64)
    g, cur_b, cur_s = -1, 0, -1
    for i in range(n):
        if strip[i] != cur_s or cur_b + bc[i] > cap:
            g += 1
            cur_b, cur_s = 0, strip[i]
        ref[i] = g
        cur_b += int(bc[i])
    assert np.array_equal(gid, ref)

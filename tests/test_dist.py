"""Multi-chip sharded SpMV tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from hispmv_tpu.dist import (
    build_sharded_block_plan,
    make_mesh,
    spmv_sharded,
)
from hispmv_tpu.dist.shard import _split_boundaries
from hispmv_tpu.formats.synth import blocked_coo, powerlaw_coo, random_coo


def golden(coo, x):
    return (coo.to_scipy() @ x.astype(np.float64)).astype(np.float32)


def test_split_boundaries_balanced():
    counts = np.array([10, 1, 1, 1, 10, 1, 1, 10], np.int64)
    b = _split_boundaries(counts, 4)
    assert b[0] == 0 and b[-1] == len(counts)
    assert np.all(np.diff(b) >= 1)
    loads = [counts[b[i]:b[i + 1]].sum() for i in range(4)]
    assert max(loads) <= 2 * (sum(loads) / 4 + 10)


def test_sharded_plan_covers_matrix():
    coo = blocked_coo(1000, 1000, 30_000, seed=0)
    sp = build_sharded_block_plan(coo, num_devices=4)
    assert sp.num_devices == 4
    assert sum(sp.nrb_per_dev) == -(-1000 // sp.block_h)
    assert sum(sp.blocks_per_dev) > 0
    assert sp.balance < 1.5  # block loads roughly equal


@pytest.mark.parametrize("x_mode", ["replicated", "gather"])
def test_sharded_spmv_matches_scipy(x_mode):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    coo = blocked_coo(800, 900, 20_000, seed=1)
    mesh = make_mesh(4)
    sp = build_sharded_block_plan(coo, num_devices=4)
    x = np.random.default_rng(2).standard_normal(900).astype(np.float32)
    y = np.asarray(
        spmv_sharded(sp, x, mesh, x_mode=x_mode, interpret=True)
    )
    np.testing.assert_allclose(y, golden(coo, x), rtol=1e-3, atol=1e-4)


def test_sharded_spmv_imbalanced_matrix():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    # power-law: the balanced splitter must still yield near-equal shards
    coo = powerlaw_coo(2000, 2000, 60_000, seed=3)
    mesh = make_mesh(8)
    sp = build_sharded_block_plan(coo, num_devices=8)
    assert sp.balance < 2.0
    x = np.random.default_rng(4).standard_normal(2000).astype(np.float32)
    y = np.asarray(spmv_sharded(sp, x, mesh, interpret=True))
    np.testing.assert_allclose(y, golden(coo, x), rtol=1e-3, atol=1e-4)


def test_sharded_empty_device_tail():
    # tiny matrix, more devices than row-blocks: some shards are empty
    coo = random_coo(16, 200, 100, seed=5)
    sp = build_sharded_block_plan(coo, num_devices=8)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    x = np.random.default_rng(6).standard_normal(200).astype(np.float32)
    y = np.asarray(spmv_sharded(sp, x, mesh, interpret=True))
    np.testing.assert_allclose(y, golden(coo, x), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("x_mode", ["replicated", "gather"])
def test_sharded_window_matches_scipy(x_mode):
    from hispmv_tpu.dist import build_sharded_window_plan, spmv_sharded_window

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    coo = powerlaw_coo(900, 1100, 25_000, seed=7)
    mesh = make_mesh(4)
    sp = build_sharded_window_plan(coo, num_devices=4)
    x = np.random.default_rng(8).standard_normal(1100).astype(np.float32)
    y = np.asarray(
        spmv_sharded_window(sp, x, mesh, x_mode=x_mode, interpret=True)
    )
    np.testing.assert_allclose(y, golden(coo, x), rtol=1e-3, atol=1e-4)


def test_sharded_window_balance():
    from hispmv_tpu.dist import build_sharded_window_plan

    coo = powerlaw_coo(4000, 4000, 120_000, seed=9)
    sp = build_sharded_window_plan(coo, num_devices=8)
    assert sp.balance < 2.0
    assert sum(sp.nrb_per_dev) == -(-4000 // sp.block_h)


def test_sharded_chunked_ring_matches_golden():
    """Round-2 fast path: chunked kernel in shard_map with the ppermute
    ring (comm/compute overlap); both x modes must match scipy."""
    import jax

    from hispmv_tpu.dist.shard import (
        build_sharded_chunked_plan,
        make_mesh,
        spmv_sharded_chunked,
    )
    from hispmv_tpu.formats.synth import blocked_coo

    D = min(4, len(jax.devices()))
    coo = blocked_coo(1600, 2000, 60_000, seed=70)
    sp = build_sharded_chunked_plan(coo, num_devices=D, chunk=16)
    assert sp.balance < 1.5
    x = np.random.default_rng(71).standard_normal(2000).astype(np.float32)
    want = coo.to_scipy() @ x.astype(np.float64)
    mesh = make_mesh(D)
    for mode in ("ring", "replicated"):
        y = np.asarray(
            spmv_sharded_chunked(sp, x, mesh, x_mode=mode, interpret=True)
        )
        np.testing.assert_allclose(y, want, rtol=1e-3, atol=1e-4)


def test_sharded_chunked_powerlaw_balance():
    import jax

    from hispmv_tpu.dist.shard import (
        build_sharded_chunked_plan,
        make_mesh,
        spmv_sharded_chunked,
    )
    from hispmv_tpu.formats.synth import powerlaw_coo

    D = min(4, len(jax.devices()))
    coo = powerlaw_coo(2000, 2000, 40_000, seed=72)
    sp = build_sharded_chunked_plan(coo, num_devices=D, chunk=16)
    assert sp.balance < 1.6, sp.blocks_per_dev
    x = np.random.default_rng(73).standard_normal(2000).astype(np.float32)
    want = coo.to_scipy() @ x.astype(np.float64)
    y = np.asarray(
        spmv_sharded_chunked(
            sp, x, make_mesh(D), x_mode="ring", interpret=True
        )
    )
    np.testing.assert_allclose(y, want, rtol=1e-3, atol=1e-4)


def test_init_distributed_single_process_noop():
    from hispmv_tpu.dist import init_distributed

    # no coordinator configured: must be a no-op returning False, and must
    # stay callable repeatedly
    assert init_distributed() is False
    assert init_distributed() is False

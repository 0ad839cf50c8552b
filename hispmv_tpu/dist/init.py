"""Multi-host initialization helper.

The reference has no inter-device story (single FPGA, SURVEY section 2.7);
the TPU-native framework scales across hosts with ``jax.distributed``.
This helper wraps ``jax.distributed.initialize`` with the environment
detection the common launchers need, and is safe to call in single-host
runs (no-op) and repeatedly (idempotent).

Usage at the top of a multi-host program::

    from hispmv_tpu.dist import init_distributed
    init_distributed()                      # auto-detect (TPU pods, SLURM)
    init_distributed("host0:1234", 4, 0)    # explicit coordinator

then build a global mesh with ``make_mesh()`` and run the sharded paths —
x rotation rides ICI within a slice and DCN across slices, entirely via
the XLA collectives the kernels already emit.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    Returns True when distributed mode is active (after this call), False
    for plain single-process runs.  Arguments fall back to the standard
    environment (JAX auto-detection on TPU pods / Cloud; the
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    variables otherwise)."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None
    # A pod launcher sets TPU_WORKER_HOSTNAMES to the full worker list; a
    # single-entry value (e.g. "localhost" from single-chip runtimes) is
    # NOT a pod.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_pod = len([w for w in workers.split(",") if w.strip()]) > 1 or (
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None
    )
    if not explicit and not auto_pod:
        return False  # single-process: nothing to initialize

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise  # the caller asked for a specific cluster: surface it
        return False  # auto-detection came up empty: stay single-process
    _initialized = True
    return jax.process_count() > 1

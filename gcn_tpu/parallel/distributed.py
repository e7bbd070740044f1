"""Multi-host job bootstrap.

Thin wrapper over ``jax.distributed.initialize`` (the communication
"backend" of the framework is mesh setup + XLA collectives over ICI/DCN —
no custom transport, SURVEY.md §5).  On TPU pods the coordinator and
process indices come from the environment automatically; CPU fleets pass
them explicitly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no arguments, TPU pod environments self-configure; otherwise pass
    ``coordinator_address='host:port'`` plus process count/id (or set
    ``GCN_TPU_COORDINATOR`` / ``GCN_TPU_NUM_PROCS`` / ``GCN_TPU_PROC_ID``).
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do not touch jax.process_count()/jax.devices() here — any
    # backend-initializing call before jax.distributed.initialize() is an
    # error.
    coordinator_address = coordinator_address or os.environ.get(
        "GCN_TPU_COORDINATOR"
    )
    if num_processes is None and "GCN_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["GCN_TPU_NUM_PROCS"])
    if process_id is None and "GCN_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["GCN_TPU_PROC_ID"])
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs or os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:
            if "already initialized" not in str(e):
                raise
        except ValueError as e:
            # single-chip environments (e.g. the axon relay) advertise TPU
            # pod env vars without pod metadata — fall back to one process
            if kwargs or "coordinator_address" not in str(e):
                raise
    _initialized = True


def runtime_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.default_backend(),
    }

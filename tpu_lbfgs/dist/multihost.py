"""Multi-host bootstrap for pod-slice runs.

The reference has no multi-device story at all; this is the from-scratch
communication layer of SURVEY.md §2: ``jax.distributed`` for process
bootstrap, one global mesh spanning all hosts' devices, the same sharded
solve program on every host (SPMD) — reductions ride ICI within a slice and
DCN across slices, chosen by XLA from the mesh layout.

Cannot be exercised on this single-host environment beyond API shape; the
8-virtual-device CPU tests plus the driver's ``dryrun_multichip`` validate
the sharding program itself.
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (idempotent no-op on single host
    when no coordinator is configured)."""
    if coordinator_address is None and num_processes is None:
        # Single-process run (or TPU pod auto-detection via env).
        try:
            jax.distributed.initialize()
        except Exception:
            # Already initialized or single-host without coordinator: fine.
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "d"):
    """Mesh over every device in the job (all hosts)."""
    from .mesh import make_mesh
    return make_mesh(jax.devices(), axis_name)


def is_coordinator() -> bool:
    return jax.process_index() == 0

"""Multi-host bootstrap for pod-slice runs.

The reference has no multi-device story at all; this is the from-scratch
communication layer of SURVEY.md §2: ``jax.distributed`` for process
bootstrap, one global mesh spanning all hosts' devices, the same sharded
solve program on every host (SPMD) — reductions ride ICI within a slice and
DCN across slices, chosen by XLA from the mesh layout.

Cannot be exercised on this single-host environment beyond API shape; the
8-virtual-device CPU tests (tests/test_multihost.py) plus the driver's
``dryrun_multichip`` validate the sharding program itself.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _multihost_intent() -> Optional[str]:
    """Environment evidence that this process is PART OF a multi-host job
    (pod metadata, a configured coordinator, a >1-task launcher).  When such
    evidence exists, an auto-detection failure is a broken pod bootstrap —
    not a benign plain-single-host case — and must propagate: swallowing it
    would silently degrade the job to N independent single-host solves."""
    import os

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        if os.environ.get(var):
            return var
    # Worker-list vars are also set on plain single hosts (axon sets
    # TPU_WORKER_HOSTNAMES=localhost); only a MULTI-entry list is evidence.
    for var in ("TPU_PROCESS_ADDRESSES", "TPU_WORKER_HOSTNAMES"):
        v = os.environ.get(var, "")
        if len([h for h in v.split(",") if h.strip()]) > 1:
            return f"{var}={v}"
    return None


def _launcher_size_hint() -> Optional[str]:
    """Generic launcher-size vars (SLURM/MPI/PMI task counts).  These prove
    the LAUNCHER started multiple tasks, not that the tasks intend a shared
    JAX pod — an embarrassingly-parallel array job of N independent
    single-host solves sets them too.  Evidence for a WARNING, never for
    failing the run."""
    import os

    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        v = os.environ.get(var, "")
        if v.isdigit() and int(v) > 1:
            return f"{var}={v}"
    return None


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: Optional[str] = None) -> None:
    """Initialize the multi-host runtime.

    With no arguments, relies on TPU-pod auto-detection via the environment
    (a no-op on a plain single host, where auto-detection finds nothing and
    jax raises about the missing coordinator — that specific case is
    suppressed, UNLESS the environment shows this process belongs to a
    multi-host job, in which case the failure is a real broken bootstrap
    and propagates).  With explicit coordinator arguments, any failure is
    REAL (wrong address, port clash, process-count mismatch) and
    propagates; calling twice is idempotent.

    cpu_collectives: cross-process collectives implementation for the CPU
    backend ("gloo" or "mpi") — required for a multi-process CPU job (TPU
    pods use ICI/DCN natively and ignore this).  Exercised end-to-end by
    scripts/run_multiproc.py.
    """
    if jax.distributed.is_initialized():
        return
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:
            # Only the single-host-without-coordinator case is benign; it
            # presents as "couldn't auto-detect" / missing-arguments errors.
            msg = str(e).lower()
            benign = ("coordinator_address" in msg or "auto" in msg
                      or "unable to detect" in msg
                      or "already initialized" in msg
                      or "must be defined" in msg
                      # Backend already live (some computation ran first):
                      # nothing to coordinate on a single host — a no-op.
                      # With an EXPLICIT coordinator this same error is real
                      # (too-late initialize) and takes the propagating
                      # branch below instead.
                      or "before any jax calls" in msg)
            intent = _multihost_intent()
            if benign and intent is not None:
                raise RuntimeError(
                    f"multi-host bootstrap failed but the environment says "
                    f"this process is part of a multi-host job ({intent}); "
                    f"refusing to silently degrade to an independent "
                    f"single-host run") from e
            if not benign:
                raise
            hint = _launcher_size_hint()
            if hint is not None:
                # Could be an N-task pod job missing its coordinator vars OR
                # an intentional array job of independent solves — warn, do
                # not fail (the pod case also sets coordinator/worker-list
                # vars, which DO fail above).
                import warnings

                warnings.warn(
                    f"jax.distributed auto-detection found no coordinator "
                    f"but {hint} says the launcher started multiple tasks; "
                    f"continuing as an independent single-host run (pass "
                    f"explicit coordinator_address/num_processes/process_id "
                    f"if these tasks should form one pod)", RuntimeWarning,
                    stacklevel=2)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "d",
                devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over every device in the job (all hosts), ordered by
    ``mesh_utils.create_device_mesh`` so neighbouring mesh positions are
    ICI neighbours (the halo ppermutes in dist.pallas_sharded and the psum
    rings then ride ICI links, not DCN hops)."""
    from jax.experimental import mesh_utils

    devices = list(jax.devices()) if devices is None else list(devices)
    try:
        arr = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    except (ValueError, AssertionError, NotImplementedError):
        # Non-TPU backends (CPU tests) have no ICI topology metadata.
        arr = np.asarray(devices)
    return Mesh(arr, (axis_name,))


def global_mesh_2d(batch_size: int, axis_names: tuple[str, str] = ("b", "d"),
                   devices: Optional[Sequence] = None) -> Mesh:
    """2-D (batch, vector) mesh over all hosts' devices, ICI-aware: the
    contiguous-minor vector axis gets the tighter ICI loops."""
    from jax.experimental import mesh_utils

    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % batch_size != 0:
        raise ValueError(
            f"{n} devices not divisible by batch axis {batch_size}")
    shape = (batch_size, n // batch_size)
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError, NotImplementedError):
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()

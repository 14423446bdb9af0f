"""Device tracing helpers (SURVEY.md §5 tracing row).

The reference's only instrumentation is chrono wall-clock around the whole
solve plus per-iteration host prints that force a device sync
(benchmark.cpp:93-97, lbfgs.cpp:76-78).  Here:

  - per-iteration metrics come from the device-side Trace carried in the
    bounded scan (cfg.record_trace; types.Trace) — no syncs;
  - whole-solve device timelines come from ``jax.profiler`` via this
    module, viewable in TensorBoard/Perfetto (trace-viewer).

Note (axon remote backend): device-side traces require a backend that
supports profiling; on the remote tunnel the trace may contain host events
only.  The context manager degrades gracefully — it never fails the solve.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: str) -> Iterator[None]:
    """Record a jax.profiler trace of the enclosed block into ``trace_dir``
    (open with TensorBoard's profile plugin or ui.perfetto.dev).  Falls back
    to a no-op if the backend cannot be profiled — and never swallows or
    rewraps exceptions raised by the enclosed block itself."""
    ctx = None
    try:
        ctx = jax.profiler.trace(trace_dir)
        ctx.__enter__()
    except Exception:                      # profiler unavailable: no-op
        ctx = None
    try:
        yield
    finally:
        if ctx is not None:
            try:
                ctx.__exit__(None, None, None)
            except Exception:              # stop() must never break a run
                pass


def profile_solve(run_fn, *args, trace_dir: Optional[str] = None,
                  warmup: bool = True) -> dict:
    """Time (and optionally trace) one jitted solve.

    run_fn(*args) must return a result with a scalar ``.f`` — fetching it is
    the end-to-end fence (block_until_ready on large remote pytrees is not
    reliable through the axon relay; see PERFORMANCE.md).
    Returns {"wall_s", "result", "trace_dir"}.
    """
    if warmup:
        float(run_fn(*args).f)
    ctx = trace(trace_dir) if trace_dir else contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        out = run_fn(*args)
        float(out.f)
    return {"wall_s": time.perf_counter() - t0, "result": out,
            "trace_dir": trace_dir}

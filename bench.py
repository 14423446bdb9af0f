#!/usr/bin/env python
"""Headline benchmark: L-BFGS iterations/s on Rosenbrock d=2^20 (TPU, f32).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iter/s", "vs_baseline": N, ...}

vs_baseline semantics: the reference's published headline is its GPU running
1.2x faster than its own CPU implementation at d=10,000 (BASELINE.md, Fig.1).
Absolute reference GPU times are unrecoverable (missing xlsx), so the
baseline is reconstructed on this machine: the native C++ oracle (-O3
-march=native, the stand-in for the reference's sequential implementation)
times the identical fixed-iteration workload, and

    vs_baseline = tpu_iters_per_s / (1.2 * cpu_iters_per_s)

i.e. our speedup over the *reference-GPU-equivalent* throughput.  Values > 1
beat the reference's headline result.

Tunnel-health instrumentation (round-2 requirement): the axon TPU tunnel has
two independently-observed degradation modes —
  (a) COMPILE latency is wildly variable: the same trivial 1000-step scalar
      while_loop measured 73 s and 456 s on consecutive attempts, and the
      full solver program ~500 s (2026-08-19); post-compile reruns are a
      stable ~30 ms.  BENCH_r01's run was truncated by a 480 s alarm for
      exactly this reason.
  (b) EXECUTION/dispatch latency occasionally degrades ~20x (BENCH_r01's
      421 it/s vs the same-config 7.7-7.8k it/s measured before and after).
This script therefore (1) probes compile latency with a tiny while_loop and
dispatch latency with its reruns, (2) times the main program's compile
separately from its timed repeats, (3) re-probes dispatch after measuring,
retrying the measurement after a cool-down when execution looks degraded,
and (4) emits all of it in the JSON so a degraded environment is
self-evident from the record.
"""
import json
import os
import signal
import sys
import time

# The benched stack, also emitted in the JSON record.
BENCH_D = 1 << 20


def config_key(cfg) -> str:
    """Derive the (d, config)-keying string FROM the cfg object so the
    expected-wall lookup cannot drift from the actually-benched stack."""
    return (f"{cfg.line_search}/{cfg.direction}"
            + ("/poly-ls" if cfg.ls_eval == "polynomial" else "")
            + ("/pallas" if cfg.use_pallas else "")
            + f"/m={cfg.m}")

# Expected healthy wall for the 1000-iteration timed run, KEYED on
# (d, config) so a change to either cannot silently turn the degradation
# detector into a false-retry machine (VERDICT r2 weak #4).  Provenance:
# committed telemetry history — BENCH_r01/r02 measure_rounds for the
# default stack (0.122-0.129 s).  An unknown key disables the
# degraded-tunnel retry (recorded as expected_wall_s: null) rather than
# comparing against the wrong constant.
EXPECTED_WALLS_S = {
    # r5 provenance: headline_ab_results.json + the r5 validation run
    # (repeat walls 0.111-0.113 s); earlier rounds measured 0.122-0.129.
    (1 << 20, "backtracking/compact_incremental/poly-ls/pallas/m=10"): 0.112,
}
# A best-of-repeats 3x slower than expected triggers a cool-down + retry.
# Generous on purpose: genuine regressions of < 3x are reported as-is, not
# retried away.
RETRY_THRESHOLD = 3.0
MAX_MEASURE_ROUNDS = 3
COOLDOWN_S = 30.0

TELEMETRY = {}


class BenchTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise BenchTimeout()


def log(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def tunnel_probe():
    """Compile + dispatch latency of a trivial 1000-step scalar while_loop.
    Healthy: compile well under ~60 s, dispatch ~30 ms.  Returns
    (compile_s, dispatch_ms) and records them in TELEMETRY."""
    import jax
    from jax import lax

    @jax.jit
    def probe(n):
        def body(c):
            i, a = c
            return i + 1, a * 1.0000017 + 3e-9

        return lax.while_loop(lambda c: c[0] < n, body, (0, 1.0))[1]

    t0 = time.perf_counter()
    float(probe(1000))
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(probe(1000))
        walls.append(time.perf_counter() - t0)
    dispatch_ms = sorted(walls)[len(walls) // 2] * 1e3
    TELEMETRY["probe_compile_s"] = round(compile_s, 2)
    TELEMETRY["probe_dispatch_ms"] = round(dispatch_ms, 1)
    log(f"probe: compile {compile_s:.1f}s, dispatch {dispatch_ms:.0f}ms")
    return probe, compile_s, dispatch_ms


def redispatch_ms(probe) -> float:
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(probe(1000))
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[1] * 1e3


def main():
    budget = int(os.environ.get("TPU_LBFGS_BENCH_BUDGET_S", "2400"))
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    TELEMETRY["budget_s"] = budget
    t_start = time.perf_counter()

    import jax.numpy as jnp

    from tpu_lbfgs.bench.harness import (
        REFERENCE_GPU_SPEEDUP,
        bench_cpu_native,
        bench_tpu,
    )
    from tpu_lbfgs.config import LBFGSConfig

    probe, _, _ = tunnel_probe()

    # d = 2^20 (the 1e6-class size, an exact Pallas-block multiple so the
    # fused kernels run without padding copies).  Fastest measured stack:
    # incremental compact direction + polynomial line search + Pallas fused
    # vg/tail + f32 lane-tiled history (see README performance table;
    # bfloat16 history measured SLOWER under the lane-tiled layout — the
    # convert work outweighs the bandwidth savings).
    # 1000 timed iterations: the tunnel adds ~27-30ms of fixed per-call
    # dispatch; 200-iter runs under-report steady-state throughput by ~25%.
    d = BENCH_D
    cfg = LBFGSConfig(line_search="backtracking",
                      direction="compact_incremental", m=10,
                      use_pallas=True, ls_eval="polynomial")
    bench_config = config_key(cfg)
    EXPECTED_WALL_S = EXPECTED_WALLS_S.get((d, bench_config))
    TELEMETRY["expected_wall_s"] = EXPECTED_WALL_S

    rounds = []
    tpu = None
    for attempt in range(MAX_MEASURE_ROUNDS):
        r = bench_tpu(problem="rosenbrock", d=d, iters=1000, cfg=cfg,
                      dtype=jnp.float32, repeats=3)
        rounds.append({"wall_s": round(r.wall_s, 4),
                       "repeat_walls_s": [round(w, 4)
                                          for w in r.details["repeat_walls_s"]],
                       "compile_s": round(r.details["compile_s"], 1)})
        tpu = r if tpu is None or r.wall_s < tpu.wall_s else tpu
        log(f"round {attempt}: wall {r.wall_s:.4f}s "
            f"(compile {r.details['compile_s']:.0f}s)")
        if EXPECTED_WALL_S is None \
                or r.wall_s <= RETRY_THRESHOLD * EXPECTED_WALL_S:
            break
        # Degraded execution: record the evidence, cool down, re-measure
        # (the compiled program is cached in-process, so retries are cheap).
        after = redispatch_ms(probe)
        rounds[-1]["probe_dispatch_after_ms"] = round(after, 1)
        log(f"degraded round (dispatch now {after:.0f}ms); cooling down")
        if time.perf_counter() - t_start > budget - 120:
            break
        time.sleep(COOLDOWN_S)
    TELEMETRY["measure_rounds"] = rounds
    TELEMETRY["compile_s"] = rounds[0]["compile_s"]
    TELEMETRY["probe_dispatch_after_ms"] = round(redispatch_ms(probe), 1)
    TELEMETRY["degraded_tunnel"] = bool(
        (EXPECTED_WALL_S is not None
         and tpu.wall_s > RETRY_THRESHOLD * EXPECTED_WALL_S)
        or TELEMETRY["probe_dispatch_after_ms"] > 300.0)

    # CPU baseline runs the reference's own algorithm (direct evaluation,
    # two-loop) — the comparison is framework vs framework, not knob vs knob.
    cpu_cfg = LBFGSConfig(line_search="backtracking", m=10)
    cpu = bench_cpu_native(problem="rosenbrock", d=d, iters=20, cfg=cpu_cfg)

    # BASELINE config-4 batch cell (VERDICT r3 item 9): 4096 independent
    # d=1024 instances vmapped in lockstep — the second headline workload.
    # Runs LAST and fully guarded: the primary metric above is already
    # measured, so a batch-path failure (or the budget alarm firing during
    # its multi-minute tunnel compile) downgrades only this nested record.
    batch_rec = None
    elapsed = time.perf_counter() - t_start
    if elapsed > budget - 420:
        batch_rec = {"skipped": f"only {budget - elapsed:.0f}s of budget "
                                f"left for the batch compile"}
    else:
        try:
            from tpu_lbfgs.bench.harness import bench_batch

            t0 = time.perf_counter()
            b = bench_batch(problem="rosenbrock", batch=4096, d=1024,
                            iters=200, repeats=3)
            cpu_b = bench_cpu_native(
                problem="rosenbrock", d=1024, iters=200,
                cfg=LBFGSConfig(line_search="backtracking", m=10))
            batch_rec = {
                "metric": "lbfgs_instance_iters_per_s_batch4096_d1024_f32",
                "value": round(b.iters_per_s, 1),
                "unit": "instance-iter/s",
                # One chip solving 4096 instances vs the reference-GPU-
                # equivalent solving them one at a time (1.2x normalization).
                "vs_baseline": round(
                    b.iters_per_s
                    / (REFERENCE_GPU_SPEEDUP * cpu_b.iters_per_s), 1),
                "cpu_native_iters_per_s_d1024": round(cpu_b.iters_per_s, 2),
                "wall_s_200it": round(b.wall_s, 4),
                "cell_total_s": round(time.perf_counter() - t0, 1),
            }
            log(f"batch cell: {b.iters_per_s:,.0f} instance-it/s "
                f"(wall {b.wall_s:.3f}s)")
        except BaseException as e:     # noqa: BLE001 — incl. BenchTimeout:
            # record and fall through to print the primary metric (the
            # budget alarm only fires once, and everything after this point
            # is prompt host-side work).
            batch_rec = {"error": f"{type(e).__name__}: {e}"}
            log(f"batch cell failed: {type(e).__name__}: {e}")

    vs_baseline = tpu.iters_per_s / (REFERENCE_GPU_SPEEDUP * cpu.iters_per_s)
    print(json.dumps({
        "metric": "lbfgs_iters_per_s_rosenbrock_d2e20_f32",
        "value": round(tpu.iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs_baseline, 2),
        "cpu_native_iters_per_s": round(cpu.iters_per_s, 2),
        "tpu_wall_s_1000it": round(tpu.wall_s, 4),
        "config": bench_config,
        # Second BASELINE workload, nested so the driver's one-line contract
        # holds (it parses the last JSON line as THE headline metric).
        "batch_metric": batch_rec,
        **TELEMETRY,
    }))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BenchTimeout:
        print(json.dumps({
            "metric": "lbfgs_iters_per_s_rosenbrock_d2e20_f32",
            "value": 0.0, "unit": "iter/s", "vs_baseline": 0.0,
            "error": "timeout: budget exhausted (see telemetry for the "
                     "phase reached; compile latency through the axon "
                     "tunnel measured 73-500s for identical programs)",
            **TELEMETRY,
        }))
        sys.exit(1)

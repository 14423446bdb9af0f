#!/usr/bin/env python
"""Minimal repro for the emulated-f64 d=1e5 TPU worker crash
(PERFORMANCE.md f64 grid: "TPU WORKER CRASH (reproduced twice)").

The crashing cell: rosenbrock, d=100,000, XLA x64 emulation, reference
sequential config (backtracking, tol 1e-8, max 15,000), x0 ~ U(-1000, 1000)
seed 42 — exactly what bench/reference_protocol.py's `tpu-f64-seqcfg` cell
runs.  This script reruns that cell standalone with bisecting knobs so the
failure can be localized (dimension, iteration count, segmented execution):

    python scripts/f64_crash_repro.py --d 100000 --max-iters 200
    python scripts/f64_crash_repro.py --d 100000 --segmented 50

Exit codes: 0 = ran to completion; anything else (or a killed process) is
the repro.  Run it under a fresh interpreter per attempt — the crash takes
the worker down, and the axon tunnel needs a new session afterwards.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=100_000)
    ap.add_argument("--max-iters", type=int, default=15_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--segmented", type=int, default=0, metavar="ITERS",
                    help="run via make_solve_segment in ITERS-iteration "
                         "chunks (host sync between chunks) instead of one "
                         "while_loop — the candidate workaround")
    ap.add_argument("--problem", default="rosenbrock")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize
    from tpu_lbfgs.problems.suite import reference_x0

    cfg = LBFGSConfig(m=10, max_iters=args.max_iters, tol=1e-8,
                      line_search="backtracking", ls_eval="direct")
    p = get_problem(args.problem)
    x0 = reference_x0(args.d, args.seed)
    print(f"repro: d={args.d} max_iters={args.max_iters} "
          f"segmented={args.segmented} backend={jax.default_backend()}",
          flush=True)
    t0 = time.perf_counter()
    if args.segmented:
        from tpu_lbfgs.core.solver import (
            finalize_result,
            init_state,
            make_value_and_grad,
            make_solve_segment,
        )

        vg = make_value_and_grad(p.f, p.grad)
        seg = make_solve_segment(cfg, p.f, grad=p.grad,
                                 iters=args.segmented, donate=True)
        st = init_state(vg, x0, cfg.m)
        k = 0
        while True:
            st = seg(st)
            k = int(st.k)
            print(f"  segment boundary: k={k} f={float(st.f):.6g} "
                  f"||g||={float(st.g_norm):.3e} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
            if int(st.status) != Status.RUNNING or k >= cfg.max_iters \
                    or float(st.g_norm) < cfg.tol:
                break
        res = finalize_result(cfg, st)
    else:
        res = minimize(p.f, x0, cfg, grad=p.grad)
        jax.block_until_ready(res.f)
    wall = time.perf_counter() - t0
    print(f"completed: status={Status.NAMES[int(res.status)]} "
          f"k={int(res.iterations)} f={float(res.f):.6g} "
          f"||g||={float(res.g_norm):.3e} wall={wall:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

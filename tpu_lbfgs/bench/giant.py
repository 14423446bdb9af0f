"""Giant-instance single-chip bench cell: one (d, stack) configuration per
process, printed as one JSON line.

BASELINE.md north star: ">80% of HBM roofline on the two-loop recursion at
d=1e8".  PERFORMANCE.md's giant-instances table is produced by sweeping this
cell over block sizes / history dtypes / matvec placement:

    for br in 512 1024 2048; do
      TPU_LBFGS_BLOCK_ROWS=$br python -m tpu_lbfgs.bench.giant --d 67108864
    done

One process per configuration because the kernels read BLOCK_ROWS at trace
time (kernels/pallas_ops.py), and because giant states (~6.7 GB at d=2^26,
m=10) leave no HBM headroom for a second resident program.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu_lbfgs.bench.giant")
    ap.add_argument("--d", type=int, default=1 << 26)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--problem", default="rosenbrock")
    ap.add_argument("--history-dtype", default=None,
                    help="e.g. bfloat16; default f32")
    ap.add_argument("--with-matvec", action="store_true",
                    help="compute the history matvecs inside the fused tail "
                         "kernel instead of as XLA contractions")
    ap.add_argument("--direction", default="compact_incremental")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--donate", action="store_true",
                    help="drive the solve as donated compiled segments "
                         "(make_solve_segment) instead of one jitted call")
    args = ap.parse_args(argv)

    from ..config import LBFGSConfig
    from ..kernels import pallas_ops
    from ..utils.roofline import traffic_model

    cfg = LBFGSConfig(
        line_search="backtracking", direction=args.direction, m=args.m,
        use_pallas=not args.no_pallas, ls_eval="polynomial",
        history_dtype=args.history_dtype)

    if args.donate:
        r = _bench_donated(args, cfg)
    else:
        from .harness import bench_tpu

        br = bench_tpu(problem=args.problem, d=args.d, iters=args.iters,
                       cfg=cfg, repeats=args.repeats,
                       with_matvec=args.with_matvec)
        r = {"iters_per_s": round(br.iters_per_s, 2),
             "wall_s": round(br.wall_s, 4),
             "compile_s": round(br.details["compile_s"], 1)}

    ms_per_iter = 1e3 / r["iters_per_s"]
    # Roofline accounting: modeled traffic at the measured rate, as a
    # fraction of (a) the v5e HBM spec and (b) the stream bandwidth actually
    # measured on this chip through the tunnel (PERFORMANCE.md: 544 GB/s).
    tm = traffic_model(cfg, args.d)
    achieved_gbps = tm.bytes_per_iter * r["iters_per_s"] / 1e9
    roof = {
        "modeled_passes_per_iter": round(tm.passes_total, 1),
        "modeled_gb_per_iter": round(tm.bytes_per_iter / 1e9, 2),
        "achieved_gbps_on_model": round(achieved_gbps, 1),
        "frac_of_v5e_spec": round(achieved_gbps / 819.0, 3),
        "frac_of_measured_stream_544": round(achieved_gbps / 544.0, 3),
    }
    print(json.dumps({
        "d": args.d, "m": args.m, "iters": args.iters,
        "block_rows": pallas_ops.BLOCK_ROWS,
        "history_dtype": args.history_dtype or "float32",
        "with_matvec": args.with_matvec,
        "direction": args.direction,
        "use_pallas": not args.no_pallas,
        "donated_segments": args.donate,
        "ms_per_iter": round(ms_per_iter, 2),
        **r,
        "roofline": roof,
    }))
    return 0


def _bench_donated(args, cfg):
    """Segment-driver variant: giant states cannot double-buffer, so the
    production path at d >= 2^26 is make_solve_segment with donation; this
    measures exactly that path."""
    import jax.numpy as jnp
    import numpy as np

    from ..core.solver import init_state, make_solve_segment
    from ..problems import get_problem
    from ..problems.suite import fused_tail_for, fused_value_and_grad

    cfg = cfg.replace(max_iters=args.iters * (args.repeats + 1), tol=0.0)
    p = get_problem(args.problem)
    if cfg.use_pallas:
        vg = fused_value_and_grad(args.problem, use_pallas=True)
        fused_tail = fused_tail_for(args.problem,
                                    with_matvec=args.with_matvec,
                                    use_pallas=True,
                                    accurate_dots=cfg.accurate_dots)
    else:
        from ..core.solver import make_value_and_grad

        vg = make_value_and_grad(p.f, p.grad)
        fused_tail = None
    seg = make_solve_segment(cfg, p.f, value_and_grad=vg, iters=args.iters,
                             dir_poly=p.dir_poly, fused_tail=fused_tail,
                             donate=True)

    rng = np.random.default_rng(42)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, args.d), jnp.float32)
    t0 = time.perf_counter()
    state = init_state(vg, x0, cfg.m, cfg.history_dtype)
    state = seg(state)
    float(state.f)
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state = seg(state)
        float(state.f)
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    return {"iters_per_s": round(args.iters / best, 2),
            "wall_s": round(best, 4), "compile_s": round(compile_s, 1),
            "repeat_walls_s": [round(w, 4) for w in walls]}


if __name__ == "__main__":
    sys.exit(main())

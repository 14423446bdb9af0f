"""Full benchmark sweep: python -m tpu_lbfgs.bench [--out bench_results.json]

Runs the headline fixed-iteration benches across configurations (directions,
line searches, dtypes, dims) plus the CPU-native baseline, and writes a JSON
report.  Each configuration is one jit program; on the axon remote backend
large compile bursts can wedge the tunnel, so configurations run sequentially
with a per-config alarm and failures are recorded rather than fatal.
"""
from __future__ import annotations

import argparse
import json
import signal
import sys
import time


class _Timeout(Exception):
    pass


def _alarm(_s, _f):
    raise _Timeout()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu_lbfgs.bench")
    ap.add_argument("--out", default="bench_results.json")
    ap.add_argument("--d", type=int, default=1 << 20)
    # 1000 iters/call amortizes the tunnel's ~28ms fixed dispatch cost
    # (PERFORMANCE.md protocol note).
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--per-config-timeout", type=int, default=300)
    ap.add_argument("--quick", action="store_true",
                    help="3 key configs only")
    ap.add_argument("--reference-protocol", action="store_true",
                    help="run the reference's published experiment instead: "
                         "5 seeds x 4 strategies x d in {1e4,1e5,2^20}, "
                         "x0 ~ U(-1000,1000), to convergence, TPU vs the "
                         "native C++ oracle (Table-I analogue)")
    ap.add_argument("--problem", default="rosenbrock")
    ap.add_argument("--cpu-budget", type=float, default=600.0,
                    help="per-(dim,strategy) CPU-oracle wall budget (s)")
    ap.add_argument("--tpu-budget", type=float, default=600.0,
                    help="per-cell TPU seed-loop wall budget (s)")
    ap.add_argument("--cell-timeout", type=int, default=900,
                    help="hard alarm per cell (s)")
    ap.add_argument("--no-cpu", action="store_true")
    ap.add_argument("--no-tpu", action="store_true")
    ap.add_argument("--tpu-f64", action="store_true",
                    help="include the emulated-f64 sequential-config TPU "
                         "cells (compiles are tunnel-hostile; see "
                         "reference_protocol.py docstring)")
    ap.add_argument("--scaling", action="store_true",
                    help="strong-scaling sweep over shard counts on the "
                         "available devices (BASELINE.md: efficiency at "
                         "1 chip / N devices; on this single-chip host run "
                         "under the 8-virtual-device CPU mesh to validate "
                         "the program shape)")
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="run the scaling sweep on N virtual CPU devices "
                         "instead of the real backend (the single-chip host "
                         "cannot shard; the CPU mesh measures the same SPMD "
                         "program's scaling shape)")
    args = ap.parse_args(argv)

    if args.scaling:
        import jax

        if args.cpu_mesh:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.cpu_mesh)

        from .scaling import scaling_sweep

        rows = scaling_sweep(d=args.d, iters=min(args.iters, 50))
        for r in rows:
            print(f"n={r['n_devices']:3d}  {r['iters_per_s']:9.1f} it/s  "
                  f"speedup {r['speedup']:.2f}  eff {r['efficiency']:.2f}")
        out = args.out if args.out != "bench_results.json" \
            else "scaling_results.json"
        record = {"backend": jax.default_backend(), "d": args.d,
                  "rows": rows}
        if jax.default_backend() != "tpu":
            # N virtual CPU devices share ONE host's memory bandwidth, so
            # the "scaling" curve mostly measures partitioning overhead —
            # the record proves the SPMD program compiles and executes at
            # every shard count, nothing more.
            record["evidence"] = (
                "correctness only, NOT performance: CPU backend with "
                "virtual devices (one host's bandwidth split N ways); "
                "efficiency numbers here say nothing about ICI scaling")
        with open(out, "w") as fh:
            json.dump(record, fh, indent=1)
        print(f"wrote {out}")
        return 0

    if args.reference_protocol:
        from .reference_protocol import run_protocol

        out = args.out if args.out != "bench_results.json" \
            else "reference_protocol_results.json"
        run_protocol(problem=args.problem, cpu=not args.no_cpu,
                     tpu=not args.no_tpu, cpu_budget_s=args.cpu_budget,
                     tpu_budget_s=args.tpu_budget,
                     cell_timeout_s=args.cell_timeout,
                     out=out, quick=args.quick, tpu_f64=args.tpu_f64)
        return 0

    import jax.numpy as jnp

    from ..config import LBFGSConfig
    from .harness import bench_cpu_native, bench_tpu

    base = LBFGSConfig(line_search="backtracking", m=10)
    configs = [
        ("two_loop/direct", base.replace(direction="two_loop")),
        ("compact/direct", base.replace(direction="compact")),
        ("compact/poly+pallas", base.replace(
            direction="compact", ls_eval="polynomial", use_pallas=True)),
        ("incr/poly+pallas", base.replace(
            direction="compact_incremental", ls_eval="polynomial",
            use_pallas=True)),
        ("incr/poly+pallas/bf16", base.replace(
            direction="compact_incremental", ls_eval="polynomial",
            use_pallas=True, history_dtype="bfloat16")),
        ("incr/poly+pallas/m=20", base.replace(
            direction="compact_incremental", ls_eval="polynomial",
            use_pallas=True, m=20)),
        ("wolfe/poly", base.replace(
            direction="compact_incremental", ls_eval="polynomial",
            line_search="wolfe_interpolation", c2=0.9, use_pallas=True)),
        ("spec-ls/direct+pallas/bf16", base.replace(
            direction="compact_incremental",
            line_search="backtracking_speculative",
            use_pallas=True, history_dtype="bfloat16")),
    ]
    if args.quick:
        configs = [configs[1], configs[4], configs[7]]

    signal.signal(signal.SIGALRM, _alarm)
    rows = []
    for name, cfg in configs:
        signal.alarm(args.per_config_timeout)
        try:
            t0 = time.time()
            r = bench_tpu(d=args.d, iters=args.iters, cfg=cfg, repeats=2)
            rows.append({"config": name, "iters_per_s": round(r.iters_per_s, 1),
                         "wall_s": round(r.wall_s, 4),
                         "final_f": r.final_f,
                         "setup_s": round(time.time() - t0, 1)})
            print(f"{name:28s} {r.iters_per_s:9.1f} it/s", flush=True)
        except _Timeout:
            rows.append({"config": name, "error": "timeout"})
            print(f"{name:28s} TIMEOUT", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            rows.append({"config": name, "error": f"{type(e).__name__}: {e}"})
            print(f"{name:28s} ERROR {type(e).__name__}", flush=True)
        finally:
            signal.alarm(0)

    # BASELINE.json config 4: 4096 independent d=1e3-class instances vmapped.
    signal.alarm(args.per_config_timeout)
    try:
        from .harness import bench_batch
        rb = bench_batch(batch=4096, d=1024, iters=200)
        rows.append({"config": "batch-4096xd1024",
                     "instance_iters_per_s": round(rb.iters_per_s, 1),
                     "wall_s": round(rb.wall_s, 4)})
        print(f"{'batch-4096xd1024':28s} {rb.iters_per_s:12,.0f} inst-it/s")
    except _Timeout:
        rows.append({"config": "batch-4096xd1024", "error": "timeout"})
    except Exception as e:  # noqa: BLE001
        rows.append({"config": "batch-4096xd1024",
                     "error": f"{type(e).__name__}: {e}"})
    finally:
        signal.alarm(0)

    signal.alarm(args.per_config_timeout)
    try:
        cpu = bench_cpu_native(d=args.d, iters=20,
                               cfg=LBFGSConfig(line_search="backtracking"))
        rows.append({"config": "cpu-native-baseline",
                     "iters_per_s": round(cpu.iters_per_s, 2)})
        print(f"{'cpu-native-baseline':28s} {cpu.iters_per_s:9.2f} it/s")
    except _Timeout:
        rows.append({"config": "cpu-native-baseline", "error": "timeout"})
    except Exception as e:  # noqa: BLE001 - a failed native build (missing
        #   g++, installed layout without native/) must not lose the whole
        #   measured sweep right before the JSON is written
        rows.append({"config": "cpu-native-baseline",
                     "error": f"{type(e).__name__}: {e}"})
    finally:
        signal.alarm(0)

    with open(args.out, "w") as fh:
        json.dump({"d": args.d, "iters": args.iters, "rows": rows}, fh,
                  indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

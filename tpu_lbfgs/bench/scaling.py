"""Scaling-efficiency measurement: iterations/s at 1 shard vs N shards.

BASELINE.md north star: "scaling efficiency reported at 1 chip / 1 host /
N >= 2 hosts".  On real hardware this runs over the pod mesh; in this
environment it is exercised on the 8-virtual-device CPU mesh (conftest) and
via the driver's dryrun — the harness and the sharded program are identical
either way, only the devices differ.

Efficiency definition: eff(N) = T(1) / T(N) / N for a FIXED global problem
size d (strong scaling) — perfect overlap of the N-way-split memory streams
with the psum latency gives eff = 1.
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LBFGSConfig
from ..core.solver import init_state, make_value_and_grad, solve_from_state
from ..dist.mesh import make_mesh, state_shardings
from ..problems import get_problem


def bench_sharded(problem: str, d: int, iters: int, cfg: LBFGSConfig,
                  n_devices: int, dtype=jnp.float32, repeats: int = 3,
                  seed: int = 42) -> dict:
    """Fixed-iteration throughput with the vector sharded over n_devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    cfg = cfg.replace(max_iters=iters, tol=0.0)
    p = get_problem(problem)
    vg = make_value_and_grad(p.f, p.grad)
    dir_poly = p.dir_poly if cfg.ls_eval == "polynomial" else None

    st_sh = state_shardings(mesh)
    x_sh = NamedSharding(mesh, P("d"))
    rng = np.random.default_rng(seed)
    x0 = jax.device_put(jnp.asarray(rng.uniform(-2, 2, d), dtype), x_sh)

    make = jax.jit(lambda x: init_state(vg, x, cfg.m, cfg.history_dtype),
                   out_shardings=st_sh)
    run = jax.jit(lambda s: solve_from_state(cfg, p.f, vg, s, dir_poly),
                  in_shardings=(st_sh,), out_shardings=st_sh)

    state = make(x0)
    out = run(state)
    float(out.f)                       # warmup fence
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(state)
        float(out.f)
        best = min(best, time.perf_counter() - t0)
    return {"n_devices": n_devices, "iters_per_s": iters / best,
            "wall_s": best, "final_f": float(out.f)}


def scaling_sweep(problem: str = "rosenbrock", d: int = 1 << 22,
                  iters: int = 50, cfg: Optional[LBFGSConfig] = None,
                  device_counts: Optional[Sequence[int]] = None,
                  dtype=jnp.float32) -> list[dict]:
    """Strong-scaling sweep over shard counts; adds efficiency vs 1 device."""
    cfg = cfg or LBFGSConfig(line_search="backtracking", direction="compact")
    n = len(jax.devices())
    if device_counts is None:
        device_counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]
    rows = []
    base = None
    for c in device_counts:
        r = bench_sharded(problem, d, iters, cfg, c, dtype)
        if base is None:
            base = r["iters_per_s"]
        r["efficiency"] = r["iters_per_s"] / (base * c)
        r["speedup"] = r["iters_per_s"] / base
        rows.append(r)
    return rows

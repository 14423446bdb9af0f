"""The fastest measured single-chip stack (see PERFORMANCE.md):

  compact_incremental direction + polynomial line search + Pallas fused
  kernels + f32 lane-tiled history + fused iteration tail.

~7,900 L-BFGS iterations/s on Rosenbrock d = 2^20 on one TPU v5e chip —
about 800x the reference's GPU-vs-CPU headline (BASELINE.md).

Run:  python examples/03_fast_stack.py          (sized for TPU; on CPU
pass a smaller d / fewer iters)
"""
import time

import jax
import jax.numpy as jnp

import tpu_lbfgs as tl

problem = "rosenbrock"
p = tl.get_problem(problem)

on_tpu = jax.default_backend() == "tpu"
d, iters = ((1 << 20), 1000) if on_tpu else ((1 << 14), 100)

cfg = tl.LBFGSConfig(
    line_search="backtracking",
    direction="compact_incremental",   # Byrd–Nocedal–Schnabel + incremental products
    ls_eval="polynomial",              # closed-form phi(alpha): O(1) trials
    use_pallas=True,
    max_iters=iters,
    tol=0.0,                           # fixed-iteration throughput run
)

# Problem-aware fast-path capabilities (all optional; plain minimize(f, x0)
# works for any objective):
vg = tl.fused_value_and_grad(problem, use_pallas=True)     # f+grad, one pass
tail = tl.fused_tail_for(problem, with_matvec=False)       # fused iteration tail

x0 = jnp.full((d,), -1.2, jnp.float32)
res = tl.minimize(p.f, x0, cfg, value_and_grad=vg,
                  dir_poly=p.dir_poly, fused_tail=tail)
float(res.f)  # compile warmup fence

t0 = time.perf_counter()
res = tl.minimize(p.f, x0, cfg, value_and_grad=vg,
                  dir_poly=p.dir_poly, fused_tail=tail)
float(res.f)
dt = time.perf_counter() - t0
print(f"{int(res.iterations)} iterations in {dt:.3f}s = "
      f"{int(res.iterations) / dt:.0f} it/s")

"""Checkpoint / resume: persist the full solver state mid-run and continue —
the reference's state lives only in RAM/VRAM (SURVEY.md §5).

Run:  python examples/05_checkpoint_resume.py
"""
import tempfile

import jax.numpy as jnp

import tpu_lbfgs as tl
from tpu_lbfgs.core.solver import init_state, make_value_and_grad, \
    solve_from_state
from tpu_lbfgs.io.checkpoint import load_state, save_state

p = tl.get_problem("rosenbrock")
vg = make_value_and_grad(p.f, p.grad)
cfg_phase1 = tl.LBFGSConfig(line_search="backtracking", max_iters=50,
                            tol=1e-10)

state = init_state(vg, jnp.full((4096,), -1.2, jnp.float32), cfg_phase1.m)
state = solve_from_state(cfg_phase1, p.f, vg, state)
print(f"phase 1: k = {int(state.k)}, f = {float(state.f):.4g}")

with tempfile.TemporaryDirectory() as tmp:
    path = f"{tmp}/ckpt"
    save_state(path, state)
    restored = load_state(path)

# Resume with a larger budget; the history ring, iteration counter, and
# status carry over exactly.
cfg_phase2 = cfg_phase1.replace(max_iters=2000, tol=1e-5)
final = solve_from_state(cfg_phase2, p.f, vg,
                         restored._replace(status=jnp.int32(0)))
print(f"phase 2: k = {int(final.k)}, f = {float(final.f):.4g}, "
      f"status = {tl.Status.NAMES[int(final.status)]}")

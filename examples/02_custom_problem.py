"""Bring your own objective: autodiff gradients (which the C++ reference
cannot do — it ships hand-derived gradients only, functions.cpp:16-49),
or register a Problem for the CLI/bench suite.

Run:  python examples/02_custom_problem.py
"""
import jax
import jax.numpy as jnp

import tpu_lbfgs as tl


# --- option 1: just pass f; jax.grad supplies the exact gradient -------------
def beale_like(x):
    # A smooth non-convex test function over pairs of coordinates.
    a, b = x[::2], x[1::2]
    return jnp.sum((1.5 - a + a * b) ** 2 + (2.25 - a + a * b**2) ** 2)


res = tl.minimize(beale_like, jnp.zeros(1024), tl.LBFGSConfig(
    line_search="wolfe_interpolation", c2=0.9, max_iters=500, tol=1e-6,
    fidelity="fixed"))
print(f"autodiff solve: {tl.Status.NAMES[int(res.status)]}, "
      f"f = {float(res.f):.3e}, iters = {int(res.iterations)}")

# --- option 2: register it so the CLI / bench harness can use it -------------
tl.register_problem(tl.Problem(
    name="beale_like",
    f=beale_like,
    grad=jax.grad(beale_like),
))
p = tl.get_problem("beale_like")
print("registered:", p.name, "->", sorted(tl.problem_names()))

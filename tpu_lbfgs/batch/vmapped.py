"""Batched L-BFGS: thousands of independent problem instances per chip.

The reference has no batch story at all (SURVEY.md §2 parallelism inventory:
"Batch parallelism over problem instances: Absent") — each run optimizes one
vector.  Here the whole solver is a pure state->state map, so ``jax.vmap``
lifts it wholesale: the while_loop condition becomes "any lane still running"
and JAX freezes finished lanes automatically (their body results are
select-ed away), which is exactly the per-lane convergence masking SURVEY.md
§7 calls for.  Target workload: 4096 independent d=1e3 instances per chip
(BASELINE.json config 4).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array

from ..config import LBFGSConfig
from ..core.solver import (
    init_state,
    make_value_and_grad,
    solve_from_state,
    _state_to_result,
)
from ..types import SolveResult


def vmap_minimize(f: Callable, x0_batch: Array,
                  cfg: LBFGSConfig = LBFGSConfig(),
                  grad=None, value_and_grad=None,
                  problem_params: Optional[Array] = None,
                  dir_poly=None) -> SolveResult:
    """Solve B independent instances in lockstep on one chip.

    Args:
      f: objective ``f(x)`` — or ``f(x, params)`` when ``problem_params`` is
         given (params batched along axis 0, one pytree leaf row per lane).
      x0_batch: (B, d) starting points.
      problem_params: optional per-instance parameters.

    Returns a SolveResult whose leaves carry a leading batch axis.
    """
    if problem_params is not None:
        def run_one(x0, params):
            fp = lambda x: f(x, params)
            gp = (lambda x: grad(x, params)) if grad is not None else None
            vgp = (lambda x: value_and_grad(x, params)) \
                if value_and_grad is not None else None
            vg = make_value_and_grad(fp, gp, vgp)
            dp = (lambda x, d: dir_poly(x, d, params)) if dir_poly else None
            state = init_state(vg, x0, cfg.m, cfg.history_dtype)
            out = solve_from_state(cfg, fp, vg, state, dp)
            return _state_to_result(out, None)

        return jax.jit(jax.vmap(run_one))(jnp.asarray(x0_batch), problem_params)

    vg = make_value_and_grad(f, grad, value_and_grad)

    def run_one(x0):
        state = init_state(vg, x0, cfg.m, cfg.history_dtype)
        out = solve_from_state(cfg, f, vg, state, dir_poly)
        return _state_to_result(out, None)

    return jax.jit(jax.vmap(run_one))(jnp.asarray(x0_batch))

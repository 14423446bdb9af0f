"""compact_incremental: the incrementally-maintained history products must
reproduce the recomputed-products trajectory (fp64: differences are exact up
to rounding, so trajectories should track tightly).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize


@pytest.mark.parametrize("problem", ["rosenbrock", "coupled_quadratic"])
@pytest.mark.parametrize("strategy", ["backtracking", "wolfe_interpolation"])
def test_incremental_tracks_compact(problem, strategy):
    p = get_problem(problem)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-1.5, 1.5, 48))
    base = LBFGSConfig(line_search=strategy, c2=0.9, max_iters=40, tol=1e-12,
                       record_trace=True)
    r_c = minimize(p.f, x0, base.replace(direction="compact"), grad=p.grad)
    r_i = minimize(p.f, x0, base.replace(direction="compact_incremental"),
                   grad=p.grad)
    n = min(int(r_c.iterations), int(r_i.iterations))
    assert n >= 10
    # Early iterations must match very tightly (exact in exact arithmetic);
    # tiny fp differences can compound later on branchy problems.
    k = min(n, 15)
    np.testing.assert_allclose(np.asarray(r_i.trace.f[:k]),
                               np.asarray(r_c.trace.f[:k]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r_i.trace.alpha[:k]),
                               np.asarray(r_c.trace.alpha[:k]),
                               rtol=1e-7, atol=1e-12)


@pytest.mark.parametrize("problem", ["rosenbrock", "coupled_quadratic",
                                     "quadratic"])
def test_incremental_converges(problem):
    p = get_problem(problem)
    x0 = jnp.full((64,), -1.2, jnp.float64)
    cfg = LBFGSConfig(line_search="wolfe_interpolation", c2=0.9,
                      direction="compact_incremental", max_iters=3000,
                      tol=1e-6)
    r = minimize(p.f, x0, cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED
    assert float(r.g_norm) < 1e-6


def test_incremental_with_polynomial_ls():
    """The fast stack: incremental direction + polynomial line search."""
    p = get_problem("rosenbrock")
    x0 = jnp.full((32,), -1.2, jnp.float64)
    cfg = LBFGSConfig(line_search="wolfe_interpolation", c2=0.9,
                      direction="compact_incremental", ls_eval="polynomial",
                      max_iters=3000, tol=1e-6)
    r = minimize(p.f, x0, cfg, grad=p.grad, dir_poly=p.dir_poly)
    assert int(r.status) == Status.CONVERGED


def test_incremental_f32():
    """f32: drift in the difference-built products must not break convergence
    on a well-conditioned problem."""
    p = get_problem("coupled_quadratic")
    x0 = jnp.full((256,), 1.5, jnp.float32)
    cfg = LBFGSConfig(direction="compact_incremental", max_iters=300, tol=1e-2)
    r = minimize(p.f, x0, cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED


def test_incremental_ring_wraparound():
    """More iterations than m: evicted slots must be patched consistently."""
    p = get_problem("rosenbrock")
    x0 = jnp.full((24,), -1.2, jnp.float64)
    base = LBFGSConfig(line_search="backtracking", m=3, max_iters=60,
                       tol=1e-12, record_trace=True)
    r_c = minimize(p.f, x0, base.replace(direction="compact"), grad=p.grad)
    r_i = minimize(p.f, x0, base.replace(direction="compact_incremental"),
                   grad=p.grad)
    k = 25  # well past several ring wraps (m=3)
    np.testing.assert_allclose(np.asarray(r_i.trace.f[:k]),
                               np.asarray(r_c.trace.f[:k]),
                               rtol=1e-6, atol=1e-9)


def test_bf16_history_converges():
    """bfloat16 history storage: approximate H, full-precision decisions."""
    p = get_problem("coupled_quadratic")
    x0 = jnp.full((512,), 1.5, jnp.float32)
    for direction in ("compact", "compact_incremental", "two_loop"):
        cfg = LBFGSConfig(direction=direction, max_iters=300, tol=1e-2,
                          history_dtype="bfloat16")
        r = minimize(p.f, x0, cfg, grad=p.grad)
        assert int(r.status) == Status.CONVERGED, direction


def test_bf16_history_iteration_overhead_bounded():
    """bf16 history costs at most a modest iteration-count increase on
    Rosenbrock (quasi-Newton tolerates inexact H)."""
    p = get_problem("rosenbrock")
    x0 = jnp.full((64,), -1.2, jnp.float64)
    base = LBFGSConfig(line_search="wolfe_interpolation", c2=0.9,
                       direction="compact", max_iters=4000, tol=1e-5)
    r32 = minimize(p.f, x0, base, grad=p.grad)
    rbf = minimize(p.f, x0, base.replace(history_dtype="bfloat16"),
                   grad=p.grad)
    assert int(rbf.status) == Status.CONVERGED
    assert int(rbf.iterations) <= int(r32.iterations) * 2

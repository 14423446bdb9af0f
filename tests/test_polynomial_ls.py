"""Polynomial directional line search: dir_poly coefficients must reproduce
f(x + a*d) exactly (fp64), and polynomial-mode solves must track direct-mode
solves.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize, problem_names
from tpu_lbfgs.core.solver import _polyder, _polyval


@pytest.mark.parametrize("name", problem_names())
def test_dir_poly_matches_direct_eval(name):
    p = get_problem(name)
    assert p.dir_poly is not None
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-2, 2, 64))
    d = jnp.asarray(rng.normal(size=64))
    coeffs = p.dir_poly(x, d)
    for a in [0.0, 1e-6, 0.1, 0.5, 1.0, 2.7]:
        direct = float(p.f(x + a * d))
        poly = float(_polyval(coeffs, jnp.asarray(a)))
        assert np.isclose(poly, direct, rtol=1e-9, atol=1e-9), (name, a)


@pytest.mark.parametrize("name", problem_names())
def test_dir_poly_derivative_matches_grad(name):
    """phi'(a) from the derivative polynomial == grad f(x+ad).d exactly."""
    p = get_problem(name)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-2, 2, 48))
    d = jnp.asarray(rng.normal(size=48))
    dcoeffs = _polyder(p.dir_poly(x, d))
    for a in [0.0, 0.3, 1.0]:
        direct = float(jnp.vdot(p.grad(x + a * d), d))
        poly = float(_polyval(dcoeffs, jnp.asarray(a)))
        assert np.isclose(poly, direct, rtol=1e-8, atol=1e-8), (name, a)


@pytest.mark.parametrize("strategy", ["backtracking", "wolfe_interpolation",
                                      "backtracking_wolfe_bisect"])
def test_polynomial_solve_tracks_direct(strategy):
    p = get_problem("rosenbrock")
    x0 = jnp.full((40,), -1.2, jnp.float64)
    base = LBFGSConfig(line_search=strategy, c2=0.9, max_iters=2000, tol=1e-5)
    r_direct = minimize(p.f, x0, base, grad=p.grad)
    r_poly = minimize(p.f, x0, base.replace(ls_eval="polynomial"),
                      grad=p.grad, dir_poly=p.dir_poly)
    assert int(r_poly.status) == Status.CONVERGED
    assert int(r_direct.status) == Status.CONVERGED
    # fp-tolerance parity: both reach the optimum; iteration counts drift by
    # a few percent over long trajectories (summation-order differences in
    # phi flip occasional line-search branches).
    assert abs(int(r_poly.iterations) - int(r_direct.iterations)) <= \
        max(10, int(0.10 * int(r_direct.iterations)))
    assert float(r_poly.f) < 1e-8


def test_polynomial_wolfe_uses_no_gradient_evals():
    """In polynomial mode the Wolfe search costs zero gradient evaluations;
    the solver's single post-search vg is the only one per iteration."""
    p = get_problem("coupled_quadratic")
    x0 = jnp.full((32,), 2.0, jnp.float64)
    cfg = LBFGSConfig(line_search="wolfe_interpolation", ls_eval="polynomial",
                      max_iters=100, tol=1e-8)
    r = minimize(p.f, x0, cfg, grad=p.grad, dir_poly=p.dir_poly)
    assert int(r.status) == Status.CONVERGED
    # init (1) + one per iteration; nothing from the line searches.
    assert int(r.n_gev) == int(r.iterations) + 1


def test_polynomial_requires_dir_poly():
    p = get_problem("rosenbrock")
    cfg = LBFGSConfig(ls_eval="polynomial", max_iters=5)
    with pytest.raises(ValueError, match="dir_poly"):
        minimize(p.f, jnp.ones(8), cfg, grad=p.grad)

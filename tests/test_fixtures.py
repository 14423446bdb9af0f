"""Known-minimum SPD quadratic fixtures (the resurrected matrices.h harness):
the solver must recover x* = A^-1 b and f* to tight accuracy.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, Status, minimize
from tpu_lbfgs.problems import FIXTURE_DIMS, make_spd_fixture


@pytest.mark.parametrize("dim", FIXTURE_DIMS)
def test_recovers_known_minimum(dim):
    fx = make_spd_fixture(dim, seed=1)
    p = fx.problem()
    # tol below ~1e-7 is under the fp64-attainable gradient accuracy for
    # conditioned quadratics (kappa * eps * |A||x|); the line search then
    # correctly bails at machine precision, as the reference would.
    cfg = LBFGSConfig(line_search="wolfe_interpolation", m=10,
                      max_iters=3000, tol=1e-6)
    x0 = jnp.zeros((dim,), jnp.float64)
    r = minimize(p.f, x0, cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED
    assert abs(float(r.f) - fx.minimum_value) < 1e-6 * max(1, abs(fx.minimum_value))
    np.testing.assert_allclose(np.asarray(r.x), fx.minimizer,
                               rtol=1e-5, atol=1e-7)


def test_fixture_ground_truth_consistency():
    fx = make_spd_fixture(50, seed=2)
    # gradient at the minimizer is zero; f matches the closed form.
    g = fx.A @ fx.minimizer - fx.b
    assert np.max(np.abs(g)) < 1e-9
    p = fx.problem()
    assert np.isclose(float(p.f(jnp.asarray(fx.minimizer))),
                      fx.minimum_value, rtol=1e-12)


def test_condition_number_control():
    fx = make_spd_fixture(100, seed=3, condition=1000.0)
    eigs = np.linalg.eigvalsh(fx.A)
    assert eigs.min() > 0
    assert eigs.max() / eigs.min() < 1500.0


def test_deterministic_by_seed():
    a = make_spd_fixture(10, seed=7)
    b = make_spd_fixture(10, seed=7)
    np.testing.assert_array_equal(a.A, b.A)
    c = make_spd_fixture(10, seed=8)
    assert not np.array_equal(a.A, c.A)

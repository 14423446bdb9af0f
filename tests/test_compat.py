"""SciPy-shaped entry point and the profiling helpers."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs.problems import get_problem
from tpu_lbfgs.scipy_compat import minimize as sp_minimize


def test_scipy_signature_quadratic():
    p = get_problem("quadratic")
    res = sp_minimize(p.f, np.full(64, -3.0), jac=p.grad,
                      options={"maxiter": 100, "gtol": 1e-6})
    assert res.success
    assert res.status == 1
    np.testing.assert_allclose(res.x, np.ones(64), atol=1e-4)
    assert res.fun < 1e-8
    assert res.nit >= 1 and res.nfev >= res.nit
    assert res["nit"] == res.nit          # dict-style access


def test_scipy_autodiff_jac_none():
    p = get_problem("rosenbrock")
    res = sp_minimize(p.f, np.full(16, -1.2, np.float32),
                      options={"maxiter": 400, "gtol": 1e-3,
                               "linesearch": "wolfe_interpolation"})
    assert res.extra["g_norm"] <= 1e-3 or res.nit == 400


def test_scipy_args_passthrough():
    def f(x, shift):
        return jnp.sum((x - shift) ** 2)

    res = sp_minimize(f, np.zeros(8), args=(3.0,),
                      options={"maxiter": 50, "gtol": 1e-6})
    np.testing.assert_allclose(res.x, np.full(8, 3.0), atol=1e-4)


def test_scipy_rejects_unknown_method():
    p = get_problem("quadratic")
    with pytest.raises(ValueError):
        sp_minimize(p.f, np.zeros(4), method="nelder-mead")


def test_scipy_matches_scipy_lbfgsb_on_quadratic():
    scipy_opt = pytest.importorskip("scipy.optimize")
    p = get_problem("rosenbrock")
    x0 = np.full(32, -1.2)
    ours = sp_minimize(p.f, x0, jac=p.grad,
                       options={"maxiter": 2000, "gtol": 1e-6,
                                "linesearch": "wolfe_interpolation"})
    ref = scipy_opt.minimize(
        lambda x: float(p.f(jnp.asarray(x))), x0,
        jac=lambda x: np.asarray(p.grad(jnp.asarray(x))),
        method="L-BFGS-B", options={"maxiter": 2000, "gtol": 1e-6})
    np.testing.assert_allclose(ours.fun, ref.fun, atol=1e-5)


def test_profile_solve_and_trace(tmp_path):
    import jax

    from tpu_lbfgs import LBFGSConfig
    from tpu_lbfgs.core.solver import minimize as core_minimize
    from tpu_lbfgs.utils.profiling import profile_solve

    p = get_problem("quadratic")
    cfg = LBFGSConfig(max_iters=20, tol=1e-6)

    run = lambda: core_minimize(p.f, jnp.full((256,), -2.0, jnp.float32),
                                cfg, grad=p.grad)
    out = profile_solve(run, trace_dir=str(tmp_path / "trace"))
    assert out["wall_s"] > 0
    assert int(out["result"].status) == 1
    # A trace directory is produced when the backend supports profiling;
    # the helper must not fail either way.
    assert os.path.isdir(tmp_path) and out["trace_dir"].endswith("trace")


def test_scipy_unknown_options_warned_not_crash():
    """Standard SciPy L-BFGS-B options (ftol/maxfun/maxls/eps/disp) must not
    crash a drop-in migration — warn and ignore, like SciPy itself."""
    import warnings
    p = get_problem("coupled_quadratic")
    x0 = np.full(32, 1.5)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = sp_minimize(p.f, x0, jac=p.grad, method="L-BFGS-B",
                          options={"maxiter": 200, "ftol": 1e-9,
                                   "maxfun": 15000, "disp": False})
    assert res.success
    assert any("ftol" in str(x.message) for x in w)


def test_scipy_jac_true_returns_pair():
    """SciPy's jac=True idiom: fun returns (f, grad)."""
    p = get_problem("coupled_quadratic")

    def fun_and_grad(x):
        return p.f(x), p.grad(x)

    res = sp_minimize(fun_and_grad, np.full(32, 1.5), jac=True,
                      options={"maxiter": 200})
    assert res.success
    assert res.fun < 1e-8


def test_scipy_jac_string_spec_uses_autodiff():
    """SciPy's finite-difference jac specs ('2-point', '3-point', 'cs') must
    not reach the solver as a callable — warn and use exact jax.grad."""
    import warnings
    p = get_problem("coupled_quadratic")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = sp_minimize(p.f, np.full(32, 1.5), jac="2-point",
                          options={"maxiter": 200})
    assert res.success
    assert any("2-point" in str(x.message) for x in w)

"""Native C++ oracle: builds, solves, and agrees with the NumPy oracle and the
JAX solver on trajectories (all three implement the reference's exact rules).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, minimize, get_problem
from tpu_lbfgs.native import native_lbfgs
from tpu_lbfgs.oracle import lbfgs_oracle
import np_problems

STRATEGIES = [
    "backtracking",
    "backtracking_wolfe",
    "backtracking_wolfe_bisect",
    "armijo_interpolation",
    "wolfe_interpolation",
]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_native_matches_numpy_oracle(strategy):
    cfg = LBFGSConfig(line_search=strategy, max_iters=40, tol=1e-12, c2=0.9)
    f_np, g_np = np_problems.PROBLEMS["rosenbrock"]
    x0 = np.random.default_rng(11).uniform(-1.5, 1.5, 20)
    nat = native_lbfgs("rosenbrock", x0, cfg, record_trace=True)
    orc = lbfgs_oracle(f_np, g_np, x0, cfg)
    n = min(nat["iterations"], orc.iterations) - 1
    assert n >= 3
    np.testing.assert_allclose(nat["trace_f"][:n], np.asarray(orc.fs[:n]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(nat["trace_alpha"][:n],
                               np.asarray(orc.alphas[:n]),
                               rtol=1e-7, atol=1e-12)


@pytest.mark.parametrize("strategy", ["backtracking", "wolfe_interpolation"])
def test_native_matches_jax(strategy):
    cfg = LBFGSConfig(line_search=strategy, max_iters=30, tol=1e-12, c2=0.9,
                      record_trace=True)
    p = get_problem("rosenbrock")
    x0 = np.random.default_rng(12).uniform(-1.5, 1.5, 24)
    nat = native_lbfgs("rosenbrock", x0, cfg, record_trace=True)
    res = minimize(p.f, jnp.asarray(x0), cfg, grad=p.grad)
    n = min(nat["iterations"], int(res.iterations)) - 1
    assert n >= 3
    # native trace_f[k] is f BEFORE step k; jax trace.f[k] is f AFTER step k.
    np.testing.assert_allclose(np.asarray(res.trace.f[:n - 1]),
                               nat["trace_f"][1:n], rtol=1e-6, atol=1e-9)


def test_native_custom_callback():
    cfg = LBFGSConfig(max_iters=100, tol=1e-8)
    r = native_lbfgs("custom", np.full(16, 3.0), cfg,
                     f=lambda x: float(np.sum((x - 1.0) ** 2)),
                     grad=lambda x: 2.0 * (x - 1.0))
    assert r["status"] == "converged"
    np.testing.assert_allclose(r["x"], 1.0, atol=1e-8)


def test_native_problem_eval_matches_python():
    from tpu_lbfgs.native.binding import load, PROBLEM_IDS
    import ctypes
    lib = load()
    rng = np.random.default_rng(13)
    x = np.ascontiguousarray(rng.uniform(-2, 2, 64))
    for name, (f_np, g_np) in np_problems.PROBLEMS.items():
        pid = PROBLEM_IDS[name]
        fval = lib.tl_problem_f(
            pid, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 64)
        assert np.isclose(fval, f_np(x), rtol=1e-12), name
        g = np.empty(64)
        lib.tl_problem_grad(
            pid, x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 64)
        np.testing.assert_allclose(g, g_np(x), rtol=1e-12, err_msg=name)

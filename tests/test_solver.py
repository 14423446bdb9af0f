"""End-to-end solver: convergence on the suite and trajectory parity with the
NumPy oracle (the reference algorithm's exact decision rules, fp64).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize
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
def test_converges_rosenbrock(strategy):
    p = get_problem("rosenbrock")
    x0 = jnp.full((50,), -1.2, jnp.float64)
    cfg = LBFGSConfig(line_search=strategy, max_iters=3000, tol=1e-5, c2=0.9)
    r = minimize(p.f, x0, cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED, Status.NAMES[int(r.status)]
    assert float(r.f) < 1e-8
    assert float(r.g_norm) < 1e-5


@pytest.mark.parametrize("name", ["quadratic", "coupled_quadratic"])
@pytest.mark.parametrize("direction", ["two_loop", "compact"])
def test_converges_quadratics(name, direction):
    p = get_problem(name)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-5, 5, 64))
    cfg = LBFGSConfig(line_search="wolfe_interpolation", direction=direction,
                      max_iters=500, tol=1e-7)
    r = minimize(p.f, x0, cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED
    assert abs(float(r.f) - p.minimum_value) < 1e-10


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("problem", ["rosenbrock", "coupled_quadratic"])
def test_trajectory_parity_vs_oracle(strategy, problem):
    """The jitted solver must follow the oracle's alpha/f trajectory (fp64).

    Compared over a window: identical decision rules mean identical branch
    sequences; tiny reduction-order fp drift is tolerated via rtol.
    """
    p = get_problem(problem)
    f_np, g_np = np_problems.PROBLEMS[problem]
    dim = 24
    rng = np.random.default_rng(7)
    x0 = rng.uniform(-1.5, 1.5, dim)
    window = 30
    cfg = LBFGSConfig(line_search=strategy, max_iters=window, tol=1e-12,
                      c2=0.9, record_trace=True)

    res = minimize(p.f, jnp.asarray(x0), cfg, grad=p.grad)
    orc = lbfgs_oracle(f_np, g_np, x0, cfg)

    n = min(int(res.iterations), orc.iterations, window)
    assert n >= 3, f"too few comparable iterations: {n}"
    # trace.f[k] is f AFTER step k; oracle.fs[k] is f BEFORE step k.
    np.testing.assert_allclose(
        np.asarray(res.trace.f[: n - 1]), np.asarray(orc.fs[1:n]),
        rtol=1e-6, atol=1e-9,
        err_msg=f"{strategy}/{problem} f trajectory diverged")
    np.testing.assert_allclose(
        np.asarray(res.trace.alpha[: n - 1]), np.asarray(orc.alphas[: n - 1]),
        rtol=1e-6, atol=1e-12,
        err_msg=f"{strategy}/{problem} alpha sequence diverged")


def test_final_point_parity_full_solve():
    """Full solve to convergence matches the oracle's terminal point to
    gradient-norm tolerance (BASELINE.md north star)."""
    p = get_problem("rosenbrock")
    f_np, g_np = np_problems.PROBLEMS["rosenbrock"]
    x0 = np.full(30, -1.2)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=5000, tol=1e-6)
    res = minimize(p.f, jnp.asarray(x0), cfg, grad=p.grad)
    orc = lbfgs_oracle(f_np, g_np, x0, cfg, record=False)
    assert int(res.status) == Status.CONVERGED
    assert orc.status == "converged"
    assert float(res.g_norm) < 1e-6 and orc.g_norm < 1e-6
    assert abs(float(res.f) - orc.f) < 1e-10


def test_status_max_iters():
    p = get_problem("rosenbrock")
    cfg = LBFGSConfig(max_iters=3, tol=1e-16)
    r = minimize(p.f, jnp.full((16,), -1.2, jnp.float64), cfg, grad=p.grad)
    assert int(r.status) == Status.MAX_ITERS
    assert int(r.iterations) == 3


def test_trace_shape_and_freeze():
    p = get_problem("quadratic")
    cfg = LBFGSConfig(max_iters=50, tol=1e-10, record_trace=True)
    r = minimize(p.f, jnp.full((8,), 3.0, jnp.float64), cfg, grad=p.grad)
    assert r.trace.f.shape == (50,)
    k = int(r.iterations)
    # After convergence the trace repeats the terminal value.
    assert np.allclose(np.asarray(r.trace.f[k:]), float(r.f))


def test_autodiff_gradient_path():
    """No analytic gradient: jax.value_and_grad drives the solve."""
    p = get_problem("rosenbrock")
    cfg = LBFGSConfig(line_search="wolfe_interpolation", max_iters=2000,
                      tol=1e-5, c2=0.9)
    r = minimize(p.f, jnp.full((20,), -1.2, jnp.float64), cfg)
    assert int(r.status) == Status.CONVERGED


def test_eval_counters_match_oracle():
    p = get_problem("rosenbrock")
    f_np, g_np = np_problems.PROBLEMS["rosenbrock"]
    x0 = np.full(16, -1.2)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=40, tol=1e-12)

    counted = {"f": 0, "g": 0}

    def f_c(x):
        counted["f"] += 1
        return f_np(x)

    def g_c(x):
        counted["g"] += 1
        return g_np(x)

    res = minimize(p.f, jnp.asarray(x0), cfg, grad=p.grad)
    lbfgs_oracle(f_c, g_c, x0, cfg, record=False)
    # Oracle: backtracking recomputes f(x) every trial (hoisted in JAX) and
    # the benchmark-style bookkeeping differs by the trailing f(x) call in
    # OracleResult; assert the JAX counters are within the oracle's count.
    assert int(res.n_fev) <= counted["f"]
    assert int(res.n_gev) <= counted["g"] + 1


def test_final_optimum_matches_scipy():
    """Sanity cross-check against an independent L-BFGS (SciPy's L-BFGS-B):
    same optimum on the coupled quadratic (strictly convex -> unique)."""
    import scipy.optimize as so
    import np_problems

    f_np, g_np = np_problems.PROBLEMS["coupled_quadratic"]
    x0 = np.random.default_rng(21).uniform(-2, 2, 64)
    sp = so.minimize(f_np, x0, jac=g_np, method="L-BFGS-B",
                     options={"gtol": 1e-10})
    p = get_problem("coupled_quadratic")
    cfg = LBFGSConfig(line_search="wolfe_interpolation", max_iters=500,
                      tol=1e-9)
    r = minimize(p.f, jnp.asarray(x0), cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED
    np.testing.assert_allclose(np.asarray(r.x), sp.x, atol=1e-6)
    assert abs(float(r.f) - sp.fun) < 1e-10


def test_history_dtype_auto_rule():
    """"auto" = f32 history while the (2, m, d) ring is VMEM-resident, bf16
    once it must stream (the giant-d sweep's measured trade); f64 inputs
    always keep full precision (parity paths)."""
    from tpu_lbfgs.core.solver import init_state, make_value_and_grad
    from tpu_lbfgs.utils.roofline import VMEM_RESIDENT_BYTES

    p = get_problem("quadratic")
    vg = make_value_and_grad(p.f, p.grad)
    m = 10
    # resident: 2*10*4096*4 B = 320 KB << limit -> keeps f32
    st = init_state(vg, jnp.zeros(4096, jnp.float32), m, "auto")
    assert st.s_hist.dtype == jnp.float32
    # streaming: d chosen so 2*m*d*4 exceeds the residency budget -> bf16.
    # Rounded to a 2048 multiple (R % 16 == 0): bf16 additionally requires
    # clean (16, 128) tiling (measured r5 rule; resolve_history_dtype).
    d_big = int(VMEM_RESIDENT_BYTES // (2 * m * 4)) + 2048
    d_big = ((d_big + 2047) // 2048) * 2048
    st = init_state(vg, jnp.zeros(d_big, jnp.float32), m, "auto")
    assert st.s_hist.dtype == jnp.bfloat16
    # streaming but R % 16 != 0 (d = 2048k + 128): tiling waste -> f32
    st = init_state(vg, jnp.zeros(d_big + 128, jnp.float32), m, "auto")
    assert st.s_hist.dtype == jnp.float32
    # f64 input: full-precision history regardless of size
    st = init_state(vg, jnp.zeros(d_big, jnp.float64), m, "auto")
    assert st.s_hist.dtype == st.x.dtype
    # config validation accepts "auto", rejects junk
    LBFGSConfig(history_dtype="auto")
    with pytest.raises(ValueError):
        LBFGSConfig(history_dtype="float16")

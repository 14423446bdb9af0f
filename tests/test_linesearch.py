"""Per-strategy parity: the masked lax.while_loop line searches must return
the same alpha as the straight-line NumPy oracle (the reference's exact
control flow) for identical inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import oracle
from tpu_lbfgs.config import LBFGSConfig
from tpu_lbfgs.linesearch.strategies import get_line_search
from tpu_lbfgs.problems import get_problem
import np_problems

STRATEGIES = [
    "backtracking",
    "backtracking_wolfe",
    "backtracking_wolfe_bisect",
    "armijo_interpolation",
    "wolfe_interpolation",
]


def _cases(seed=0, n=12, dim=16):
    """Line-search inputs: random points on rosenbrock with descent directions
    of varying quality (steepest descent, noisy, badly scaled)."""
    rng = np.random.default_rng(seed)
    f_np, g_np = np_problems.PROBLEMS["rosenbrock"]
    cases = []
    for i in range(n):
        x = rng.uniform(-2, 2, dim)
        g = g_np(x)
        if i % 3 == 0:
            d = -g
        elif i % 3 == 1:
            d = -g + 0.1 * rng.normal(size=dim) * np.linalg.norm(g)
        else:
            d = -g * rng.uniform(0.001, 5.0)
        gdd = float(np.dot(g, d))
        if gdd >= 0:
            d = -g
            gdd = float(np.dot(g, d))
        cases.append((x, d, f_np(x), g, gdd))
    return cases


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("fidelity", ["reference", "fixed"])
def test_alpha_parity(strategy, fidelity):
    cfg = LBFGSConfig(line_search=strategy, fidelity=fidelity, c2=0.9)
    p = get_problem("rosenbrock")
    f_np, g_np = np_problems.PROBLEMS["rosenbrock"]
    ls_jax = get_line_search(strategy)
    ls_np = oracle.LINE_SEARCHES[strategy]

    def vg(x):
        return p.f(x), p.grad(x)

    def run_impl(x, d, fx, gdd):
        phi = lambda a: p.f(x + a * d)
        def phi_dphi(a):
            fv, gv = vg(x + a * d)
            return fv, jnp.vdot(gv, d)
        return ls_jax(cfg, phi, phi_dphi, fx, gdd)

    run = jax.jit(run_impl)

    for x, d, fx, g, gdd in _cases():
        a_np = ls_np(cfg, f_np, g_np, x, d, fx, g, gdd)
        res = run(jnp.asarray(x), jnp.asarray(d), jnp.asarray(fx),
                  jnp.asarray(gdd))
        a_jax = float(res.alpha)
        assert np.isclose(a_jax, a_np, rtol=1e-9, atol=1e-12), (
            f"{strategy}/{fidelity}: jax={a_jax} oracle={a_np}")


def test_reference_armijo_rule_differs_from_textbook():
    """The sign-flipped reference rule accepts alpha=1 in cases the textbook
    rule rejects (fidelity trap 1)."""
    # f increases slightly along d at alpha=1 but less than c1*alpha*|g.d|:
    # reference accepts (f_x - f_new >= c1*a*gdd with gdd<0), textbook rejects.
    f = lambda x: jnp.sum(x * x)

    def vg(x):
        return f(x), 2 * x

    x = jnp.asarray([2.0])
    d = jnp.asarray([-3.9999])  # overshoots: f(x+d) slightly above f(x)-eps
    fx = f(x)
    g = 2 * x
    gdd = jnp.vdot(g, d)
    phi = lambda a: f(x + a * d)
    def phi_dphi(a):
        fv, gv = vg(x + a * d)
        return fv, jnp.vdot(gv, d)
    ref = get_line_search("backtracking")(
        LBFGSConfig(fidelity="reference"), phi, phi_dphi, fx, gdd)
    fixed = get_line_search("backtracking")(
        LBFGSConfig(fidelity="fixed"), phi, phi_dphi, fx, gdd)
    assert float(ref.alpha) == 1.0
    assert float(fixed.alpha) < 1.0


def test_rescue_floor():
    """Parallel fidelity: underflowed alpha is rescued to 0.5
    (parallel line_search.cpp:38-41)."""
    # Objective increasing along d while the (deliberately inconsistent)
    # directional derivative claims descent -> Armijo never holds -> underflow.
    f = lambda x: jnp.sum(x)

    def vg(x):
        return f(x), jnp.ones_like(x)

    x = jnp.asarray([1.0])
    g = jnp.asarray([-1.0])
    d = jnp.asarray([1.0])
    cfg = LBFGSConfig(fidelity="fixed", alpha_rescue_floor=1e-4)
    phi = lambda a: f(x + a * d)
    def phi_dphi(a):
        fv, gv = vg(x + a * d)
        return fv, jnp.vdot(gv, d)
    res = get_line_search("backtracking")(cfg, phi, phi_dphi, f(x),
                                          jnp.vdot(g, d))
    assert float(res.alpha) == 0.5


def test_eval_counts_backtracking():
    p = get_problem("quadratic")

    def vg(x):
        return p.f(x), p.grad(x)

    x = jnp.zeros((8,), jnp.float64)
    g = p.grad(x)
    d = -g
    cfg = LBFGSConfig(fidelity="fixed")
    phi = lambda a: p.f(x + a * d)
    def phi_dphi(a):
        fv, gv = vg(x + a * d)
        return fv, jnp.vdot(gv, d)
    res = get_line_search("backtracking")(cfg, phi, phi_dphi, p.f(x),
                                          jnp.vdot(g, d))
    # alpha=1 overshoots to the mirror point (f unchanged, textbook rejects);
    # alpha=0.5 lands exactly on the minimum: two trials.
    assert float(res.alpha) == 0.5
    assert int(res.n_fev) == 2
    assert int(res.n_gev) == 0


def test_fixed_cubic_is_minimizer_reference_is_maximizer():
    """Fidelity trap #4: on phi(a) = a^3/3 - a anchored at (0, 3) the
    reference's cubic returns -1 (the MAXIMIZER); the textbook fixed
    variant returns +1, the minimizer.  Both match their NumPy oracles."""
    from tpu_lbfgs import oracle as orc
    from tpu_lbfgs.linesearch.interpolate import (
        cubic_interpolate, cubic_interpolate_fixed, safe_cubic_interpolate)
    args = [jnp.float64(v) for v in (0.0, 3.0, 0.0, -1.0, 6.0, 8.0)]
    assert float(cubic_interpolate(*args)) == pytest.approx(-1.0)
    assert float(cubic_interpolate_fixed(*args)) == pytest.approx(1.0)
    assert float(safe_cubic_interpolate(*args, fixed=True)) == pytest.approx(1.0)
    fargs = [float(a) for a in args]
    assert orc.cubic_interpolate(*fargs) == pytest.approx(-1.0)
    assert orc.cubic_interpolate_fixed(*fargs) == pytest.approx(1.0)


def test_fixed_quadratic_is_minimizer():
    """Fidelity trap #5: on phi(a) = a^2 - a with the Armijo-failed trial at
    alpha=1 the reference's quadratic returns 1.5 (a LARGER step); the
    textbook one-point minimizer returns 0.5."""
    from tpu_lbfgs import oracle as orc
    from tpu_lbfgs.linesearch.interpolate import (
        quadratic_interpolate, quadratic_interpolate_fixed)
    one, zero, neg1 = jnp.float64(1.0), jnp.float64(0.0), jnp.float64(-1.0)
    assert float(quadratic_interpolate(one, zero, zero, neg1, zero)) \
        == pytest.approx(1.5)
    assert float(quadratic_interpolate_fixed(one, zero, neg1, zero)) \
        == pytest.approx(0.5)
    assert orc.quadratic_interpolate(1.0, 0.0, 0.0, -1.0, 0.0) \
        == pytest.approx(1.5)
    assert orc.quadratic_interpolate_fixed(1.0, 0.0, -1.0, 0.0) \
        == pytest.approx(0.5)


def test_fixed_fidelity_interpolation_end_to_end():
    """fidelity="fixed" with real interpolation roots converges and spends
    fewer evaluations than the reference quirk path on wolfe_interpolation
    (measured: 434 vs 719 n_fev on 32-D rosenbrock, seed 3)."""
    from tpu_lbfgs import Status, minimize
    p = get_problem("rosenbrock")
    x0 = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, 32))
    results = {}
    for fid in ("reference", "fixed"):
        cfg = LBFGSConfig(line_search="wolfe_interpolation", fidelity=fid,
                          max_iters=3000, tol=1e-6, c2=0.9)
        r = minimize(p.f, x0, cfg, grad=p.grad)
        assert int(r.status) == Status.CONVERGED
        results[fid] = int(r.n_fev)
    assert results["fixed"] < results["reference"]

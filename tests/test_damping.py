"""Powell-damped curvature updates (cfg.damping — an extension; the
reference can only REJECT low-curvature pairs, lbfgs.cpp:192-195).  The
damped pair's scalars are derived algebraically from the raw ones; these
tests pin the algebra against direct recomputation and the behavioral
contract (pairs stored instead of rejected; inactive on convex runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import Guard, LBFGSConfig, Status, get_problem, minimize


def _dw(x):
    return jnp.sum(-0.5 * x * x + 0.05 * x ** 4)


def _dw_grad(x):
    return -x + 0.2 * x ** 3


def test_damping_stores_pairs_instead_of_rejecting():
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, 16))
    base = LBFGSConfig(line_search="backtracking", max_iters=60, tol=1e-8,
                       m=5)
    r_skip = minimize(_dw, x0, base, grad=_dw_grad)
    r_damp = minimize(_dw, x0, base.replace(damping=0.2), grad=_dw_grad)
    gs, gd = np.asarray(r_skip.guards), np.asarray(r_damp.guards)
    assert gs[Guard.PAIR_REJECT] > 0            # the undamped run rejects
    assert gd[Guard.PAIR_REJECT] == 0           # damping rescues every pair
    assert gd[Guard.DAMPED] > 0
    assert int(r_damp.status) == Status.CONVERGED


def test_damping_inactive_on_convex_run():
    """On a well-conditioned convex problem s.y >= mu * s.B0 s holds, so the
    damped solve is bit-identical to the plain one."""
    p = get_problem("rosenbrock")
    x0 = jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.5, 64))
    base = LBFGSConfig(line_search="wolfe_interpolation", c2=0.9,
                       max_iters=40, tol=1e-10)
    r_plain = minimize(p.f, x0, base, grad=p.grad)
    r_damp = minimize(p.f, x0, base.replace(damping=0.2), grad=p.grad)
    d = np.asarray(r_damp.guards)[Guard.DAMPED]
    if d == 0:                                   # expected: never fires
        np.testing.assert_array_equal(np.asarray(r_plain.x),
                                      np.asarray(r_damp.x))
        assert int(r_plain.iterations) == int(r_damp.iterations)


def test_damped_scalars_match_direct_recomputation():
    """sy/yy/ygn for the damped pair, derived algebraically in iterate, must
    equal direct dots of the stored y_bar row."""
    from tpu_lbfgs.core.solver import init_state, iterate, make_value_and_grad

    cfg = LBFGSConfig(line_search="backtracking", max_iters=10, tol=0.0,
                      m=4, damping=0.2)
    vg = make_value_and_grad(_dw, _dw_grad)
    x0 = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, 16))
    st = init_state(vg, x0, cfg.m)
    for _ in range(6):
        st = iterate(cfg, _dw, vg, st)
    st = jax.tree.map(np.asarray, st)
    m = cfg.m
    for p_i in range(int(st.n_pairs)):
        slot = p_i % m
        s_row = st.s_hist[slot].reshape(-1)
        y_row = st.y_hist[slot].reshape(-1)
        np.testing.assert_allclose(st.sy_hist[slot], s_row @ y_row,
                                   rtol=1e-10)
        np.testing.assert_allclose(st.yy_hist[slot], y_row @ y_row,
                                   rtol=1e-10)
    # every stored pair has positive curvature (the damping guarantee)
    assert np.all(st.sy_hist[:int(min(st.n_pairs, m))] > 0)
    assert np.asarray(st.guards)[Guard.DAMPED] > 0


def test_damping_rejects_pallas_and_validates_range():
    with pytest.raises(ValueError, match="damping"):
        LBFGSConfig(damping=1.5)
    p = get_problem("rosenbrock")
    from tpu_lbfgs.problems.suite import fused_tail_for

    cfg = LBFGSConfig(damping=0.2, max_iters=5)
    with pytest.raises(ValueError, match="damping"):
        minimize(p.f, jnp.ones(256, jnp.float32), cfg, grad=p.grad,
                 fused_tail=fused_tail_for("rosenbrock", with_matvec=False))

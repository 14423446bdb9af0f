"""Bounded (cond-free) lockstep batch solves: `solve_bounded` /
`vmap_minimize(lockstep="bounded")` must match the masked while_loop
formulation exactly on fixed-budget workloads — including lanes that FAIL
mid-run, which rely on `iterate`'s idempotence (terminal lanes re-freeze
deterministically; every counter advance is gated on RUNNING)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import Guard, LBFGSConfig, Status, get_problem
from tpu_lbfgs.batch import vmap_minimize


def _mixed_batch():
    """(f, grad, x0s, params): params[b] = +1 normal lane / -1 lying-gradient
    lane whose line search fails immediately (the lane freezes)."""
    def f(x, s):
        return jnp.sum(x * x)

    def grad(x, s):
        return 2.0 * s * x          # s=-1: sign-lying gradient -> Armijo
        #                             unsatisfiable -> line_search_failed

    rng = np.random.default_rng(7)
    B = 8
    x0s = jnp.asarray(rng.uniform(0.5, 2.0, (B, 32)))
    params = jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, -1.0, 1.0, 1.0])
    return f, grad, x0s, params


def test_bounded_matches_while_fixed_budget_with_failed_lanes():
    f, grad, x0s, params = _mixed_batch()
    cfg = LBFGSConfig(line_search="backtracking", fidelity="fixed",
                      max_iters=25, tol=0.0, m=4)
    r_while = vmap_minimize(f, x0s, cfg, grad=grad, problem_params=params)
    r_bound = vmap_minimize(f, x0s, cfg, grad=grad, problem_params=params,
                            lockstep="bounded")
    # Failed lanes froze; running lanes hit the budget — identical either way.
    np.testing.assert_array_equal(np.asarray(r_while.status),
                                  np.asarray(r_bound.status))
    np.testing.assert_array_equal(np.asarray(r_while.iterations),
                                  np.asarray(r_bound.iterations))
    np.testing.assert_array_equal(np.asarray(r_while.x),
                                  np.asarray(r_bound.x))
    np.testing.assert_array_equal(np.asarray(r_while.n_fev),
                                  np.asarray(r_bound.n_fev))
    np.testing.assert_array_equal(np.asarray(r_while.guards),
                                  np.asarray(r_bound.guards))
    # The lying lanes really did fail (the scenario is live).
    st = np.asarray(r_while.status)
    assert (st == Status.LINE_SEARCH_FAILED).sum() == 2
    # Failed lanes froze their counters at the failure iteration.
    k = np.asarray(r_while.iterations)
    assert np.all(k[st == Status.LINE_SEARCH_FAILED] == 1)
    g = np.asarray(r_while.guards)
    assert np.all(g[st == Status.LINE_SEARCH_FAILED, Guard.LANE_FREEZE] == 1)


def test_bounded_polishes_past_tol():
    """With tol > 0, bounded mode keeps iterating past convergence — f only
    improves; status still reports CONVERGED at finalize."""
    p = get_problem("quadratic")
    x0s = jnp.full((4, 64), 3.0)
    cfg = LBFGSConfig(max_iters=30, tol=1e-5)
    r_while = vmap_minimize(p.f, x0s, cfg, grad=p.grad)
    r_bound = vmap_minimize(p.f, x0s, cfg, grad=p.grad, lockstep="bounded")
    assert np.all(np.asarray(r_bound.status) == Status.CONVERGED)
    assert np.all(np.asarray(r_bound.f) <= np.asarray(r_while.f) + 1e-30)
    # bounded runs the full budget
    assert np.all(np.asarray(r_bound.iterations) == 30)


def test_bounded_honors_refresh_interval():
    """solve_bounded's statically-unrolled refresh segments refresh at the
    same k-multiples as the chunked while_loop path."""
    from tpu_lbfgs.core.solver import (
        init_state,
        make_value_and_grad,
        solve_bounded,
        solve_from_state,
    )

    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    x0 = jnp.asarray(np.random.default_rng(3).uniform(-2, 2, 256))
    cfg = LBFGSConfig(direction="compact_incremental", ls_eval="polynomial",
                      line_search="backtracking", max_iters=40, tol=0.0,
                      refresh_interval=7)
    st0 = init_state(vg, x0, cfg.m)
    out_b = jax.jit(lambda s: solve_bounded(cfg, p.f, vg, s, p.dir_poly))(st0)
    out_w = jax.jit(
        lambda s: solve_from_state(cfg, p.f, vg, s, p.dir_poly))(st0)
    np.testing.assert_array_equal(np.asarray(out_b.x), np.asarray(out_w.x))
    assert int(out_b.k) == int(out_w.k) == 40


def test_bad_lockstep_rejected():
    p = get_problem("quadratic")
    with pytest.raises(ValueError, match="lockstep"):
        vmap_minimize(p.f, jnp.zeros((2, 16)), LBFGSConfig(), grad=p.grad,
                      lockstep="nope")


def test_bounded_lockstep_on_2d_mesh():
    """lockstep="bounded" through sharded_vmap_minimize (the dp x tp stack):
    matches the while-loop batched+sharded solve on a fixed budget."""
    import warnings

    from tpu_lbfgs.dist import make_mesh_2d, sharded_vmap_minimize

    p = get_problem("rosenbrock")
    mesh2 = make_mesh_2d(batch_size=2)
    x0s = jnp.asarray(np.random.default_rng(5).uniform(-2, 2, (4, 8192)),
                      jnp.float32)
    cfg = LBFGSConfig(line_search="backtracking",
                      direction="compact_incremental", ls_eval="polynomial",
                      max_iters=15, tol=0.0, use_pallas=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r_w = sharded_vmap_minimize(p.f, x0s, cfg, mesh=mesh2, grad=p.grad,
                                    dir_poly=p.dir_poly, problem="rosenbrock")
        r_b = sharded_vmap_minimize(p.f, x0s, cfg, mesh=mesh2, grad=p.grad,
                                    dir_poly=p.dir_poly, problem="rosenbrock",
                                    lockstep="bounded")
    np.testing.assert_array_equal(np.asarray(r_w.iterations),
                                  np.asarray(r_b.iterations))
    np.testing.assert_allclose(np.asarray(r_w.f), np.asarray(r_b.f),
                               rtol=1e-6)


def test_bounded_with_record_trace_rejected():
    """Regression (r4 review): lockstep='bounded' + record_trace would
    silently run while-mode semantics; both batch entry points refuse."""
    from tpu_lbfgs.dist import make_mesh_2d, sharded_vmap_minimize

    p = get_problem("quadratic")
    cfg = LBFGSConfig(max_iters=10, record_trace=True)
    with pytest.raises(ValueError, match="record_trace"):
        vmap_minimize(p.f, jnp.zeros((2, 16)), cfg, grad=p.grad,
                      lockstep="bounded")
    with pytest.raises(ValueError, match="record_trace"):
        sharded_vmap_minimize(p.f, jnp.zeros((4, 1024)), cfg, grad=p.grad,
                              mesh=make_mesh_2d(batch_size=2),
                              lockstep="bounded")
    with pytest.raises(ValueError, match="lockstep"):
        sharded_vmap_minimize(p.f, jnp.zeros((4, 1024)),
                              LBFGSConfig(max_iters=10), grad=p.grad,
                              mesh=make_mesh_2d(batch_size=2),
                              lockstep="bound")


def test_bounded_converged_lane_not_reported_failed():
    """A lane that reaches g_norm < tol under the bounded loop keeps
    iterating; if a later near-optimum line search underflows, the lane
    freezes — but it froze AT a point satisfying tol, so finalize must
    report CONVERGED, matching the 'while' formulation (round-4 advisor
    finding).  Rosenbrock in f32 with a generous budget reliably hits the
    post-convergence underflow."""
    import jax

    from tpu_lbfgs import Status, get_problem
    from tpu_lbfgs.core.solver import (
        init_state,
        make_value_and_grad,
        solve_bounded,
        solve_from_state,
    )

    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=400, tol=1e-3,
                      fidelity="fixed", pair_skip_threshold=1e-10)
    x0 = jnp.asarray(
        np.random.default_rng(7).uniform(-2.0, 2.0, (32, 64)), jnp.float32)

    def run(solve, x0s):
        def one(x):
            st = init_state(vg, x, cfg.m, None)
            return solve(cfg, p.f, vg, st)
        return jax.vmap(one)(x0s)

    from functools import partial

    rb = jax.jit(partial(run, solve_bounded))(x0)
    rw = jax.jit(partial(run, solve_from_state))(x0)
    sb = np.asarray(rb.status)
    sw = np.asarray(rw.status)
    # Every lane the while formulation reports CONVERGED must be CONVERGED
    # under bounded too (bounded lanes only keep polishing past tol).
    conv = sw == Status.CONVERGED
    assert conv.any()
    np.testing.assert_array_equal(sb[conv], Status.CONVERGED)
    # and bounded's g_norm on those lanes still satisfies tol
    assert np.all(np.asarray(rb.g_norm)[conv] < cfg.tol)

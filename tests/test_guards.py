"""Guard-activation counters (VERDICT r3 missing #2): the solver counts every
safeguard firing — the device-side replacement for the reference's warnings
(lbfgs.cpp:105,121 invalid rho/gamma, :150 non-descent, :194 curvature skip;
parallel line_search.cpp:38-41 alpha rescue) — and the counts must MATCH the
oracle's event counts on crafted degenerate problems.

Oracle comparisons run under fidelity="reference" (the oracle specifies the
reference's exact rules); the "fixed"-fidelity break-means-fail deviation is
asserted separately on the JAX side.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import Guard, LBFGSConfig, Status, get_problem, minimize
from tpu_lbfgs.oracle import lbfgs_oracle

NAMES = Guard.NAMES


def _jax_counts(res) -> dict:
    return dict(zip(NAMES, (int(v) for v in np.asarray(res.guards))))


# Double well: concave near the origin -> negative-curvature pairs.
def _dw_np(x):
    return float(np.sum(-0.5 * x * x + 0.05 * x ** 4))


def _dw_grad_np(x):
    return -x + 0.2 * x ** 3


def _dw_j(x):
    return jnp.sum(-0.5 * x * x + 0.05 * x ** 4)


def _dw_grad_j(x):
    return -x + 0.2 * x ** 3


def test_guards_zero_on_clean_solve():
    p = get_problem("quadratic")
    r = minimize(p.f, jnp.full((64,), 3.0), LBFGSConfig(max_iters=50),
                 grad=p.grad)
    assert int(r.status) == Status.CONVERGED
    assert _jax_counts(r) == {n: 0 for n in NAMES}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pair_reject_counts_match_oracle(seed):
    """Negative-curvature pairs are rejected (lbfgs.cpp:194's warning) —
    exact count parity with the oracle."""
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-0.5, 0.5, 16)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=50, tol=1e-8, m=5)
    o = lbfgs_oracle(_dw_np, _dw_grad_np, x0.copy(), cfg)
    r = minimize(_dw_j, jnp.asarray(x0), cfg, grad=_dw_grad_j)
    assert _jax_counts(r) == o.guard_counts
    assert o.guard_counts["pair_reject"] > 0          # the case is degenerate
    assert int(r.iterations) == o.iterations


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_dir_fallback_counts_match_oracle(seed):
    """curvature_threshold < 0 stores negative-sy pairs -> gamma <= 0 -> the
    invalid-gamma steepest-descent fallback (lbfgs.cpp:117-124's warning)."""
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-0.5, 0.5, 16)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=50, tol=1e-8,
                      m=5, curvature_threshold=-10.0)
    o = lbfgs_oracle(_dw_np, _dw_grad_np, x0.copy(), cfg)
    r = minimize(_dw_j, jnp.asarray(x0), cfg, grad=_dw_grad_j)
    assert _jax_counts(r) == o.guard_counts
    assert o.guard_counts["dir_fallback"] > 0
    assert int(r.iterations) == o.iterations


def test_ls_rescue_counts_match_oracle():
    """The parallel implementations' alpha floor rescue
    (line_search.cpp:38-41), counted on both sides."""
    def f_np(x):
        return float(np.sum(np.cos(x)) + 0.01 * np.sum(x * x))

    def g_np(x):
        return -np.sin(x) + 0.02 * x

    f_j = lambda x: jnp.sum(jnp.cos(x)) + 0.01 * jnp.sum(x * x)
    g_j = lambda x: -jnp.sin(x) + 0.02 * x
    x0 = np.random.default_rng(5).uniform(-6, 6, 32)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=40, tol=1e-10,
                      m=5, alpha_rescue_floor=0.9, alpha_rescue_value=0.5)
    o = lbfgs_oracle(f_np, g_np, x0.copy(), cfg)
    r = minimize(f_j, jnp.asarray(x0), cfg, grad=g_j)
    assert _jax_counts(r) == o.guard_counts
    assert o.guard_counts["ls_rescue"] > 0


def test_lane_freeze_counter_fixed_fidelity():
    """A gradient whose sign lies makes Armijo unsatisfiable; under
    fidelity="fixed" the search FAILS (alpha=0) and the lane freezes — a
    documented deviation from the reference, which would walk on the
    underflowed garbage step (solver.iterate docstring)."""
    f = lambda x: jnp.sum(x * x)
    lying_grad = lambda x: -2.0 * x
    cfg = LBFGSConfig(line_search="backtracking", fidelity="fixed",
                      max_iters=30, tol=1e-12)
    r = minimize(f, jnp.full((8,), 3.0), cfg, grad=lying_grad)
    counts = _jax_counts(r)
    assert int(r.status) == Status.LINE_SEARCH_FAILED
    assert counts["lane_freeze"] == 1


def test_guards_in_trace_and_result_consistent():
    """Trace.guards carries the cumulative counters per iteration; the last
    recorded row equals SolveResult.guards."""
    rng = np.random.default_rng(1)
    x0 = rng.uniform(-0.5, 0.5, 16)
    cfg = LBFGSConfig(line_search="backtracking", max_iters=50, tol=1e-8,
                      m=5, record_trace=True)
    r = minimize(_dw_j, jnp.asarray(x0), cfg, grad=_dw_grad_j)
    assert r.trace is not None and r.trace.guards is not None
    tg = np.asarray(r.trace.guards)
    assert tg.shape == (cfg.max_iters, Guard.N)
    np.testing.assert_array_equal(tg[-1], np.asarray(r.guards))
    # cumulative: non-decreasing
    assert np.all(np.diff(tg, axis=0) >= 0)


def test_guards_survive_vmap():
    """Per-lane counters under vmapped solves (each lane its own counts)."""
    from tpu_lbfgs.batch import vmap_minimize

    x0s = jnp.stack([jnp.asarray(np.random.default_rng(s).uniform(-0.5, 0.5, 16))
                     for s in range(4)])
    cfg = LBFGSConfig(line_search="backtracking", max_iters=50, tol=1e-8, m=5)
    res = vmap_minimize(_dw_j, x0s, cfg, grad=_dw_grad_j)
    g = np.asarray(res.guards)
    assert g.shape == (4, Guard.N)
    for s in range(4):
        o = lbfgs_oracle(_dw_np, _dw_grad_np, np.asarray(x0s[s]).copy(), cfg)
        assert dict(zip(NAMES, (int(v) for v in g[s]))) == o.guard_counts


def test_guard_counters_checkpoint_roundtrip(tmp_path):
    """Counters ride the state through save/restore; pre-counter checkpoints
    (no 'guards' key) load with zeroed counters."""
    from tpu_lbfgs.core.solver import init_state, make_value_and_grad
    from tpu_lbfgs.io.checkpoint import load_state, save_state

    p = get_problem("quadratic")
    vg = make_value_and_grad(p.f, p.grad)
    st = init_state(vg, jnp.full((32,), 2.0), 5)
    st = st._replace(guards=jnp.arange(1, Guard.N + 1, dtype=jnp.int32))
    path = tmp_path / "ck.npz"
    save_state(path, st)
    st2 = load_state(path)
    np.testing.assert_array_equal(np.asarray(st2.guards),
                                  np.asarray(st.guards))
    # legacy checkpoint without the guards field
    import numpy as _np
    with _np.load(path, allow_pickle=False) as z:
        legacy = {k: z[k] for k in z.files if k != "guards"}
    legacy_path = tmp_path / "legacy.npz"
    _np.savez(legacy_path, **legacy)
    st3 = load_state(legacy_path)
    np.testing.assert_array_equal(np.asarray(st3.guards), np.zeros(Guard.N))
    # shorter counter vector (saved before a Guard extension): zero-extended
    short = dict(legacy)
    short["guards"] = _np.asarray([9, 8, 7], _np.int32)
    short_path = tmp_path / "short.npz"
    _np.savez(short_path, **short)
    st4 = load_state(short_path)
    g4 = np.asarray(st4.guards)
    assert g4.shape == (Guard.N,)
    np.testing.assert_array_equal(g4[:3], [9, 8, 7])
    assert np.all(g4[3:] == 0)

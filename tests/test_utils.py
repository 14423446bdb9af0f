"""Compensated reductions and the roofline traffic model."""
import jax.numpy as jnp
import numpy as np

from tpu_lbfgs.config import LBFGSConfig
from tpu_lbfgs.utils import compensated_dot, traffic_model


def test_compensated_dot_beats_plain_f32():
    """Adversarial case: large cancelling values + small signal."""
    rng = np.random.default_rng(0)
    n = 1 << 16
    big = rng.normal(size=n) * 1e6
    small = rng.normal(size=n)
    a64 = big + small
    b64 = rng.normal(size=n)
    exact = float(np.dot(a64, b64))

    a32 = jnp.asarray(a64, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    plain = float(jnp.vdot(a32, b32))
    comp = float(compensated_dot(a32, b32))
    # The compensated result must be at least as close to the f64 truth.
    assert abs(comp - exact) <= abs(plain - exact) + 1e-3 * abs(exact)


def test_compensated_dot_matches_exact_small():
    a = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    b = jnp.asarray([4.0, 5.0, 6.0], jnp.float32)
    assert float(compensated_dot(a, b)) == 32.0


def test_compensated_dot_f64_agrees():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=10000))
    b = jnp.asarray(rng.normal(size=10000))
    assert np.isclose(float(compensated_dot(a, b)),
                      float(jnp.vdot(a, b)), rtol=1e-12)


def test_traffic_model_sanity():
    cfg = LBFGSConfig(direction="compact", ls_eval="polynomial", m=10)
    tm = traffic_model(cfg, d=1 << 20)
    assert tm.passes_direction > tm.passes_line_search
    assert tm.bytes_per_iter == tm.passes_total * (1 << 20) * 4
    peak = tm.peak_iters_per_s("v5e")
    assert 1000 < peak < 100000
    assert 0 < tm.roofline_fraction(peak * 0.5) == 0.5


def test_traffic_model_auto_history_matches_solver_rule():
    """history_dtype='auto' in the traffic model must mirror
    resolve_history_dtype: bf16 only for STREAMING f32 rings — an f64 run
    keeps full-precision history (hw=1.0), never a modeled bf16 ring."""
    cfg = LBFGSConfig(direction="compact_incremental", ls_eval="polynomial",
                      m=10, history_dtype="auto")
    d = 1 << 24  # 2*m*d*8 well past VMEM residency
    tm64 = traffic_model(cfg, d=d, dtype_bytes=8)
    tm64_full = traffic_model(cfg.replace(history_dtype=None), d=d,
                              dtype_bytes=8)
    assert tm64.passes_total == tm64_full.passes_total
    tm32 = traffic_model(cfg, d=d, dtype_bytes=4)
    tm32_bf16 = traffic_model(cfg.replace(history_dtype="bfloat16"), d=d,
                              dtype_bytes=4)
    assert tm32.passes_total == tm32_bf16.passes_total


def test_accurate_dots_solver_path():
    from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize
    p = get_problem("coupled_quadratic")
    cfg = LBFGSConfig(max_iters=200, tol=1e-4, accurate_dots=True)
    r = minimize(p.f, jnp.full((1000,), 1.5, jnp.float32), cfg, grad=p.grad)
    assert int(r.status) == Status.CONVERGED


def test_time_to_tolerance_refined_reaches_1e5():
    """The north-star metric path (BASELINE.json: time-to-||g||<=1e-5 at
    d~1e6): two-stage f32->f64 refinement must actually reach 1e-5 — below
    the f32 gradient-entry noise floor — with only a handful of f64
    iterations (superlinear local convergence from the f32 iterate)."""
    from tpu_lbfgs.bench.harness import time_to_tolerance_refined

    for backend in ("native", "jax"):
        r = time_to_tolerance_refined(d=2048, max_iters=30_000,
                                      refine_iters=2_000,
                                      refine_backend=backend)
        assert r["status"] == "converged", (backend, r)
        assert r["g_norm"] <= 1e-5
        assert r["refine_iterations"] <= 100, (backend, r)

"""Pallas kernels vs their jnp fallbacks (interpret mode on CPU): identical
semantics to f32 rounding, at awkward sizes crossing block boundaries.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs import LBFGSConfig, Status, get_problem, minimize
from tpu_lbfgs.kernels import (
    FUSED_VG,
    combine_direction,
    iteration_tail,
    pallas_ok,
)
from tpu_lbfgs.problems.suite import fused_value_and_grad

# 128-multiples that are NOT block multiples, crossing 1 and 2 block edges.
DIMS = [128 * 3, 128 * 513, 128 * 1030]


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(0)
    out = {}
    for d in DIMS:
        out[d] = tuple(jnp.asarray(rng.normal(size=d), jnp.float32)
                       for _ in range(4))
    return out


@pytest.mark.parametrize("d", DIMS)
def test_iteration_tail(vecs, d):
    x, dv, g, gn = vecs[d]
    alpha = jnp.float32(0.37)
    outs_p = iteration_tail(x, dv, alpha, g, gn, use_pallas=True)
    outs_j = iteration_tail(x, dv, alpha, g, gn, use_pallas=False)
    names = ("x_new", "s", "y", "sy", "yy", "gg")
    for name, a, b in zip(names, outs_p, outs_j):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 1e-4, name


@pytest.mark.parametrize("d", DIMS)
@pytest.mark.parametrize("m", [1, 10, 20])
def test_combine_direction(vecs, d, m):
    rng = np.random.default_rng(m)
    g = vecs[d][0]
    S = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=m), jnp.float32)
    u = jnp.asarray(rng.normal(size=m), jnp.float32)
    gamma = jnp.float32(0.8)
    rp = np.asarray(combine_direction(g, S, Y, v, u, gamma, use_pallas=True))
    rj = np.asarray(combine_direction(g, S, Y, v, u, gamma, use_pallas=False))
    assert np.max(np.abs(rp - rj)) / (np.max(np.abs(rj)) + 1e-30) < 1e-4


@pytest.mark.parametrize("d", DIMS)
@pytest.mark.parametrize("name", sorted(FUSED_VG))
def test_fused_vg(vecs, d, name):
    x = vecs[d][0]
    fn = FUSED_VG[name]
    fp, gp = fn(x, use_pallas=True)
    fj, gj = fn(x, use_pallas=False)
    assert abs(float(fp) - float(fj)) / (abs(float(fj)) + 1e-30) < 1e-5
    gp, gj = np.asarray(gp, np.float64), np.asarray(gj, np.float64)
    assert np.max(np.abs(gp - gj)) / (np.max(np.abs(gj)) + 1e-30) < 1e-4


@pytest.mark.parametrize("name", sorted(FUSED_VG))
def test_fused_vg_matches_problem_fp64_semantics(name):
    """The fused kernels compute the same math as the Problem definitions."""
    p = get_problem(name)
    rng = np.random.default_rng(3)
    x64 = rng.normal(size=128 * 9)
    f64 = float(p.f(jnp.asarray(x64)))
    x32 = jnp.asarray(x64, jnp.float32)
    f32, g32 = FUSED_VG[name](x32, use_pallas=True)
    assert abs(float(f32) - f64) / (abs(f64) + 1e-30) < 1e-4
    g64 = np.asarray(p.grad(jnp.asarray(x64)))
    scale = np.max(np.abs(g64)) + 1e-30
    assert np.max(np.abs(np.asarray(g32, np.float64) - g64)) / scale < 1e-4


def test_pallas_ok_gating():
    assert not pallas_ok(jnp.zeros(100, jnp.float32))        # not lane-aligned
    assert not pallas_ok(jnp.zeros(128, jnp.float64))        # f64
    assert pallas_ok(jnp.zeros(256, jnp.float32))


def test_full_solve_with_pallas():
    """End-to-end: use_pallas solver + fused vg converges identically-ish to
    the jnp path on a d % 128 == 0 problem in f32."""
    d = 128 * 16
    p = get_problem("coupled_quadratic")
    x0 = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, d), jnp.float32)
    cfg_j = LBFGSConfig(line_search="wolfe_interpolation", direction="compact",
                        max_iters=100, tol=1e-2)
    cfg_p = cfg_j.replace(use_pallas=True)
    vg = fused_value_and_grad("coupled_quadratic", use_pallas=True)
    r_j = minimize(p.f, x0, cfg_j, grad=p.grad)
    r_p = minimize(p.f, x0, cfg_p, value_and_grad=vg)
    assert int(r_p.status) == Status.CONVERGED
    assert abs(int(r_p.iterations) - int(r_j.iterations)) <= 1
    assert abs(float(r_p.f) - float(r_j.f)) < 1e-2


@pytest.mark.parametrize("br", [64, 256, 2048])
def test_block_rows_override_preserves_semantics(br, monkeypatch):
    """BLOCK_ROWS is env-tunable for the giant-d sweeps
    (TPU_LBFGS_BLOCK_ROWS); any legal value must leave kernel semantics
    unchanged (padding + index masking handle non-multiples)."""
    from tpu_lbfgs.kernels import pallas_ops

    monkeypatch.setattr(pallas_ops, "BLOCK_ROWS", br)
    d = 128 * 97          # not a multiple of any swept block size
    rng = np.random.default_rng(br)
    x, dv, g, gn = (jnp.asarray(rng.normal(size=d), jnp.float32)
                    for _ in range(4))
    alpha = jnp.float32(0.41)
    outs_p = iteration_tail(x, dv, alpha, g, gn, use_pallas=True)
    outs_j = iteration_tail(x, dv, alpha, g, gn, use_pallas=False)
    for name, a, b in zip(("x_new", "s", "y", "sy", "yy", "gg"),
                          outs_p, outs_j):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.max(np.abs(b)) + 1e-30
        assert np.max(np.abs(a - b)) / scale < 1e-4, (name, br)
    vg_p = fused_value_and_grad("rosenbrock", use_pallas=True)
    vg_j = fused_value_and_grad("rosenbrock", use_pallas=False)
    fp, gp = vg_p(x)
    fj, gj = vg_j(x)
    assert abs(float(fp) - float(fj)) / (abs(float(fj)) + 1e-30) < 1e-4
    assert float(jnp.max(jnp.abs(gp - gj))) / \
        (float(jnp.max(jnp.abs(gj))) + 1e-30) < 1e-4

"""Direction computation: lax.scan two-loop vs NumPy oracle vs compact
representation — all three must agree on -H g for the same history.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_lbfgs.config import LBFGSConfig
from tpu_lbfgs.core.direction import compact_direction, two_loop_direction
from tpu_lbfgs.oracle import _direction as oracle_direction
from tpu_lbfgs.types import LBFGSState, hist_block


def _make_state(rng, d=32, m=6, n_pairs=None, spd=True):
    """Random state with a curvature-consistent history (sy > 0)."""
    n_pairs = rng.integers(0, 2 * m + 1) if n_pairs is None else n_pairs
    hist_len = min(n_pairs, m)
    s_hist = np.zeros((m, d))
    y_hist = np.zeros((m, d))
    # Build pairs in logical order, then place into ring slots.
    pairs = []
    A = None
    if spd:
        M_ = rng.normal(size=(d, d))
        A = M_ @ M_.T + d * np.eye(d)  # SPD -> y = A s gives sy > 0
    for j in range(hist_len):
        s = rng.normal(size=d)
        y = (A @ s) if spd else rng.normal(size=d)
        pairs.append((s, y))
    for j, (s, y) in enumerate(pairs):
        slot = (n_pairs - hist_len + j) % m
        s_hist[slot] = s
        y_hist[slot] = y
    sy = np.ones(m)
    yy = np.ones(m)
    for j, (s, y) in enumerate(pairs):
        slot = (n_pairs - hist_len + j) % m
        sy[slot] = float(s @ y)
        yy[slot] = float(y @ y)
    g = rng.normal(size=d)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    state = LBFGSState(
        x=jnp.zeros(d), f=jnp.asarray(0.0), g=jnp.asarray(g),
        g_norm=jnp.asarray(np.linalg.norm(g)),
        s_hist=jnp.asarray(s_hist).reshape(m, *hist_block(d)),
        y_hist=jnp.asarray(y_hist).reshape(m, *hist_block(d)),
        sy_hist=jnp.asarray(sy), yy_hist=jnp.asarray(yy),
        SY=jnp.asarray(s_hist @ y_hist.T), YY=jnp.asarray(y_hist @ y_hist.T),
        Sg=jnp.asarray(s_hist @ g), Yg=jnp.asarray(y_hist @ g),
        n_pairs=i32(n_pairs), k=i32(n_pairs), status=i32(0),
        alpha=jnp.asarray(1.0), n_fev=i32(0), n_gev=i32(0))
    s_list = [p[0] for p in pairs]
    y_list = [p[1] for p in pairs]
    return state, g, s_list, y_list


@pytest.mark.parametrize("n_pairs", [0, 1, 3, 6, 7, 13])
def test_two_loop_matches_oracle(n_pairs):
    rng = np.random.default_rng(n_pairs)
    cfg = LBFGSConfig(m=6)
    state, g, s_list, y_list = _make_state(rng, n_pairs=n_pairs)
    d_jax = np.asarray(jax.jit(lambda s: two_loop_direction(cfg, s))(state))
    d_np = oracle_direction(cfg, g.copy(), s_list, y_list)
    np.testing.assert_allclose(d_jax, d_np, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n_pairs", [0, 1, 3, 6, 7, 13])
def test_compact_matches_two_loop(n_pairs):
    """The Byrd-Nocedal-Schnabel compact representation is algebraically the
    same H as the two-loop recursion."""
    rng = np.random.default_rng(100 + n_pairs)
    cfg = LBFGSConfig(m=6)
    state, *_ = _make_state(rng, n_pairs=n_pairs)
    d_loop = np.asarray(jax.jit(lambda s: two_loop_direction(cfg, s))(state))
    d_comp = np.asarray(jax.jit(lambda s: compact_direction(cfg, s))(state))
    np.testing.assert_allclose(d_comp, d_loop, rtol=1e-8, atol=1e-10)


def test_empty_history_steepest_descent():
    rng = np.random.default_rng(5)
    cfg = LBFGSConfig(m=6)
    state, g, _, _ = _make_state(rng, n_pairs=0)
    for fn in (two_loop_direction, compact_direction):
        np.testing.assert_allclose(np.asarray(fn(cfg, state)), -g, rtol=1e-12)


def test_gpu_pair_skip_semantics():
    """pair_skip_threshold: low-curvature pairs are skipped individually
    (L-BFGS.cu:222-223) instead of aborting to steepest descent."""
    rng = np.random.default_rng(9)
    cfg = LBFGSConfig(m=6, pair_skip_threshold=1e-10)
    state, g, s_list, y_list = _make_state(rng, n_pairs=4)
    # Poison one pair's curvature scalar to force a skip.
    sy = np.asarray(state.sy_hist).copy()
    sy[1] = 0.0
    state = state._replace(sy_hist=jnp.asarray(sy))
    d_jax = np.asarray(two_loop_direction(cfg, state))
    # Oracle recomputes sy from s,y — emulate by zeroing that pair's vectors'
    # dot: rebuild with the matching pair removed is NOT equivalent (alphas
    # couple); instead check the guard fired and direction is finite & descent.
    assert np.all(np.isfinite(d_jax))
    assert float(np.dot(d_jax, g)) < 0

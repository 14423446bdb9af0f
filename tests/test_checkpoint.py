"""Checkpoint/resume: interrupted solve + resume == uninterrupted solve."""
import jax.numpy as jnp
import numpy as np

from tpu_lbfgs import LBFGSConfig, Status, get_problem, init_state, solve_from_state
from tpu_lbfgs.core.solver import make_value_and_grad
from tpu_lbfgs.io import load_state, save_state


def test_roundtrip(tmp_path):
    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    st = init_state(vg, jnp.full((32,), -1.2, jnp.float64), 5)
    path = tmp_path / "ck.npz"
    save_state(path, st)
    st2 = load_state(path)
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_equals_straight_run(tmp_path):
    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    x0 = jnp.full((24,), -1.2, jnp.float64)

    # Straight run: 60 iterations.
    cfg60 = LBFGSConfig(line_search="wolfe_interpolation", c2=0.9,
                        max_iters=60, tol=1e-14)
    straight = solve_from_state(cfg60, p.f, vg, init_state(vg, x0, cfg60.m))

    # Interrupted: 25 iterations, checkpoint, reload, 35 more.
    cfg25 = cfg60.replace(max_iters=25)
    part = solve_from_state(cfg25, p.f, vg, init_state(vg, x0, cfg25.m))
    path = tmp_path / "mid.npz"
    save_state(path, part._replace(status=jnp.asarray(0, jnp.int32)))
    resumed_state = load_state(path)
    resumed = solve_from_state(cfg60, p.f, vg, resumed_state)

    assert int(resumed.k) == int(straight.k)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(straight.x),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(float(resumed.f), float(straight.f),
                               rtol=1e-12, atol=1e-14)


def test_bad_schema_rejected(tmp_path):
    import numpy as _np
    import pytest
    path = tmp_path / "bogus.npz"
    _np.savez(path, __schema__=_np.asarray("something-else"),
              **{f: _np.zeros(1) for f in
                 __import__("tpu_lbfgs").types.LBFGSState._fields})
    with pytest.raises(ValueError, match="schema"):
        load_state(path)


def test_bfloat16_history_roundtrip(tmp_path):
    """Regression: np.savez writes ml_dtypes bfloat16 as raw '|V2' bytes,
    which np.load could not hand back — bf16-history checkpoints (the
    recommended config at giant d) saved fine but were unloadable.  Now the
    ring is stored as exact f32 and cast back bit-identically on load."""
    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    cfg = LBFGSConfig(max_iters=7, tol=0.0, history_dtype="bfloat16")
    st = init_state(vg, jnp.full((256,), -1.2, jnp.float32), 5, "bfloat16")
    st = solve_from_state(cfg, p.f, vg, st)
    assert st.s_hist.dtype == jnp.bfloat16
    path = tmp_path / "ck_bf16.npz"
    save_state(path, st)
    st2 = load_state(path)
    assert st2.s_hist.dtype == jnp.bfloat16
    assert st2.y_hist.dtype == jnp.bfloat16
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32) if a.dtype == jnp.bfloat16
            else np.asarray(a),
            np.asarray(b, np.float32) if b.dtype == jnp.bfloat16
            else np.asarray(b))
    # resume continues from the restored ring (reset terminal MAX_ITERS
    # status to RUNNING, as the resume protocol does)
    out = solve_from_state(cfg.replace(max_iters=14), p.f, vg,
                           st2._replace(status=jnp.asarray(0, jnp.int32)))
    assert int(out.k) == 14

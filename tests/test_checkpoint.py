"""Checkpoint/resume: interrupted solve + resume == uninterrupted solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# --- sharded (gather-free) layout ------------------------------------------------

def _sharded_mid_state(cfg, mesh, d=2048, dtype=None, seed=7):
    """A mid-solve sharded state on the 8-virtual-device mesh."""
    import jax.numpy as jnp
    from functools import partial

    from tpu_lbfgs import get_problem
    from tpu_lbfgs.core.solver import (
        init_state,
        make_value_and_grad,
        solve_from_state,
    )
    from tpu_lbfgs.dist.mesh import make_mesh, state_shardings

    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    st_sh = state_shardings(mesh)
    x0 = jnp.asarray(np.random.default_rng(seed).uniform(-2, 2, d),
                     dtype or jnp.float64)
    make = jax.jit(lambda x: init_state(vg, x, cfg.m, cfg.history_dtype),
                   out_shardings=st_sh)
    run = jax.jit(partial(solve_from_state, cfg, p.f, vg),
                  in_shardings=(st_sh,), out_shardings=st_sh)
    return run(make(jax.device_put(
        x0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))))), vg, p


def test_sharded_checkpoint_roundtrip_bit_exact(tmp_path):
    """save_state_sharded -> load_state_sharded on the same 8-device mesh:
    every leaf restores bit-exactly, no host gather of the full state."""
    from tpu_lbfgs import LBFGSConfig
    from tpu_lbfgs.dist.mesh import make_mesh
    from tpu_lbfgs.io import load_state_sharded, save_state_sharded

    mesh = make_mesh()
    cfg = LBFGSConfig(max_iters=12, tol=0.0, direction="compact")
    st, _, _ = _sharded_mid_state(cfg, mesh)
    save_state_sharded(tmp_path / "ck", st)
    st2 = load_state_sharded(tmp_path / "ck", mesh)
    for name in st._fields:
        a, b = getattr(st, name), getattr(st2, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
        assert b.sharding.is_equivalent_to(a.sharding, a.ndim), name


def test_sharded_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Solve 12 iters sharded -> sharded save -> restore -> continue to 24:
    identical to the uninterrupted 24-iteration sharded solve."""
    from functools import partial

    from tpu_lbfgs import LBFGSConfig, get_problem
    from tpu_lbfgs.core.solver import make_value_and_grad, solve_from_state
    from tpu_lbfgs.dist.mesh import make_mesh, state_shardings
    from tpu_lbfgs.io import load_state_sharded, save_state_sharded

    mesh = make_mesh()
    p = get_problem("rosenbrock")
    vg = make_value_and_grad(p.f, p.grad)
    st_sh = state_shardings(mesh)
    cfg12 = LBFGSConfig(max_iters=12, tol=0.0, direction="compact")
    st12, _, _ = _sharded_mid_state(cfg12, mesh)
    # Reset the finalized MAX_ITERS status for resume (same contract as the
    # unsharded resume test above).
    st12 = st12._replace(status=jax.device_put(
        np.asarray(0, np.int32), st12.status.sharding))
    save_state_sharded(tmp_path / "ck", st12)
    restored = load_state_sharded(tmp_path / "ck", mesh)

    cfg24 = cfg12.replace(max_iters=24)
    run24 = jax.jit(partial(solve_from_state, cfg24, p.f, vg),
                    in_shardings=(st_sh,), out_shardings=st_sh)
    cont = run24(restored)
    st24, _, _ = _sharded_mid_state(cfg24, mesh)
    np.testing.assert_array_equal(np.asarray(cont.x), np.asarray(st24.x))
    assert float(cont.f) == float(st24.f)
    assert int(cont.k) == 24


def test_sharded_checkpoint_restores_onto_different_layout(tmp_path):
    """Chunks saved on 8 shards reassemble onto a 4-device mesh (and a
    replicated 1-device mesh) — the restore mesh need not match the save
    mesh."""
    from tpu_lbfgs import LBFGSConfig
    from tpu_lbfgs.dist.mesh import make_mesh
    from tpu_lbfgs.io import load_state_sharded, save_state_sharded

    cfg = LBFGSConfig(max_iters=8, tol=0.0, direction="compact")
    st, _, _ = _sharded_mid_state(cfg, make_mesh())
    save_state_sharded(tmp_path / "ck", st)
    for n_dev in (4, 1):
        mesh_small = make_mesh(jax.devices()[:n_dev])
        st2 = load_state_sharded(tmp_path / "ck", mesh_small)
        np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))
        np.testing.assert_array_equal(np.asarray(st.s_hist),
                                      np.asarray(st2.s_hist))
        assert int(st2.k) == int(st.k)


def test_sharded_checkpoint_bf16_history_roundtrip(tmp_path):
    """bfloat16 ring rows survive the f32-upcast npz storage bit-exactly,
    per chunk (the same guarantee save_state gives whole arrays)."""
    import jax.numpy as jnp

    from tpu_lbfgs import LBFGSConfig
    from tpu_lbfgs.dist.mesh import make_mesh
    from tpu_lbfgs.io import load_state_sharded, save_state_sharded

    mesh = make_mesh()
    cfg = LBFGSConfig(max_iters=10, tol=0.0, direction="compact",
                      history_dtype="bfloat16")
    st, _, _ = _sharded_mid_state(cfg, mesh, dtype=jnp.float32)
    assert st.s_hist.dtype == jnp.bfloat16
    save_state_sharded(tmp_path / "ck", st)
    st2 = load_state_sharded(tmp_path / "ck", mesh)
    assert st2.s_hist.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(st.s_hist, dtype=np.float32),
        np.asarray(st2.s_hist, dtype=np.float32))


def test_sharded_checkpoint_stale_shards_cleaned_and_rejected(tmp_path):
    """Re-saving into a directory previously written by a larger job must not
    let stale shard files poison the restore: save_state_sharded deletes
    shard files beyond process_count before publishing index.json, and
    load_state_sharded refuses a directory whose shard files exceed the
    index's num_processes (round-4 advisor finding)."""
    import json

    from tpu_lbfgs import LBFGSConfig
    from tpu_lbfgs.dist.mesh import make_mesh
    from tpu_lbfgs.io import load_state_sharded, save_state_sharded

    mesh = make_mesh()
    cfg = LBFGSConfig(max_iters=8, tol=0.0, direction="compact")
    st, _, _ = _sharded_mid_state(cfg, mesh)
    ck = tmp_path / "ck"
    save_state_sharded(ck, st)

    # Simulate a leftover from an earlier save with more processes: a copy
    # of shard-0 under a higher process index, with DIFFERENT (stale) data.
    stale = ck / "shard-3.npz"
    stale.write_bytes((ck / "shard-0.npz").read_bytes())

    with pytest.raises(ValueError, match="stale"):
        load_state_sharded(ck, mesh)

    # A fresh save into the same directory cleans the stale file up.
    save_state_sharded(ck, st)
    assert not stale.exists()
    st2 = load_state_sharded(ck, mesh)
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))

    # Missing committed shard file -> clear FileNotFoundError.
    idx = json.loads((ck / "index.json").read_text())
    idx["num_processes"] = 2
    (ck / "index.json").write_text(json.dumps(idx))
    with pytest.raises(FileNotFoundError, match="shard-1"):
        load_state_sharded(ck, mesh)

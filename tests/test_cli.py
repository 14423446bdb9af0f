"""CLI driver: each mode produces well-formed output (CPU backend)."""
import json
import subprocess
import sys

BASE = [sys.executable, "-m", "tpu_lbfgs", "--device", "cpu",
        "--dtype", "float64"]


def run_cli(*args):
    out = subprocess.run(BASE + list(args), capture_output=True, text=True,
                         timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_single_solve_json():
    out = run_cli("--problem", "coupled_quadratic", "--dim", "64",
                  "--max-iters", "200", "--tol", "1e-8", "--json")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["results"][0]["status"] == "converged"
    assert rec["results"][0]["f"] < 1e-10


def test_poly_ls_and_direction_flags():
    out = run_cli("--problem", "rosenbrock", "--dim", "32", "--max-iters",
                  "2000", "--tol", "1e-5", "--poly-ls", "--direction",
                  "compact_incremental", "--line-search",
                  "wolfe_interpolation", "--json")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["results"][0]["status"] == "converged"


def test_native_backend():
    out = run_cli("--backend", "native", "--problem", "quadratic", "--dim",
                  "128", "--max-iters", "50", "--tol", "1e-8", "--json")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["results"][0]["status"] == "converged"


def test_batch_mode():
    out = run_cli("--batch", "8", "--dim", "32", "--problem",
                  "coupled_quadratic", "--max-iters", "100", "--tol", "1e-6",
                  "--json")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["results"][0]["converged"] == 8


def test_verbose_reference_log():
    out = run_cli("--problem", "quadratic", "--dim", "16", "--max-iters",
                  "20", "--tol", "1e-10", "--verbose")
    assert "Iteration 0, f = " in out
    assert "|grad| = " in out


def test_multi_seed_protocol():
    out = run_cli("--problem", "quadratic", "--dim", "16", "--max-iters",
                  "20", "--tol", "1e-10", "--seeds", "42", "365")
    assert "mean wall over 2 seeds" in out


def test_shard_mode_forwards_problem_to_pallas_path():
    """--shard --pallas must reach the shard-composable kernel path (the CLI
    forwards problem=<name>; regression for the round-3 review finding where
    the single-device Pallas vg leaked into the auto-partitioned program).
    Unaligned d exercises the padding + wrapped-dir_poly path too."""
    import os

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "tpu_lbfgs", "--device", "cpu",
           "--dtype", "float32", "--problem", "rosenbrock", "--dim", "500",
           "--max-iters", "40", "--tol", "1e-3", "--shard", "--pallas",
           "--json"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    # the shard-composable path engaged: no fallback warning on stderr
    assert "falling back to the auto-partitioned jnp path" not in out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["results"][0]["status"] in ("converged", "max_iters")


def test_native_backend_rejects_unsupported_choices():
    """Unsupported problem/line-search for the C++ oracle fail with a clear
    parser error, not a mid-run KeyError."""
    out = subprocess.run(BASE + ["--backend", "native", "--problem", "sphere",
                                 "--dim", "16"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "supports problems" in out.stderr
    out = subprocess.run(BASE + ["--backend", "native", "--line-search",
                                 "backtracking_speculative", "--dim", "16"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "supports line searches" in out.stderr


def test_batch_poly_ls():
    """Regression: --batch with --poly-ls crashed (dir_poly never forwarded
    to vmap_minimize)."""
    out = run_cli("--batch", "4", "--dim", "64", "--problem",
                  "coupled_quadratic", "--poly-ls", "--max-iters", "100",
                  "--tol", "1e-6", "--json")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["results"][0]["converged"] == 4

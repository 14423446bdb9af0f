"""ctypes binding for the native C++ oracle (native/oracle.cpp).

Builds liboracle.so on demand with g++ (no pybind11 in this environment —
plain C ABI + ctypes).  The shared object is cached next to the source and
rebuilt when oracle.cpp is newer.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..config import LBFGSConfig
from ..types import Status

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "oracle.cpp"
_LIB = _REPO_ROOT / "native" / "build" / "liboracle.so"

PROBLEM_IDS = {"quadratic": 0, "rosenbrock": 1, "coupled_quadratic": 2}

_OBJ_CB = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                           ctypes.c_int, ctypes.c_void_p)
_GRAD_CB = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                            ctypes.c_void_p)

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Path:
    """Compile the oracle if missing or stale."""
    if not force and _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    _LIB.parent.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           "-o", str(_LIB), str(_SRC)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build()))
    lib.tl_lbfgs_solve.restype = ctypes.c_int
    lib.tl_lbfgs_solve.argtypes = [
        ctypes.c_int, _OBJ_CB, _GRAD_CB, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.tl_problem_f.restype = ctypes.c_double
    lib.tl_problem_f.argtypes = [ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_double), ctypes.c_int]
    lib.tl_problem_grad.restype = None
    lib.tl_problem_grad.argtypes = [ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_double),
                                    ctypes.POINTER(ctypes.c_double),
                                    ctypes.c_int]
    _lib = lib
    return lib


_LS_IDS = {
    "backtracking": 0,
    "backtracking_wolfe": 1,
    "backtracking_wolfe_bisect": 2,
    "armijo_interpolation": 3,
    "wolfe_interpolation": 4,
}


def _pack_params(cfg: LBFGSConfig) -> np.ndarray:
    return np.array([
        cfg.c1, cfg.c2, cfg.initial_step, cfg.shrink, cfg.grow,
        cfg.backtracking_tol, cfg.interp_min, cfg.bisect_tol,
        float(cfg.ls_max_iters), float(cfg.ls_safety_cap),
        -1.0 if cfg.alpha_rescue_floor is None else cfg.alpha_rescue_floor,
        cfg.alpha_rescue_value, cfg.step_fail_tol, cfg.curvature_threshold,
        1.0 if cfg.safe_cubic else 0.0,
    ], dtype=np.float64)


def native_lbfgs(problem: str, x0: np.ndarray, cfg: LBFGSConfig,
                 record_trace: bool = False,
                 f: Optional[Callable] = None,
                 grad: Optional[Callable] = None) -> dict:
    """Run the native solver.  `problem` selects a built-in C++ objective
    ("quadratic" | "rosenbrock" | "coupled_quadratic"); pass problem="custom"
    with Python callbacks f/grad for arbitrary objectives (slower: each
    evaluation crosses back into Python)."""
    lib = load()
    x0 = np.ascontiguousarray(x0, np.float64)
    n = x0.shape[0]

    if problem == "custom":
        pid = -1
        if f is None or grad is None:
            raise ValueError("custom problem needs f and grad callbacks")

        @_OBJ_CB
        def f_cb(xp, nn, _ctx):
            return float(f(np.ctypeslib.as_array(xp, (nn,))))

        @_GRAD_CB
        def g_cb(xp, gp, nn, _ctx):
            g = np.asarray(grad(np.ctypeslib.as_array(xp, (nn,))), np.float64)
            np.ctypeslib.as_array(gp, (nn,))[:] = g
    else:
        pid = PROBLEM_IDS[problem]
        f_cb = ctypes.cast(None, _OBJ_CB)
        g_cb = ctypes.cast(None, _GRAD_CB)

    x_out = np.empty(n, np.float64)
    f_out = ctypes.c_double()
    gnorm_out = ctypes.c_double()
    iters_out = ctypes.c_int()
    status_out = ctypes.c_int()
    nfev = ctypes.c_long()
    ngev = ctypes.c_long()

    if record_trace:
        tf = np.zeros(cfg.max_iters, np.float64)
        tg = np.zeros(cfg.max_iters, np.float64)
        ta = np.zeros(cfg.max_iters, np.float64)
        tfp = tf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        tgp = tg.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        tap = ta.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        tf = tg = ta = None
        tfp = tgp = tap = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))

    params = _pack_params(cfg)
    lib.tl_lbfgs_solve(
        pid, f_cb, g_cb, None,
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        cfg.m, cfg.max_iters, cfg.tol, _LS_IDS[cfg.line_search],
        1 if cfg.fidelity == "reference" else 0,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(f_out), ctypes.byref(gnorm_out), ctypes.byref(iters_out),
        ctypes.byref(status_out), ctypes.byref(nfev), ctypes.byref(ngev),
        tfp, tgp, tap)

    k = int(iters_out.value)
    out = {
        "x": x_out, "f": float(f_out.value), "g_norm": float(gnorm_out.value),
        "iterations": k, "status": Status.NAMES[int(status_out.value)],
        "n_fev": int(nfev.value), "n_gev": int(ngev.value),
    }
    if record_trace:
        out["trace_f"] = tf[:k]
        out["trace_gnorm"] = tg[:k]
        out["trace_alpha"] = ta[:k]
    return out

#!/usr/bin/env python
"""Eval-count delta of the reference's BW-bisect memoization cache
(round-5 verdict missing #3; SURVEY.md §7 "document the extra evals").

The reference's Backtracking_Wolfe variant memoizes f and grad per step
size inside each line search (unordered_map caches,
L-BFGS-Backtracking_Wolfe.cu:275-335) and re-uses the cached values for the
post-search f/grad evaluation at the accepted alpha (:433-443).  This
framework deliberately does NOT replicate the cache (it never changes the
accepted alpha — only avoids recomputation), so the promised record is the
measured count: how many evaluations the cache would have saved.

Method: the f64 NumPy oracle runs the GPU-parallel BW config with an
instrumented bisect search that (a) reproduces the exact alpha sequence
(asserted against the uninstrumented search), (b) records every in-search
(alpha -> f, grad) evaluation, and (c) counts, per iteration, whether the
post-search f(x_new)/grad(x_new) at the ACCEPTED alpha hit the cache.
In-search repeats are also counted (bisection never revisits a midpoint, so
they are expected to be zero — the cache's entire value is the post-search
reuse).

Writes bw_cache_delta.json at the repo root.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_lbfgs.config import REFERENCE_PARALLEL
from tpu_lbfgs.oracle import LINE_SEARCHES, lbfgs_oracle
import tpu_lbfgs.oracle as oracle_mod

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import np_problems as npp  # noqa: E402


class Counts:
    def __init__(self):
        self.search_fev = 0
        self.search_gev = 0
        self.post_fev = 0
        self.post_gev = 0
        self.post_f_cache_hits = 0
        self.post_g_cache_hits = 0
        self.in_search_repeats = 0
        self.iterations = 0


def make_instrumented_bisect(counts: Counts):
    """ls_backtracking_wolfe_bisect with per-search alpha-keyed caches.
    Same decision rules, byte-for-byte alpha sequence (asserted by the
    caller); leaves the caches in ``last_caches`` for the main loop's
    post-search hit accounting."""
    def search(cfg, f, grad, x, d, f_x, g, gdd):
        f_cache, g_cache = {}, {}
        alpha = cfg.initial_step
        lo, hi = 0.0, np.finfo(np.float64).max
        for _ in range(cfg.ls_max_iters):
            if alpha in f_cache:
                counts.in_search_repeats += 1
                f_new = f_cache[alpha]
            else:
                f_new = f(x + alpha * d)
                counts.search_fev += 1
                f_cache[alpha] = f_new
            if f_new <= f_x + cfg.c1 * alpha * gdd:
                if alpha in g_cache:
                    counts.in_search_repeats += 1
                    gnd = float(np.dot(g_cache[alpha], d))
                else:
                    g_cache[alpha] = grad(x + alpha * d)
                    counts.search_gev += 1
                    gnd = float(np.dot(g_cache[alpha], d))
                if gnd >= cfg.c2 * gdd:
                    break
                lo = alpha
            else:
                hi = alpha
            alpha = (lo + hi) / 2.0 \
                if hi < np.finfo(np.float64).max else 2.0 * lo
            if alpha < cfg.bisect_tol:
                break
        search.last_caches = (f_cache, g_cache)
        return alpha

    search.last_caches = ({}, {})
    return search


def run_counted(problem_f, problem_grad, x0, cfg):
    """lbfgs_oracle with the instrumented search patched in, plus post-search
    cache-hit accounting via wrapped f/grad on the MAIN loop (the oracle
    calls f(x_new)/grad(x_new) right after the search — exactly the evals
    the reference's cache serves from memory)."""
    counts = Counts()
    search = make_instrumented_bisect(counts)
    orig = LINE_SEARCHES["backtracking_wolfe_bisect"]

    # Wrap f/grad: calls NOT from inside the search are the post-search
    # evaluations; check them against the last search's caches by value.
    in_search = {"flag": False}

    def wrapped_search(cfg_, f_, grad_, x_, d_, f_x_, g_, gdd_):
        in_search["flag"] = True
        try:
            a = search(cfg_, f_, grad_, x_, d_, f_x_, g_, gdd_)
            a_ref = orig(cfg_, raw_f, raw_grad, x_, d_, f_x_, g_, gdd_)
            assert a == a_ref, (a, a_ref)
            counts.iterations += 1
            # post-search accounting: would f(x + a*d) / grad(x + a*d) hit?
            f_cache, g_cache = search.last_caches
            if a in f_cache:
                counts.post_f_cache_hits += 1
            if a in g_cache:
                counts.post_g_cache_hits += 1
            return a
        finally:
            in_search["flag"] = False

    raw_f, raw_grad = problem_f, problem_grad

    def f(x):
        if not in_search["flag"]:
            counts.post_fev += 1
        return raw_f(x)

    def grad(x):
        if not in_search["flag"]:
            counts.post_gev += 1
        return raw_grad(x)

    LINE_SEARCHES["backtracking_wolfe_bisect"] = wrapped_search
    try:
        res = lbfgs_oracle(f, grad, x0, cfg, record=False)
    finally:
        LINE_SEARCHES["backtracking_wolfe_bisect"] = orig
    return res, counts


def main():
    cfg = REFERENCE_PARALLEL.replace(line_search="backtracking_wolfe_bisect",
                                     max_iters=2000)
    d = 10_000
    rows = []
    for seed in (42, 365, 12345):
        rng = np.random.default_rng(seed)
        x0 = rng.uniform(-1000.0, 1000.0, d)
        res, c = run_counted(npp.rosenbrock_f, npp.rosenbrock_grad, x0, cfg)
        total_without_cache = c.search_fev + c.post_fev
        total_gev_without = c.search_gev + c.post_gev
        rows.append({
            "seed": seed, "status": res.status, "iterations": res.iterations,
            "final_f": res.f,
            "search_fev": c.search_fev, "search_gev": c.search_gev,
            "post_fev": c.post_fev, "post_gev": c.post_gev,
            "in_search_repeat_hits": c.in_search_repeats,
            "post_search_f_cache_hits": c.post_f_cache_hits,
            "post_search_g_cache_hits": c.post_g_cache_hits,
            "fev_saved_pct": round(100.0 * c.post_f_cache_hits
                                   / max(total_without_cache, 1), 2),
            "gev_saved_pct": round(100.0 * c.post_g_cache_hits
                                   / max(total_gev_without, 1), 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    report = {
        "note": ("Measured eval-count delta of the reference's BW-bisect "
                 "memoization cache (L-BFGS-Backtracking_Wolfe.cu:275-335, "
                 "433-443), which this framework documents-but-does-not-"
                 "replicate.  f64 oracle, GPU-parallel config (tol=1e-1, "
                 "C2 bisect semantics), rosenbrock d=10,000, published "
                 "U(-1000,1000) starts, alpha sequence asserted identical "
                 "to the uninstrumented search.  Reading: bisection never "
                 "revisits a step size WITHIN a search "
                 "(in_search_repeat_hits), so the cache's whole value is "
                 "serving the POST-search f/grad at the accepted alpha from "
                 "memory.  On the TPU design those two evaluations are the "
                 "single fused tail pass that also computes the curvature "
                 "pair and all convergence scalars — the work the cache "
                 "saves on the reference is work the fused tail has to do "
                 "anyway, and under ls_eval='polynomial' the in-search "
                 "trials cost no objective evaluations at all."),
        "config": "REFERENCE_PARALLEL + backtracking_wolfe_bisect, "
                  "max_iters=2000",
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bw_cache_delta.json")
    json.dump(report, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

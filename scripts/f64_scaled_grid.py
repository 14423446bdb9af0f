#!/usr/bin/env python
"""Scaled-start emulated-f64 grid (round-5 verdict item 6).

The published protocol starts at x0 ~ U(-1000, 1000); TPU f64 is emulated as
an f32 pair whose EXPONENT range is f32's, and the interpolating searches
drive |f| through ~1e50 on the way down — representable in IEEE f64, inf in
emulation — so only Armijo backtracking got a TPU-f64 number in the round-4
grid (reference_protocol_results.json tpu_f64_grid note).

This grid reruns the sequential-reference f64 config from x0 ~ U(-10, 10)
(every trajectory value stays within f32 exponent range) on BOTH backends:
the C++ oracle and the emulated-f64 TPU path, at the paper's published
d=10,000.  Same config, same seeds, same starts — a real like-for-like
TPU-f64 wall/iteration number for every Table-I strategy, comparable WITHIN
this grid (not to the published-box cells; the label carries '-scaled').

Results merge into reference_protocol_results.json under "f64_scaled_grid".
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STRATEGIES = (
    ("Armijo Backtracking", "backtracking"),
    ("Armijo Interpolation", "armijo_interpolation"),
    ("Wolfe Backtracking", "backtracking_wolfe"),
    ("Wolfe Interpolation", "wolfe_interpolation"),
)
D = 10_000
SEEDS = (42, 365, 12345)
X0 = (-10.0, 10.0)


def run_cell(backend: str, strategy: str, timeout_s: int) -> dict:
    cmd = [sys.executable, "-m", "tpu_lbfgs.bench.reference_protocol",
           "--cell", "--problem", "rosenbrock", "--d", str(D),
           "--strategy", strategy, "--backend", backend,
           "--budget", "900", "--x0-range", str(X0[0]), str(X0[1]),
           "--seeds"] + [str(s) for s in SEEDS]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"backend": backend, "error": "cell timeout (killed)",
                "waited_s": timeout_s}
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    if r.returncode != 0 or not lines:
        tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
        return {"backend": backend,
                "error": f"cell exited {r.returncode}: {' | '.join(tail)}"}
    return json.loads(lines[-1])


def main():
    cells = []
    for label, strategy in STRATEGIES:
        for backend, timeout_s in (("cpu", 1800), ("tpu-f64", 2400)):
            t0 = time.time()
            cell = run_cell(backend, strategy, timeout_s)
            cell.update({"d": D, "strategy": label, "strategy_key": strategy,
                         "cell_wall_s": round(time.time() - t0, 1)})
            cells.append(cell)
            print(json.dumps(cell), flush=True)

    grid = {
        "note": ("Scaled-start comparability grid: x0 ~ U(-10, 10) instead "
                 "of the published U(-1000, 1000), because emulated TPU f64 "
                 "(f32 pair) lacks IEEE-f64 EXPONENT range — the published "
                 "box sends |f| through ~1e50 mid-search (inf in emulation; "
                 "3 of 4 strategies failed at iteration 1 in the round-4 "
                 "grid).  Both backends run the identical sequential-"
                 "reference f64 config (tol=1e-8, max 15000, C2=0.9) from "
                 "the SAME scaled starts: ratios are like-for-like within "
                 "this grid and NOT comparable to the published-box cells."),
        "x0_range": list(X0), "d": D, "seeds": list(SEEDS),
        "cells": cells,
    }
    path = os.path.join(REPO, "reference_protocol_results.json")
    report = json.load(open(path))
    report["f64_scaled_grid"] = grid
    json.dump(report, open(path, "w"), indent=1)
    print(f"merged f64_scaled_grid into {path}")


if __name__ == "__main__":
    main()

#!/bin/bash
# Hardware experiment pipeline: waits for the axon tunnel to be healthy,
# then runs, in order:
#   1. the reference-protocol experiment (Table-I analogue)
#   2. the giant-d roofline sweep
#   3. the north-star time-to-1e-5 row (f32 TPU + f64 host refine)
# Everything subprocess-isolated under `timeout`; kill this script's process
# group to stop it.
set -u
cd /root/repo
LOG=/tmp/hw_pipeline.log
echo "=== pipeline start $(date) ===" >> "$LOG"

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
print('probe ok', float(jnp.arange(8., dtype=jnp.float32).sum()))
" >> "$LOG" 2>&1
}

# Phase 0: wait for recovery (up to ~50 min)
for i in $(seq 1 12); do
  if probe; then echo "tunnel healthy after attempt $i $(date)" >> "$LOG"; break; fi
  echo "probe $i wedged $(date)" >> "$LOG"
  [ "$i" = 12 ] && { echo "giving up waiting" >> "$LOG"; exit 1; }
  sleep 240
done

# Phase 1: reference protocol (TPU cells subprocess-isolated internally).
# Grid is now 4 dims (incl. the paper's d=20,000) x 4 strategies x
# {tpu-f32, tpu-norescue, cpu} + the Fig.-1 f64 probe cell.
echo "=== phase 1: reference protocol $(date) ===" >> "$LOG"
timeout 10800 python -m tpu_lbfgs.bench --reference-protocol \
  --cpu-budget 300 --tpu-budget 180 --cell-timeout 480 \
  --out reference_protocol_results.json >> "$LOG" 2>&1
echo "protocol exit=$? $(date)" >> "$LOG"

# Phase 2: giant-d sweep
echo "=== phase 2: giant sweep $(date) ===" >> "$LOG"
D=67108864 ITERS=100 TO=900 OUT=giant_sweep_results.jsonl \
  bash scripts/giant_sweep.sh >> "$LOG" 2>&1
echo "sweep exit=$? $(date)" >> "$LOG"

# Phase 3: north-star row
echo "=== phase 3: time-to-1e-5 $(date) ===" >> "$LOG"
timeout 1800 python -c "
import json
from tpu_lbfgs.bench.harness import time_to_tolerance_refined
r = time_to_tolerance_refined(problem='rosenbrock', d=1<<20, coarse_tol=1e-3,
                              tol=1e-5, refine_backend='native')
print(json.dumps(r))
open('northstar_1e5.json','w').write(json.dumps(r))
" >> "$LOG" 2>&1
echo "northstar exit=$? $(date)" >> "$LOG"
echo "=== pipeline done $(date) ===" >> "$LOG"

#!/bin/bash
# Giant-instance roofline sweep (VERDICT r1 item 4: close 65% -> >=80% of the
# measured 544 GB/s at d=2^26).  One subprocess per configuration under
# `timeout` (kill-able if the axon tunnel wedges); results appended as JSON
# lines to giant_sweep_results.jsonl.
set -u
D=${D:-67108864}            # 2^26
ITERS=${ITERS:-100}
OUT=${OUT:-giant_sweep_results.jsonl}
TO=${TO:-900}

run() {
  echo "### $*" >&2
  timeout "$TO" "$@" >> "$OUT" 2>> giant_sweep.log
  echo "exit=$? $(tail -c 120 "$OUT" | head -1)" >&2
  sleep 5
}

# Block-size ladder at the default stack
for BR in 512 1024 2048 4096; do
  TPU_LBFGS_BLOCK_ROWS=$BR run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS"
done

# Variants at the default block size (re-run the winner manually after)
run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS" --with-matvec
run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS" --history-dtype bfloat16
run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS" --donate
run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS" --no-pallas

# BASELINE.json literal metrics: the TWO-LOOP recursion roofline at giant d,
# and the m=20-history config (fits at 1e8-class only with bf16 history).
run python -m tpu_lbfgs.bench.giant --d "$D" --iters "$ITERS" --direction two_loop
run python -m tpu_lbfgs.bench.giant --d 100663296 --m 20 --history-dtype bfloat16 \
    --iters 50 --donate
run python -m tpu_lbfgs.bench.giant --d 100663296 --m 5 --iters 50 --donate

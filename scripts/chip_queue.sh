#!/bin/bash
# Post-outage chip queue (one chip — strictly sequential, never parallel).
# Run after `timeout 60 python -c "import jax; jax.devices()"` succeeds.
# Usage: bash scripts/chip_queue.sh [logdir]
set -u
LOG=${1:-/tmp/chipq}
mkdir -p "$LOG"
cd /root/repo

step() {
  name=$1; shift
  echo "=== $name: $* (log $LOG/$name.log)"
  timeout 3600 "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name exit=$? ($(date '+%T'))"
}

# 1. compiled-TPU lane (Mosaic kernels; persistent cache makes reruns fast)
step tpu-test make tpu-test

# 2. headline bench (also validates the probe guard's success path and
#    that the two-pass exactness certificate never fires on the bench data)
step bench python bench.py

# 3. 200k e2e with the new timed-QA-loop attribution (qa_retrieve_breakdown_s)
step e2e200k python scripts/bench_e2e.py --chunks 200000 --queries 64

# 4. 500k row — beyond-reference scale (skip the impasse re-index to fit)
step e2e500k python scripts/bench_e2e.py --chunks 500000 --queries 64 --skip_impasse

grep -l . "$LOG"/*.log

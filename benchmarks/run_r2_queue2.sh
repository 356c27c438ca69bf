#!/bin/bash
# Round-2 TPU queue #2: profile rerun (unbuffered, long timeout), extended
# dispatch experiment, 6-worker pinsage incl b2048, EGES down-scale sweep.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "$TIMEOUT" "$@" > "benchmarks/logs/$name.log" 2>&1
  echo "--- $name exit=$? ($(date -u +%H:%M:%S))"
}

TIMEOUT=1800 run profile2     python -u benchmarks/profile_dlrm.py
TIMEOUT=900  run dispatch2    python -u benchmarks/exp_dispatch_cost.py
TIMEOUT=1500 run pinsage2     python -u benchmarks/bench_models.py pinsage_large
TIMEOUT=2400 run eges_down    python -u benchmarks/exp_eges_convergence.py 16000 2000 down
echo "ALL DONE $(date -u +%H:%M:%S)"

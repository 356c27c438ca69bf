#!/bin/bash
# Round-2 TPU experiment queue — sequential (one TPU process at a time).
# Each run logs to benchmarks/logs/<name>.log; exits are clean (no pattern kills).
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "$TIMEOUT" "$@" > "benchmarks/logs/$name.log" 2>&1
  echo "--- $name exit=$? ($(date -u +%H:%M:%S))"
}

TIMEOUT=900  run dispatch   python benchmarks/exp_dispatch_cost.py
TIMEOUT=900  run dedup_e2e  python benchmarks/exp_dedup_e2e.py 8192 100
TIMEOUT=900  run profile    python benchmarks/profile_dlrm.py
TIMEOUT=1200 run pinsage    python benchmarks/bench_models.py pinsage_large
TIMEOUT=3000 run eges_conv  python benchmarks/exp_eges_convergence.py 16000 2000
echo "ALL DONE $(date -u +%H:%M:%S)"

#!/bin/bash
# Full TPU capture sequence (ONE jax process at a time — run alone).
# Order matters: the scan-wedge probe goes LAST because a reproduced
# wedge kills the TPU grant for minutes. Usage:
#   bash probes/tpu_batch.sh [outdir]
# Each step appends to $outdir/<step>.txt; steps continue past failures.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_batch_$(date +%H%M)}
mkdir -p "$OUT"
echo "outdir=$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%T)" | tee -a "$OUT/summary.txt"
  timeout "$t" "$@" >"$OUT/$name.txt" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date +%T)" | tee -a "$OUT/summary.txt"
  grep -v WARNING "$OUT/$name.txt" | tail -8
}

run verify   2400 python probes/verify_drive.py
run bench    2400 python bench.py
run suite5   3000 python bench_suite.py 5
run suite234 3000 python bench_suite.py 2,3,4
run suite6   2000 python bench_suite.py 6
run series   3600 python probes/series_profile.py
run spmdpal  2400 python probes/spmd_pallas_probe.py
run wedge    2400 python probes/scan_wedge_probe.py
echo done; cat "$OUT/summary.txt"

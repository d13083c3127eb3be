#!/bin/bash
# Round-3 owed on-chip rows, run SERIALLY (parallel TPU clients and killed
# in-flight compiles wedge the axon tunnel — BENCH_NOTES Methodology).
# Usage: bash benchmarks/r3_onchip_all.sh [outdir]
# Each script gets a generous timeout: first compiles cost minutes; do NOT
# shorten these, a killed compile can wedge the tunnel for ~1h.
set -u
cd "$(dirname "$0")/.."
out="${1:-logs/r3_onchip}"
mkdir -p "$out"
for s in r3_rows_mxu_ab r3_crossover r3_channelizer_ab r3_spectral_rows \
         r3_sosfilt_loop r3_sosfilt_rowpass_ab r3_iir1_scalar_ab \
         r3_surface_rows; do
  echo "=== $s $(date -u +%H:%M:%S)" | tee -a "$out/summary.log"
  timeout 5400 python "benchmarks/$s.py" 2>&1 | tee "$out/$s.log" \
    | tail -20 >> "$out/summary.log"
  echo "--- exit $? $(date -u +%H:%M:%S)" | tee -a "$out/summary.log"
done
echo "done; logs in $out"

#!/bin/bash
# Priority-ordered owed on-chip rows (single serial TPU client; generous
# timeouts — a killed in-flight compile wedges the axon tunnel ~1h).
set -u
cd "$(dirname "$0")/.."
out="${1:-logs/r3_onchip}"
mkdir -p "$out"
for s in r3_rows_mxu_ab r3_sosfilt_rowpass_ab r3_iir1_scalar_ab \
         r3_crossover r3_spectral_rows r3_channelizer_ab r3_surface_rows; do
  echo "=== $s start $(date -u +%H:%M:%S)" >> "$out/summary.log"
  timeout 2700 python "benchmarks/$s.py" > "$out/$s.log" 2>&1
  echo "--- $s exit $? $(date -u +%H:%M:%S)" >> "$out/summary.log"
  tail -25 "$out/$s.log" >> "$out/summary.log"
done
echo "ALLDONE $(date -u +%H:%M:%S)" >> "$out/summary.log"

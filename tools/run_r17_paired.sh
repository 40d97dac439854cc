#!/bin/bash
# r17 re-measure: N sequential paired bench runs (engine + oracle),
# one artifact per run, matching the r16opt 17-run depth so the
# cross-run minima ratio is compared at matched depth (BASELINE.md rule).
set -u
cd "$(dirname "$0")/.."
N="${1:-17}"
START="${2:-1}"
for i in $(seq "$START" "$N"); do
  echo "=== paired run $i/$N $(date -u +%H:%M:%S) ==="
  python tools/paired_bench.py --out "BENCH_PAIRED_r17_run${i}.json" /root/testdata/sf0.1 \
    || echo "RUN $i FAILED rc=$?"
done
echo "=== all done $(date -u +%H:%M:%S) ==="

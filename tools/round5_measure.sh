#!/bin/bash
# Round-5 hardware measurement sweep. Run serially, nothing concurrent
# (every timed run owns the tunnel). Usage: bash tools/round5_measure.sh
#
# Every section is bracketed by tools/tunnel_probe.py: the tunnel's fixed
# latency/bandwidth drift 2-4x by the hour, so a timing without probe
# context is not evidence. If the leading probe is unhealthy, the sweep
# aborts rather than record garbage.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=artifacts/R5_MEASURE.log
: > $OUT
probe() { timeout 180 python tools/tunnel_probe.py >> $OUT 2>&1; }

echo "=== $(date -u) leading probe ===" >> $OUT
ok=0
for a in 1 2 3 4 5 6 7 8; do
  if probe; then ok=1; break; fi
  echo "probe attempt $a failed (tunnel flap) - waiting 120s" >> $OUT
  sleep 120
done
if [ $ok -ne 1 ]; then echo "TUNNEL UNHEALTHY - aborting sweep" >> $OUT; exit 1; fi

echo "=== bench matrix (all 5 BASELINE configs, writes BENCH_MATRIX.json) ===" >> $OUT
timeout 3600 python tools/bench_matrix.py >> $OUT 2>&1
probe

echo "=== stage bench ===" >> $OUT
timeout 1200 python tools/stage_bench.py >> $OUT 2>&1
probe
echo "done $(date -u)" >> $OUT

#!/bin/bash
# Round-4 stage-2 refresh: configs sweep with the c3 crash fixes, then
# the 1M warm/exec build probes (OOM-fixed), then quiet-box CPU
# baselines.  Serial: one TPU job at a time (single chip).
set -u
cd "$(dirname "$0")/.." || exit 1

exec 9>/tmp/measure_queue.lock
flock -n 9 || { echo "measure queue already running" >&2; exit 1; }

LOG=/tmp/measure_queue2.log
echo "=== queue2 start $(date)" >> "$LOG"

# 1. Full configs sweep (fresh artifact, crash fixes in).
echo "--- configs $(date)" >> "$LOG"
GRAVOMG_VERBOSE=1 timeout -k 120 7200 python scripts/bench_configs.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

# 2. Re-measure the CPU baselines on a quiet box (the stage-1 numbers
#    ran concurrently with a full pytest suite on this 1-core host,
#    inflating cpu_vcycle ~3x) and the fixed warm/exec build probes.
#    Deleting the cached artifacts forces clean re-measurement; the
#    slope artifact and exported solver stay.
echo "--- 1M probes + quiet CPU baselines $(date)" >> "$LOG"
rm -f .bench_cache/baseline_v3_1000000.json \
      .bench_cache/tpu_warmbuild_1000000.json \
      .bench_cache/tpu_buildexec_1000000_4.json \
      .bench_cache/cpubuild_1000000.json
GRAVOMG_BENCH_N=1000000 GRAVOMG_BENCH_BUDGET_S=9000 \
    timeout -k 120 9600 python bench.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== queue2 done $(date)" >> "$LOG"

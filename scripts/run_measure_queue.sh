#!/bin/bash
# Serial TPU measurement queue for the artifact refresh.
# One job at a time: concurrent processes contend for the single
# chip's HBM and can crash the worker.  Each stage is independently
# bounded; a failure moves on to the next stage.
set -u
cd "$(dirname "$0")/.." || exit 1

# Single-instance lock: two queues racing defeats the serialization
# this script exists to provide.
exec 9>/tmp/measure_queue.lock
flock -n 9 || { echo "measure queue already running" >&2; exit 1; }

LOG=/tmp/measure_queue.log
echo "=== queue start $(date)" >> "$LOG"

# 1. The 1M north-star bench: regenerates the slope artifact (which
#    flips bench.py's default N to 1M for the driver's end-of-round
#    run), the exported solver, the measured CPU baseline, warm-build,
#    execution-only build, and the csrc CPU build baseline.
#    -k 120: a process hung in TPU teardown survives SIGTERM and would
#    still hold the chip when stage 2 starts.
echo "--- 1M bench $(date)" >> "$LOG"
GRAVOMG_BENCH_N=1000000 GRAVOMG_BENCH_BUDGET_S=7000 \
    timeout -k 120 7200 python bench.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

# 2. Full configs sweep (fresh artifact).  VERBOSE breadcrumbs so a
#    TPU-worker crash is attributable to a stage (round-3 c3/c5/c6
#    crashes were unattributed).
echo "--- configs $(date)" >> "$LOG"
GRAVOMG_VERBOSE=1 timeout -k 120 5400 python scripts/bench_configs.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== queue done $(date)" >> "$LOG"

#!/bin/bash
# Serial TPU measurement queue for the round-3 artifact refresh.
# One job at a time: concurrent processes contend for the single
# chip's HBM and can crash the worker.  Each stage is independently
# bounded; a failure moves on to the next stage.
set -u
cd /root/repo
LOG=/tmp/measure_queue.log
echo "=== queue start $(date)" >> "$LOG"

# 1. The 1M north-star bench: regenerates the slope artifact (which
#    flips bench.py's default N to 1M for the driver's end-of-round
#    run), the exported solver, the measured CPU baseline, warm-build,
#    execution-only build, and the csrc CPU build baseline.
echo "--- 1M bench $(date)" >> "$LOG"
GRAVOMG_BENCH_N=1000000 timeout 4200 python bench.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

# 2. Full configs sweep (fresh artifact).
echo "--- configs $(date)" >> "$LOG"
timeout 3600 python scripts/bench_configs.py >> "$LOG" 2>&1
echo "rc=$? $(date)" >> "$LOG"

echo "=== queue done $(date)" >> "$LOG"

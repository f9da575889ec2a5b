#!/bin/bash
# Round-5 kernel sweep + lane calibration (VERDICT r4 #6).
#
# Replaces the round-1 degraded-window table in docs/KERNEL_SWEEP.md with a
# fresh sweep: XLA fused vs lane vs user-level scatter lowering, hidden
# 1-128, reddit/arxiv/proteins, HBM speed-of-light % column. Also runs
# tools/calibrate_lane.py so _SLOT_NS/_REM_NS can be recalibrated (bump
# _PLAN_CACHE_VERSION when committing new constants).
#
# Run when the chip probe is healthy/stable; total ~20-35 min.
set -u
cd "$(dirname "$0")/.."
OUT=docs/suite_r05
mkdir -p $OUT
LOG=/tmp/r5_kernel_sweep.log
: > $LOG

echo "== calibrate_lane ==" | tee -a $LOG
timeout 1500 python tools/calibrate_lane.py 2>&1 | grep -vE "WARNING" | tee -a $LOG

echo "== sweep: fused XLA + sddmm ==" | tee -a $LOG
timeout 2400 python kernel/bench_kernels.py --csv $OUT/kernel_sweep.csv \
    2>&1 | grep -vE "WARNING" | tail -40 | tee -a $LOG
echo "== sweep: lane ==" | tee -a $LOG
timeout 2400 python kernel/bench_kernels.py --lane --skip-sddmm \
    --csv $OUT/kernel_sweep.csv 2>&1 | grep -vE "WARNING" | tail -30 | tee -a $LOG
echo "== sweep: scatter lowering ==" | tee -a $LOG
timeout 2400 python kernel/bench_kernels.py --scatter --skip-sddmm \
    --csv $OUT/kernel_sweep.csv 2>&1 | grep -vE "WARNING" | tail -30 | tee -a $LOG

python tools/render_kernel_sweep.py $OUT/kernel_sweep.csv docs/KERNEL_SWEEP.md \
  | tee -a $LOG
echo "kernel sweep done" | tee -a $LOG

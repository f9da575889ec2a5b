#!/bin/bash
# Round-4 chip-time experiment sequence — run when the pool is HEALTHY and
# the suite watcher is PAUSED (kill its exact PID first; state must be
# "waiting"). Each experiment is a short targeted measurement that decides
# a suite-row config; full rows then re-run through the watcher.
#
# Usage: bash tools/r4_experiments.sh [A|B|C|D|E]...  (default: A B C D)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_expts.log
run() { echo "== $* ==" | tee -a $LOG; timeout "${T:-900}" "$@" 2>&1 | grep -vE "WARNING" | tail -6 | tee -a $LOG; }

for e in "${@:-A B C D}"; do case $e in
A)
  # arxiv GAT: fresh timing, XLA path (gate now rejects its lane plan) vs
  # forced lane. Round-3 published 1.84 s/epoch (0.04x) WITH lane pre-gate.
  T=900 run python benchmarks/node_classification/main_gat.py \
      --dataset ogbn-arxiv --epochs 12 --runs 1
  T=900 run python benchmarks/node_classification/main_gat.py \
      --dataset ogbn-arxiv --epochs 12 --runs 1 --lane-kernel
  ;;
B)
  # arxiv SAGE: 0.46x published. Hypotheses: wide-256 lane break-even
  # (lane now auto-disabled per width?), bf16 messages, scan dispatch.
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel --bf16-messages
  T=900 run env DGL_TPU_REM_NS=20 python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
  ;;
C)
  # proteins RGCN: rel_lane (plans prewarmed, expansion 1.31 remainder 0%)
  # vs the 9.3 s/epoch chunked XLA path.
  T=1200 run python benchmarks/node_classification/main_rgcn.py \
      --epochs 8 --runs 1
  T=1200 run python benchmarks/node_classification/main_rgcn.py \
      --epochs 8 --runs 1 --lane-kernel
  ;;
D)
  # products SAGE: edge-chunked XLA (new) vs force-attached lane plans
  # (cache prewarmed). Graph/x_agg caches make prep ~1 min.
  T=1500 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-products --epochs 5 --runs 1
  T=1800 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-products --epochs 5 --runs 1 --lane-kernel
  ;;
E)
  # kernel sweep for docs/KERNEL_SWEEP.md (healthy-window replacement):
  # XLA fused + scatter API + forced lane rows, SOL% column.
  T=3600 run python kernel/bench_kernels.py --datasets reddit,ogbn-arxiv,ogbn-proteins \
      --scatter --lane --csv /tmp/kernel_sweep_r4.csv
  ;;
esac; done
echo "experiments done; see $LOG"

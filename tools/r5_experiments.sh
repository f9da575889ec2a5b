#!/bin/bash
# Round-5 chip experiments — run when the suite watcher is idle/waiting
# (check /tmp/suite_watcher.state). Each is a short targeted measurement
# that decides a suite-row config; rows then re-run through the watcher.
#
# Usage: bash tools/r5_experiments.sh [A|B|C|D]...   (default: D A B C)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_expts.log
run() { echo "== $* ==" | tee -a $LOG; timeout "${T:-900}" "$@" 2>&1 | grep -vE "WARNING" | tail -8 | tee -a $LOG; }

for e in "${@:-D A B C}"; do case $e in
D)
  # products SAGE: 43.8 s/epoch measured on the echunk/XLA path (r5 first
  # number). Decide: force-attached lane plans (cached) and bf16 messages.
  T=1500 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-products --epochs 4 --runs 1 --lane-kernel
  T=1500 run env DGL_TPU_LANE_FORCE_ATTACH=1 python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-products --epochs 4 --runs 1 --lane-kernel --bf16-messages
  ;;
A)
  # arxiv GAT: r3 published 1.84 s/epoch (0.04x) WITH lane. XLA vs lane,
  # scan-epochs amortizes the dispatch tax either way.
  T=900 run python benchmarks/node_classification/main_gat.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10
  T=900 run python benchmarks/node_classification/main_gat.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
  ;;
B)
  # arxiv SAGE: 0.46x published. lane x bf16 x scan.
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel
  T=900 run python benchmarks/node_classification/main_sage.py \
      --dataset ogbn-arxiv --epochs 20 --runs 1 --scan-epochs 10 --lane-kernel --bf16-messages
  ;;
C)
  # proteins RGCN: rel_lane (plans prewarmed) vs the 9.3 s/epoch chunked XLA.
  T=1200 run python benchmarks/node_classification/main_rgcn.py \
      --epochs 6 --runs 1
  T=1200 run python benchmarks/node_classification/main_rgcn.py \
      --epochs 6 --runs 1 --lane-kernel
  ;;
esac; done
echo "experiments done; see $LOG"

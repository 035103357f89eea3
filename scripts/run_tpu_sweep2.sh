#!/bin/bash
# Revised sequential TPU sweep (post u32<->f32 Mosaic cast fix).  The vpu
# flat-mode microbench + first msm-2^18 already ran in sweep 1; this one
# leads with the previously-broken kernel-mode A/B, then the remaining
# decision-ordered entries.  Appends to $LOG; sections marked with @@@.
set -u
LOG=${LOG:-/tmp/tpu_sweep.log}
cd "$(dirname "$0")/.."

run() {
  local name=$1 tmo=$2
  shift 2
  echo "@@@ $name  $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "@@@ $name rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
}

run "kernel-microbench-mxu" 1800 env ZPRIZE_KMUL=mxu python scripts/microbench_te_kernel.py
run "kernel-microbench-hybrid" 1800 env ZPRIZE_KMUL=hybrid python scripts/microbench_te_kernel.py
run "kernel-microbench-hybrid-tree" 1800 env ZPRIZE_KMUL=hybrid-tree python scripts/microbench_te_kernel.py
run "kernel-microbench-vpu-tree" 1800 env ZPRIZE_KMUL=vpu-tree python scripts/microbench_te_kernel.py
run "msm-2^18" 2400 python bench.py
run "msm-2^18-hybrid" 2400 env ZPRIZE_KMUL=hybrid python bench.py
run "profile-msm-2^18" 2400 python scripts/profile_msm_te.py
run "ntt-bench" 1800 env BENCH_METRIC=ntt python bench.py
run "ntt-bench-tile512" 1800 env BENCH_METRIC=ntt ZPRIZE_NTT_TILE=512 python bench.py
run "ntt-bench-tile1024" 1800 env BENCH_METRIC=ntt ZPRIZE_NTT_TILE=1024 python bench.py
run "ntt-bench-maxlog10" 1800 env BENCH_METRIC=ntt ZPRIZE_NTT_MAXLOG=10 python bench.py
run "ntt-bench-maxlog11" 1800 env BENCH_METRIC=ntt ZPRIZE_NTT_MAXLOG=11 python bench.py
run "ntt-bench-maxlog12" 1800 env BENCH_METRIC=ntt ZPRIZE_NTT_MAXLOG=12 python bench.py
run "msm-2^20" 2700 env BENCH_NPOW=20 python bench.py
run "plonk-bench" 5400 env BENCH_METRIC=plonk python bench.py
run "msm-2^24" 5400 env BENCH_NPOW=24 BENCH_ITERS=2 python bench.py
run "posw-bench" 3600 env BENCH_METRIC=posw python bench.py
run "posw-bench-b32" 3600 env BENCH_METRIC=posw BENCH_POSW_BATCH=32 python bench.py
run "msm-2^26" 7200 env BENCH_NPOW=26 BENCH_ITERS=1 python bench.py
echo "@@@ SWEEP2 DONE $(date -u +%H:%M:%S)" >> "$LOG"

#!/bin/bash
# Round-5 phase 2: perf + attribution evidence (VERDICT r4 items 3, 5, 6, 7, 8)
#   K1. kernel-lab r5: the r4d wedge-lost set + two-blocks-per-program,
#       Rq-tile skipping, exp2 VPU-floor probe
#   K2. decode-step residual attribution at the 8B w50 bucket
#   K4. attention-estimator validation: per-iteration timed decode vs the
#       attn_is_estimate figure at the headline bucket
#   K5. MoE attribution re-run
# (tree_index p20000, MoE mesh cell and bench run in the health-gated
#  phase 1b: they are end-to-end cells and need a healthy transport)
# Usage: tpu_session_r5b.sh <repo_snapshot_dir> <results_out_dir>
set -u
SNAP=${1:?snapshot dir}
OUT=${2:?results out dir}
cd "$SNAP"
mkdir -p "$OUT"
export DEFT_PLAN_PATCH=1
export DEFT_PIPE_WINDOWS=4
export DEFT_SYNC_PERIOD=32

run_wd() {
  local stall=$1 tmo=$2 log=$3; shift 4
  local attempt rc pid start now age
  for attempt in 1 2 3; do
    : > "$log"
    "$@" >> "$log" 2>&1 &
    pid=$!
    start=$(date +%s)
    while kill -0 "$pid" 2>/dev/null; do
      sleep 30
      now=$(date +%s)
      age=$(( now - $(stat -c %Y "$log") ))
      if (( age > stall )); then
        echo "  [run_wd] STALL ${age}s (attempt $attempt) - killing $pid"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if (( now - start > tmo )); then
        echo "  [run_wd] TIMEOUT ${tmo}s (attempt $attempt) - killing $pid"
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    tail -6 "$log"
    if (( rc == 0 )); then return 0; fi
    echo "  [run_wd] attempt $attempt exited rc=$rc"
  done
  return 1
}

echo "== K1. kernel-lab r5 =="
run_wd 900 4800 "$OUT/kernel_lab_r5.txt" -- \
  python experiments/kernel_lab.py \
    v0_b512 v0_b1024 full_b512 full_b1024 \
    k2_b1024s512 tq64_b512s512 \
    deep_qw32_b512 deep_k2_b1024s512 deep_tq64_b512 deep_k2tq64_b1024 \
    deep_qw32_b1024 qfull_b512_seg512 probe_exp2_b512

echo "== K2. 8B decode residual attribution =="
run_wd 900 2400 "$OUT/microbench_8b_int8_r5.txt" -- \
  python experiments/microbench_step.py 50 4000 8b int8

echo "== K4. estimator validation: per-iter timed run at the headline bucket =="
run_wd 900 3600 "$OUT/log_estcheck.txt" -- \
  python experiments/estimator_check.py

echo "== K5. MoE attribution + mesh decode cell =="
if [ ! -s "$OUT/microbench_moe_int8_r5.txt" ]; then
run_wd 900 2400 "$OUT/microbench_moe_int8_r5.txt" -- \
  python experiments/microbench_step.py 32 2000 mixtral-6l int8
fi

echo "== r5 phase-2 session done =="

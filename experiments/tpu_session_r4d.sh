#!/bin/bash
# Round-4 follow-up: re-run the phases that wedged during take 3
# (transport was unhealthy 06:56-08:30; phases 1-2 burned all three
# watchdog attempts — the kills hit during remote 8B compiles that the
# degraded tunnel stretched past the 420 s stall threshold, so this take
# uses stall=900).  --skip-existing resumes: completed modes skip free.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r4
mkdir -p "$OUT"
export DEFT_PLAN_PATCH=1

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

echo "== sanity =="
timeout 180 python -c "
import jax, jax.numpy as jnp, time, numpy as np
print('devices:', jax.devices())
f = jax.jit(lambda x: x * 1.0000001)
x = jnp.zeros((128,)); jax.block_until_ready(f(x))
t0 = time.perf_counter()
for _ in range(10): jax.block_until_ready(f(x))
print(f'dispatch RTT {((time.perf_counter()-t0)/10*1e3):.1f} ms')
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== R0. compile canary: big-Rq kernel VMEM fix =="
timeout 900 python experiments/compile_canary.py || {
  echo 'CANARY FAILED - ts256 cells will not compile; continuing with the rest'
}

echo "== R1. reasoning sorting128ToT p4000 @ 8B int8-KV (BASELINE row 1) =="
run_wd 900 7200 "$OUT/log_reasoning8b.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv"

echo "== R2. p20000 flatten/seq @ 8B int8-KV, full s22000 =="
run_wd 900 9000 "$OUT/log_p20000.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_s22000"

echo "== R2b. speculative ts256 @ 8B int8-KV (VMEM-OOMed in take 3; fixed) =="
run_wd 900 4800 "$OUT/log_spec256.txt" -- \
  python experiments/run_sweep.py --suite speculative --model 8b \
    --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size256.json \
    --out "$OUT/spec_ts256_8b_int8kv"

echo "== R3. backstop: any p20000 mode cell take 3 lost =="
run_wd 900 9000 "$OUT/log_p20000_modes.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes node_chunk node tree_index --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_modes"

echo "== R4. kernel-lab re-measure (negative/zero deltas in take 3 = tunnel noise) =="
run_wd 900 4800 "$OUT/kernel_lab_r4d.txt" -- \
  python experiments/kernel_lab.py \
    v0_b512 full_b512 v0_b1024 full_b1024 deep_qw32_b1024 qfull_b512_seg512

echo "== R5. MoE second shape + attribution (skip-existing; retries take 3) =="
if [ ! -f "$OUT/moe_w50_p6000/few_shot_summary.json" ]; then
run_wd 900 3600 "$OUT/log_moe_fs.txt" -- \
  python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 50 --prompt-len 6000 --gen-len 200 \
    --weight-dtype int8 --skip-existing \
    --out "$OUT/moe_w50_p6000"
fi
if [ ! -f "$OUT/moe_reasoning_p2000/reasoning_summary.json" ]; then
run_wd 900 3600 "$OUT/log_moe_reason.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model mixtral-6l \
    --modes flatten seq --prompt-len 2000 --weight-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/moe_reasoning_p2000"
fi
if [ ! -s "$OUT/microbench_moe_int8.txt" ] || ! grep -q residual "$OUT/microbench_moe_int8.txt"; then
run_wd 900 2400 "$OUT/microbench_moe_int8.txt" -- \
  python experiments/microbench_step.py 32 2000 mixtral-6l int8
fi

echo "== R6. fresh bench artifacts at HEAD (always: the kernel fix landed today) =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -4 "$OUT/bench_stderr.txt"
if ! grep -q residual "$OUT/microbench_8b_int8_r4.txt" 2>/dev/null; then
run_wd 900 2400 "$OUT/microbench_8b_int8_r4.txt" -- \
  python experiments/microbench_step.py 50 4000 8b int8
fi

echo "== r4d session done =="

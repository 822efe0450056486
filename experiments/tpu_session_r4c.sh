#!/bin/bash
# Round-4 consolidated measurement session, take 3.  Environment lessons
# baked in from the first two takes:
# - the 8B bf16-KV cells OOM one v5e next to 8 GB of int8 weights -> all
#   8B comparison cells run int8 KV, labeled;
# - the device tunnel intermittently degrades (RPC latency) and sometimes
#   WEDGES the process outright (all threads futex-waiting, zero CPU) ->
#   tree_generate emits a 60 s liveness heartbeat, every phase runs under
#   run_wd (kill on log stall, retry, resume completed modes via
#   run_sweep --skip-existing), and decode runs in K-step windows
#   (one RPC per 8 steps) so slow-but-alive weather still measures fine;
# - long-context cells replay to s22000, the reference row's exact length.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r4
mkdir -p "$OUT"
export DEFT_PLAN_PATCH=1

# run_wd <stall_secs> <total_secs> <log> -- cmd...
# Runs cmd, tails its log; kills the exact pid if the log goes quiet for
# stall_secs (transport wedge: heartbeats stop) and retries up to 3 times.
# stall_secs must exceed the longest legitimate silent stretch (a remote
# 8B jit compile: ~2-4 min).
run_wd() {
  local stall=$1 tmo=$2 log=$3; shift 4   # 4th arg is the "--" separator
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
big = np.zeros(262144, np.int32); jax.block_until_ready(jnp.asarray(big))
t0 = time.perf_counter()
for _ in range(5): jax.block_until_ready(jnp.asarray(big))
print(f'1MB upload {((time.perf_counter()-t0)/5*1e3):.1f} ms')
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== 1. reasoning sorting128ToT p4000 @ 8B int8-KV (BASELINE row 1) =="
run_wd 420 5400 "$OUT/log_reasoning8b.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv"

echo "== 2. p20000 flatten/seq @ 8B int8-KV, s22000 (reference length; item 10) =="
run_wd 420 7200 "$OUT/log_p20000.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_s22000"

echo "== 3. p20000 mode-ordering: node_chunk / node / tree_index (item 2) =="
run_wd 420 9000 "$OUT/log_p20000_modes.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes node_chunk node tree_index --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_modes"

echo "== 4. speculative ts256 @ 8B int8-KV (bf16-KV OOMs one v5e) =="
run_wd 420 4800 "$OUT/log_spec256.txt" -- \
  python experiments/run_sweep.py --suite speculative --model 8b \
    --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size256.json \
    --out "$OUT/spec_ts256_8b_int8kv"

echo "== 5. few-shot width sweep @ 8B (w50 = reference row; gen 400) =="
for W in 10 20 30 50; do
  run_wd 420 2400 "$OUT/log_fs_w${W}.txt" -- \
    python experiments/run_sweep.py --suite few_shot --model 8b \
      --modes flatten seq --width "$W" --prompt-len 4000 --gen-len 400 \
      --weight-dtype int8 --skip-existing \
      --out "$OUT/few_shot_w${W}_8b"
done
run_wd 420 2400 "$OUT/log_fs_w50b512.txt" -- \
  python experiments/run_sweep.py --suite few_shot --model 8b \
    --modes flatten seq --width 50 --prompt-len 4000 --gen-len 400 \
    --weight-dtype int8 --block-len 512 --skip-existing \
    --out "$OUT/few_shot_w50_8b_b512"

echo "== 6. kernel lab: mask-free sentinel + b1024 variants =="
run_wd 420 3000 "$OUT/kernel_lab_r4b.txt" -- \
  python experiments/kernel_lab.py \
    v0_b512 full_b512 v0_b1024 full_b1024 \
    deep_qw32_b512 deep_full_b512 deep_qw32_b1024 \
    q_b512_seg512_qw32 qfull_b512_seg512

echo "== 7. MoE second shape + attribution (item 8) =="
run_wd 420 2400 "$OUT/log_moe_fs.txt" -- \
  python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 50 --prompt-len 6000 --gen-len 200 \
    --weight-dtype int8 --skip-existing \
    --out "$OUT/moe_w50_p6000"
run_wd 420 2400 "$OUT/log_moe_reason.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model mixtral-6l \
    --modes flatten seq --prompt-len 2000 --weight-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/moe_reasoning_p2000"
run_wd 420 1800 "$OUT/microbench_moe_int8.txt" -- \
  python experiments/microbench_step.py 32 2000 mixtral-6l int8

echo "== 8. fresh bench artifacts + 8B step attribution at HEAD =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -4 "$OUT/bench_stderr.txt"
run_wd 420 1800 "$OUT/microbench_8b_int8_r4.txt" -- \
  python experiments/microbench_step.py 50 4000 8b int8

echo "== r4c session done =="

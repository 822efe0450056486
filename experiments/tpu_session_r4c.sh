#!/bin/bash
# Round-4 consolidated measurement session, take 2.  The first session
# (tpu_session_r4.sh) ran into two environment failures: (a) the 8B bf16-KV
# cells OOMed and the `|| fallback` was masked by the `| tail` pipeline;
# (b) the device tunnel degraded to ~2 MB/s mid-session, making the
# ~800 KB/step plan uploads dominate wall time at long context (flatten
# p20000 measured 419 ms/iter of which ~7.5 ms was attention).  This rerun
# uses the device-resident plan-patch path (runner._upload_plan, default
# on) which ships ~25 KB/step diffs instead, and runs every remaining
# BASELINE.md cell at 8B with int8 KV where HBM demands it (labeled).
# Long-context cells replay to s22000 — the reference row's exact length.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r4
mkdir -p "$OUT"
export DEFT_PLAN_PATCH=1

echo "== sanity =="
timeout 180 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('sum:', float(jnp.sum(jnp.ones((256, 256)))))
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== 1. reasoning sorting128ToT p4000 @ 8B int8-KV (BASELINE row 1) =="
timeout 5400 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv" 2>&1 | tail -8

echo "== 2. p20000 flatten/seq @ 8B int8-KV, s22000 (reference length; item 10) =="
timeout 7200 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_s22000" 2>&1 | tail -8

echo "== 3. p20000 mode-ordering: node_chunk / node / tree_index (item 2) =="
timeout 9000 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes node_chunk node tree_index --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_modes" 2>&1 | tail -10

echo "== 4. speculative ts256 @ 8B int8-KV (bf16-KV OOMs one v5e) =="
timeout 4800 python experiments/run_sweep.py --suite speculative --model 8b \
    --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size256.json \
    --out "$OUT/spec_ts256_8b_int8kv" 2>&1 | tail -8

echo "== 5. few-shot width sweep @ 8B (w50 = reference row; gen 400) =="
for W in 10 20 30 50; do
  timeout 2400 python experiments/run_sweep.py --suite few_shot --model 8b \
      --modes flatten seq --width "$W" --prompt-len 4000 --gen-len 400 \
      --weight-dtype int8 \
      --out "$OUT/few_shot_w${W}_8b" 2>&1 | tail -6
done
timeout 2400 python experiments/run_sweep.py --suite few_shot --model 8b \
    --modes flatten seq --width 50 --prompt-len 4000 --gen-len 400 \
    --weight-dtype int8 --block-len 512 \
    --out "$OUT/few_shot_w50_8b_b512" 2>&1 | tail -6

echo "== 6. kernel lab: mask-free sentinel + b1024 variants =="
timeout 3000 python experiments/kernel_lab.py \
    v0_b512 full_b512 v0_b1024 full_b1024 \
    deep_qw32_b512 deep_full_b512 deep_qw32_b1024 \
    q_b512_seg512_qw32 qfull_b512_seg512 \
    2>&1 | tee "$OUT/kernel_lab_r4b.txt" | tail -12

echo "== 7. MoE second shape + attribution (item 8) =="
timeout 2400 python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 50 --prompt-len 6000 --gen-len 200 \
    --weight-dtype int8 \
    --out "$OUT/moe_w50_p6000" 2>&1 | tail -6
timeout 2400 python experiments/run_sweep.py --suite reasoning --model mixtral-6l \
    --modes flatten seq --prompt-len 2000 --weight-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/moe_reasoning_p2000" 2>&1 | tail -6
timeout 1800 python experiments/microbench_step.py 32 2000 mixtral-6l int8 \
    2>&1 | tee "$OUT/microbench_moe_int8.txt" | tail -10

echo "== 8. fresh bench artifacts + 8B step attribution at HEAD =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -4 "$OUT/bench_stderr.txt"
timeout 1800 python experiments/microbench_step.py 50 4000 8b int8 \
    2>&1 | tee "$OUT/microbench_8b_int8_r4.txt" | tail -10

echo "== r4c session done =="

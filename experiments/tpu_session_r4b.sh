#!/bin/bash
# Round-4 catch-up session (run AFTER tpu_session_r4.sh):
# - the reasoning p4000 8B cell with int8 KV: the main session's bf16-KV
#   attempt OOMed (6 GB KV pool + 8 GB int8 weights > one v5e) and its
#   `|| fallback` never fired because the `| tail` pipeline masked the
#   exit status — run the labeled int8-KV fallback directly;
# - kernel-lab timing of the round's new mask-free FULL-block sentinel and
#   block-1024 variants (committed after the main session started).
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r4
mkdir -p "$OUT"

echo "== sanity =="
timeout 180 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('sum:', float(jnp.sum(jnp.ones((256, 256)))))
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== 1. reasoning sorting128ToT p4000 @ 8B int8-KV (labeled fallback) =="
timeout 5400 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv" 2>&1 | tail -8

echo "== 1b. speculative ts256 @ 8B int8-KV (labeled fallback; bf16 OOMed) =="
timeout 4800 python experiments/run_sweep.py --suite speculative --model 8b \
    --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size256.json \
    --out "$OUT/spec_ts256_8b_int8kv" 2>&1 | tail -8

echo "== 2. kernel lab: sentinel + b1024 variants =="
timeout 3000 python experiments/kernel_lab.py \
    v0_b512 full_b512 v0_b1024 full_b1024 \
    deep_qw32_b512 deep_full_b512 deep_qw32_b1024 \
    q_b512_seg512_qw32 qfull_b512_seg512 \
    2>&1 | tee "$OUT/kernel_lab_r4b.txt" | tail -12

echo "== 2b. few-shot w50 @ 8B at block 512 (kernel-lab's preferred block) =="
timeout 2400 python experiments/run_sweep.py --suite few_shot --model 8b \
    --modes flatten seq --width 50 --prompt-len 4000 --gen-len 400 \
    --weight-dtype int8 --block-len 512 \
    --out "$OUT/few_shot_w50_8b_b512" 2>&1 | tail -6

echo "== 3. MoE step attribution (VERDICT r3 weak 4: why is the MoE ratio small?) =="
timeout 1800 python experiments/microbench_step.py 32 2000 mixtral-6l int8 \
    2>&1 | tee "$OUT/microbench_moe_int8.txt" | tail -10

echo "== r4b session done =="

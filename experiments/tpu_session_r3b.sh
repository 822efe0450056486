#!/bin/bash
# Round-3 follow-up cells: the ones the first session missed —
# MoE (gmm scale-spec fix), p16000 long-context (truncated replay so both
# modes fit the window), set128ToT seq re-measure (waste-limit bump keeps
# the paged baseline), batched-vs-single with proper capture.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r3
mkdir -p "$OUT"

echo "== sanity =="
timeout 240 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('sum:', float(jnp.sum(jnp.ones((256, 256)))))
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== A. MoE (Mixtral-8x7B shapes, 6 layers, int8 experts) =="
timeout 1800 python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 32 --prompt-len 2000 --gen-len 100 \
    --weight-dtype int8 \
    --out "$OUT/moe" 2>&1 | tail -7

echo "== B. long-context ToT p16000, 8B int8 weights + int8 KV (replay truncated to 800 iters; full replay exceeds the transport-safe window) =="
timeout 3500 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 16000 --gen-len 800 \
    --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p16000_int8kv" 2>&1 | tail -7

echo "== C. set128ToT re-measure (seq now keeps in-kernel paged reads) =="
timeout 2400 python experiments/run_sweep.py --suite reasoning --model 3b \
    --modes flatten seq --prompt-len 4000 \
    --dataset /root/reference/dataset/generation/Reasoning/set128ToT.json \
    --out "$OUT/reasoning_set128ToT" 2>&1 | tail -7

echo "== D. batched vs single-tree throughput =="
for B in 1 4; do
  timeout 1200 python -m deft_tpu.cli.run --random-model 3b --mode flatten \
      --Branch_controller Simple_Tree --max_width 4 --prompt_len 1000 \
      --max_seq_len 1100 --batch "$B" --kv_pool_slots 40960 \
      2>&1 | tail -14 > "$OUT/batched_b$B.txt"
  tail -3 "$OUT/batched_b$B.txt"
done

echo "== done =="

#!/bin/bash
# One-shot TPU measurement session (run when the tunnel is healthy).
# Each phase runs under `timeout` so a wedged transport can't eat the session;
# results land in experiments/results_r2c/.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r2c
mkdir -p "$OUT"

echo "== sanity =="
timeout 180 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('sum:', float(jnp.sum(jnp.ones((256, 256)))))
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== 1. headline bench (the driver's deliverable comes first) =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -5 "$OUT/bench_stderr.txt"

echo "== 2. step decomposition: 3B bf16 (logits-kind attribution) =="
timeout 900 python experiments/microbench_step.py 50 4000 3b \
    2>&1 | tee "$OUT/microbench_3b.txt"

echo "== 3. step decomposition: 8B int8 (also times the int8-pallas matmul kernel vs XLA fused dequant) =="
timeout 900 python experiments/microbench_step.py 50 4000 8b int8 \
    2>&1 | tee "$OUT/microbench_8b_int8.txt"

echo "== 4. speculative decoding replay, BOTH modes (fair unaligned-DMA seq baseline) =="
timeout 2400 python experiments/run_sweep.py --suite speculative --model 3b \
    --modes flatten seq --prompt-len 1000 \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size64.json \
    --out "$OUT" 2>&1 | tail -12

echo "== 5. ToT reasoning replay (real sorting128ToT, 3B, both modes) =="
timeout 2400 python experiments/run_sweep.py --suite reasoning --model 3b \
    --modes flatten seq --prompt-len 4000 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT" 2>&1 | tail -12

echo "== 6. long-context reasoning, 8B int8 (apples-to-apples with the reference's p20000 Llama-3.1-8B row) =="
timeout 2400 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten --prompt-len 16000 --weight-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT" 2>&1 | tail -8

echo "== done =="

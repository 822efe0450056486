#!/bin/bash
# Round-3 TPU measurement session: fill the experiment grid to the
# reference raw_data coverage (VERDICT r2 item 4) + int8-KV long context
# (item 3) + MoE and batched numbers (items 7/8).
# Each phase runs under `timeout`; results land in experiments/results_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=experiments/results_r3
mkdir -p "$OUT"

echo "== sanity =="
timeout 180 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('sum:', float(jnp.sum(jnp.ones((256, 256)))))
" || { echo 'TPU NOT HEALTHY'; exit 1; }

echo "== 1. headline bench (3B + 8B + 8B int8-KV lines) =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -6 "$OUT/bench_stderr.txt"

echo "== 2. few-shot width sweep {10,20,30} (w50 = the bench above) =="
for W in 10 20 30; do
  timeout 1500 python experiments/run_sweep.py --suite few_shot --model 3b \
      --modes flatten seq --width "$W" --prompt-len 4000 --gen-len 200 \
      --out "$OUT/few_shot_w$W" 2>&1 | tail -6
done

echo "== 3. ToT reasoning replays: all four reference datasets =="
for DS in sorting128ToT docmergeToT set128ToT keywordToT; do
  timeout 2400 python experiments/run_sweep.py --suite reasoning --model 3b \
      --modes flatten seq --prompt-len 4000 \
      --dataset "/root/reference/dataset/generation/Reasoning/$DS.json" \
      --out "$OUT/reasoning_$DS" 2>&1 | tail -6
done

echo "== 4. speculative decoding: tree sizes 64 and 256 =="
for TS in 64 256; do
  timeout 2400 python experiments/run_sweep.py --suite speculative --model 3b \
      --modes flatten seq --prompt-len 1000 \
      --dataset "/root/reference/dataset/generation/Speculative_Decoding/tree_size$TS.json" \
      --out "$OUT/spec_ts$TS" 2>&1 | tail -6
done

echo "== 5. long-context ToT p16000, 8B int8 weights + int8 KV (both modes: int8 halves KV so the seq baseline now fits) =="
timeout 3000 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 16000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p16000_int8kv" 2>&1 | tail -6

echo "== 6. MoE (Mixtral-8x7B shapes, 6 layers, int8 experts): few-shot TPOT =="
timeout 1800 python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 32 --prompt-len 2000 --gen-len 100 \
    --weight-dtype int8 \
    --out "$OUT/moe" 2>&1 | tail -6

echo "== 7. batched vs single-tree throughput (continuous batching) =="
for B in 1 4; do
  timeout 1200 python -m deft_tpu.cli.run --random-model 3b --mode flatten \
      --Branch_controller Simple_Tree --max_width 4 --prompt_len 1000 \
      --max_seq_len 1100 --batch "$B" --kv_pool_slots 40960 \
      2>&1 | tail -2 | tee "$OUT/batched_b$B.txt"
done

echo "== done =="

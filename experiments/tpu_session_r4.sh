#!/bin/bash
# Round-4 TPU measurement session: model-matched 8B cells for every
# BASELINE.md comparison row (VERDICT r3 item 1), the four/five-mode
# p20000 sweep at full length (items 2 + 10), MoE second shape (item 8),
# and fresh bench artifacts (item 9 / ADVICE).
# Phases are ordered by value (headline 8B row, then bench artifacts, ...)
# and the p20000 sweep is split so a transport wedge cannot take out the
# full-length flatten/seq comparison together with the mode-ordering cells.
# Each phase runs under `timeout`; results land in experiments/results_r4/.
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

echo "== 1. reasoning sorting128ToT p4000 @ 8B (reference row: Llama-3-8B) =="
# bf16 KV preferred (reference parity); int8-KV fallback when the pool +
# int8 weights exceed the single v5e's HBM (labeled by output dir)
timeout 5400 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b" 2>&1 | tail -8 \
|| timeout 5400 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv" 2>&1 | tail -8

echo "== 2. headline bench (fresh checked-in artifacts, ttft in JSON) =="
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -6 "$OUT/bench_stderr.txt"

echo "== 3. speculative decoding ts64 + ts256 @ 8B =="
for TS in 64 256; do
  timeout 4800 python experiments/run_sweep.py --suite speculative --model 8b \
      --modes flatten seq --prompt-len 1000 --weight-dtype int8 \
      --dataset "/root/reference/dataset/generation/Speculative_Decoding/tree_size$TS.json" \
      --out "$OUT/spec_ts${TS}_8b" 2>&1 | tail -8 \
  || timeout 4800 python experiments/run_sweep.py --suite speculative --model 8b \
      --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
      --dataset "/root/reference/dataset/generation/Speculative_Decoding/tree_size$TS.json" \
      --out "$OUT/spec_ts${TS}_8b_int8kv" 2>&1 | tail -8
done

echo "== 4a. p20000 FULL-LENGTH flatten/seq @ 8B int8-KV (item 10) =="
timeout 7200 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_full" 2>&1 | tail -8

echo "== 4b. p20000 mode-ordering cells: node_chunk / node / tree_index (item 2) =="
timeout 9000 python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes node_chunk node tree_index \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_modes" 2>&1 | tail -10

echo "== 5. few-shot width sweep @ 8B (w50 = reference row; gen 400) =="
for W in 10 20 30 50; do
  timeout 2400 python experiments/run_sweep.py --suite few_shot --model 8b \
      --modes flatten seq --width "$W" --prompt-len 4000 --gen-len 400 \
      --weight-dtype int8 \
      --out "$OUT/few_shot_w${W}_8b" 2>&1 | tail -6
done

echo "== 6. MoE second shape (VERDICT weak 4): wider tree + longer prompt =="
timeout 2400 python experiments/run_sweep.py --suite few_shot --model mixtral-6l \
    --modes flatten seq --width 50 --prompt-len 6000 --gen-len 200 \
    --weight-dtype int8 \
    --out "$OUT/moe_w50_p6000" 2>&1 | tail -6
timeout 2400 python experiments/run_sweep.py --suite reasoning --model mixtral-6l \
    --modes flatten seq --prompt-len 2000 --weight-dtype int8 \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/moe_reasoning_p2000" 2>&1 | tail -6

echo "== r4 session done =="

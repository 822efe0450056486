#!/bin/bash
# Round-5 phase 1b: the end-to-end evidence cells, HEALTH-GATED.
# The transport's failure mode today is not bandwidth but a large fixed
# cost per small transfer (~300 ms backlog per enqueued iteration,
# results_r5/transport_stall_flatten_partial.json): end-to-end TPOT cells
# measured under that state are meaningless against the reference, so each
# cell first waits for a healthy fresh-transfer round-trip.
#   R1. reasoning sorting128ToT p4000 flatten/seq @ 8B  (VERDICT missing 1)
#   R2. speculative ts256 flatten/seq @ 8B              (VERDICT missing 2)
#   R3. p20000 run to full s22000 flatten/seq @ 8B      (VERDICT missing 3)
#   R4. tree_index p20000 re-measure (paged plans)      (VERDICT weak 2)
#   R5. MoE mesh decode cell (1-chip mesh)              (VERDICT weak 7)
#   R6. bench.py at HEAD
# Usage: tpu_session_r5c.sh <repo_snapshot_dir> <results_out_dir>
set -u
SNAP=${1:?snapshot dir}
OUT=${2:?results out dir}
cd "$SNAP"
mkdir -p "$OUT"
export DEFT_PLAN_PATCH=1
export DEFT_COMPACT_PLAN=1
export DEFT_PIPE_WINDOWS=4
export DEFT_SYNC_PERIOD=32
# replay execution (generate.py record path + runner.execute_recorded):
# the replay cells' host loops are device-independent, so whole spans
# execute from device-resident slabs — a handful of transfers per
# thousands of steps.  That caps the degraded-transport exposure at
# ~(n/64 drains + n/64 chunk fetches) x fixed-cost, so the health gate
# can admit a moderately degraded link (see wait_healthy threshold).
export DEFT_REPLAY_EXEC=1
# per-step executor: the K=32 window compiles intermittently wedge on the
# remote compile service; per-step slab fns compile reliably and run the
# uniform stream through one executable anyway
export DEFT_REPLAY_WINDOWS=0

probe() {
  timeout 300 python - <<'PY'
import jax, jax.numpy as jnp, numpy as np, time
x = jnp.zeros((8,)); jax.block_until_ready(x * 1)
ts = []
for i in range(12):
    t0 = time.perf_counter()
    b = jnp.asarray(np.full(512, i, np.int32))
    jax.block_until_ready(b)
    _ = np.asarray(b[:4])
    ts.append(time.perf_counter() - t0)
ts.sort()
print(f"HEALTH p50_ms={ts[6]*1e3:.1f} p90_ms={ts[10]*1e3:.1f}")
PY
}

wait_healthy() {
  local max_wait=$1 start now out p50 ok
  start=$(date +%s)
  while true; do
    out=$(probe)
    echo "$(date +%H:%M:%S) $out"
    p50=$(echo "$out" | sed -n 's/.*p50_ms=\([0-9.]*\).*/\1/p')
    # replay execution bounds per-generation transfer count, so a
    # moderately degraded link (tens of ms per transfer) costs only a few
    # seconds over a whole replay — admit it; refuse only the severe state
    ok=$(python -c "print(1 if ${p50:-9999} < 120 else 0)")
    if [ "$ok" = "1" ]; then echo "transport HEALTHY"; return 0; fi
    now=$(date +%s)
    if (( now - start > max_wait )); then
      echo "transport still degraded after $((now-start))s - skipping to next phase"
      return 1
    fi
    echo "degraded - sleeping 600s ($(( (now-start)/60 )) min waited)"
    sleep 600
  done
}

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

echo "== R0. ungated probes: compile canary (incl. BLOCK=512 big-Rq) + residual lab =="
run_wd 900 1800 "$OUT/compile_canary_r5.txt" -- \
  python experiments/compile_canary.py || true
run_wd 900 2400 "$OUT/residual_lab_r5.txt" -- \
  python experiments/residual_lab.py || true

echo "== R1. reasoning sorting128ToT p4000 @ 8B int8-KV =="
wait_healthy 14400 && \
run_wd 900 9000 "$OUT/log_reasoning8b.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --prompt-len 4000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/reasoning_sorting128ToT_8b_int8kv"

echo "== R2. speculative ts256 @ 8B int8-KV =="
wait_healthy 1800 && \
run_wd 900 6000 "$OUT/log_spec256.txt" -- \
  python experiments/run_sweep.py --suite speculative --model 8b \
    --modes flatten seq --prompt-len 1000 --weight-dtype int8 --kv-dtype int8 \
    --skip-existing \
    --dataset /root/reference/dataset/generation/Speculative_Decoding/tree_size256.json \
    --out "$OUT/spec_ts256_8b_int8kv"

echo "== R3. p20000 flatten/seq @ 8B int8-KV, full s22000 =="
wait_healthy 1800 && \
run_wd 900 10800 "$OUT/log_p20000.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes flatten seq --gen-len 2000 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_s22000"

echo "== R4. tree_index p20000 re-measure (paged plans) =="
wait_healthy 1800 && \
run_wd 900 9000 "$OUT/log_p20000_ti.txt" -- \
  python experiments/run_sweep.py --suite reasoning --model 8b \
    --modes tree_index node --gen-len 800 \
    --prompt-len 20000 --weight-dtype int8 --kv-dtype int8 --skip-existing \
    --dataset /root/reference/dataset/generation/Reasoning/sorting128ToT.json \
    --out "$OUT/longctx_p20000_ti"

echo "== R5. MoE mesh decode cell (1-chip mesh, int8 experts) =="
wait_healthy 1800 && \
mkdir -p "$OUT/moe_mesh_1chip" && \
run_wd 900 3600 "$OUT/log_moe_mesh.txt" -- \
  python -m deft_tpu.cli.run --random-model mixtral-6l --mode flatten \
    --mesh 1x1x1 --weight-dtype int8 --Branch_controller Simple_Tree \
    --max_width 32 --prompt_len 2000 --max_seq_len 2200 \
    --output_file "$OUT/moe_mesh_1chip/dump.json"

echo "== R6. bench at HEAD =="
wait_healthy 1800
timeout 2400 python bench.py 2> "$OUT/bench_stderr.txt" | tee "$OUT/bench_stdout.txt"
tail -4 "$OUT/bench_stderr.txt"

echo "== r5 phase-1b session done =="

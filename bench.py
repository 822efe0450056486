"""Headline benchmark: DeFT-Flatten vs sequential flash-decoding TPOT on the
reference's few-shot workload shape (width 50, prompt 4000, ~400 generated;
/root/reference/README.md:214-219).

Prints ONE JSON line:
    {"metric": "tpot_speedup_flatten_vs_seq", "value": N, "unit": "x",
     "vs_baseline": N / 1.32}
vs_baseline compares against the reference GPU run's flatten-vs-seq TPOT
speedup on the same workload (1.32x, BASELINE.md few-shot w=50 p4000).

Robustness: each mode runs in its own subprocess with a watchdog + retries —
the device transport has occasionally wedged whole runs (all threads
futex-waiting mid-compile), and a fresh process reliably recovers.  Do NOT
enable the persistent jax compile cache here (suspected in the wedges).

Model: Llama-3.2-3B shapes (BENCH_MODEL to override), random-init (no-egress environment).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

WIDTH = int(os.environ.get("BENCH_WIDTH", 50))
PROMPT_LEN = int(os.environ.get("BENCH_PROMPT_LEN", 4000))
GEN_LEN = int(os.environ.get("BENCH_GEN_LEN", 400))
MODEL = os.environ.get("BENCH_MODEL", "3b")
MODE_TIMEOUT_S = int(os.environ.get("BENCH_MODE_TIMEOUT_S", 2400))
RETRIES = int(os.environ.get("BENCH_RETRIES", 2))
BASELINE_SPEEDUP = 1.32  # reference few-shot w50 p4000 (BASELINE.md)


def run_mode(mode_name: str) -> dict:
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.obs import PerfMetrics
    from deft_tpu.runtime import ModelRunner, mode_from_cli, tree_generate

    cfg = PRESETS[MODEL]
    # chunked allocator reserves up to 2 chunks (128 slots) per leaf
    slots = PROMPT_LEN + WIDTH * (GEN_LEN + 8 + 256) + 1024
    ecfg = EngineConfig(
        kv_pool_slots=slots,
        max_requests=max(64, 2 * WIDTH),
        max_context_len=PROMPT_LEN + GEN_LEN + 64,
    )
    runner = ModelRunner(cfg, ecfg, kernels="auto", seed=0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(4, cfg.vocab_size - 4, PROMPT_LEN)]
    # warmup generation: walks every jit shape bucket so the measured run is
    # steady-state (in-run recompiles otherwise dominate TPOT)
    tree_generate(
        model=runner,
        mode=mode_from_cli(mode_name),
        tokenizer=None,
        prompt_ids=prompt,
        max_seq_len=PROMPT_LEN + GEN_LEN,
        width=WIDTH,
        depth=1,
        branch_controller=Branch_Controller(workloads.simple_tree),
        perf_metrics=PerfMetrics(),
    )
    runner.reset_state()
    pm = tree_generate(
        model=runner,
        mode=mode_from_cli(mode_name),
        tokenizer=None,
        prompt_ids=prompt,
        max_seq_len=PROMPT_LEN + GEN_LEN,
        width=WIDTH,
        depth=1,
        branch_controller=Branch_Controller(workloads.simple_tree),
        perf_metrics=PerfMetrics(),
    )
    fwd = np.asarray(pm.forward_per_iter, dtype=np.float64)
    iters = np.asarray(pm.iter_time, dtype=np.float64)
    med = np.median(fwd)
    # steady-state: drop recompile iterations (forward >> median)
    steady = fwd[fwd < 5 * med]
    return {
        "mode": mode_name,
        "tpot_ms": float(pm.TPOT),
        "steady_fwd_ms": float(steady.mean()),
        "iter_ms_median": float(np.median(iters)),
        "generated": int(pm.generated_len),
        "kv_io_bytes": float(pm.KV_IO),
        "e2e_ms": float(pm.e2e_latency),
        "ttft_ms": float(pm.TTFT),
    }


def run_mode_subprocess(mode_name: str) -> dict:
    """Run one mode in a watchdogged child process, retrying on wedge."""
    last_err = None
    for attempt in range(1 + RETRIES):
        env = dict(os.environ)
        env["BENCH_CHILD_MODE"] = mode_name
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                timeout=MODE_TIMEOUT_S,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in out.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            last_err = f"no result line (rc={out.returncode}): " + \
                (out.stderr or "")[-800:]
        except subprocess.TimeoutExpired:
            last_err = f"mode {mode_name} wedged (> {MODE_TIMEOUT_S}s); retrying"
        print(f"# attempt {attempt + 1} failed: {last_err}", file=sys.stderr)
    raise RuntimeError(f"bench mode {mode_name} failed: {last_err}")


def main() -> int:
    child_mode = os.environ.get("BENCH_CHILD_MODE")
    if child_mode:
        print(json.dumps(run_mode(child_mode)))
        return 0

    t0 = time.time()
    info = {"width": WIDTH, "prompt_len": PROMPT_LEN, "gen_len": GEN_LEN,
            "model": MODEL}
    print(f"# bench config: {info}", file=sys.stderr)

    seq = run_mode_subprocess("seq")
    print(f"# seq:     {seq}", file=sys.stderr)
    flat = run_mode_subprocess("flatten")
    print(f"# flatten: {flat}", file=sys.stderr)

    # TPOT = decode_latency / generated; decode latency sums per-step
    # forward (with async pipeline syncs charged to the step they wait on)
    speedup = seq["tpot_ms"] / flat["tpot_ms"]
    print(f"# wall {time.time()-t0:.0f}s  TPOT speedup {speedup:.3f}x"
          f"  (tpot {seq['tpot_ms']:.3f} -> {flat['tpot_ms']:.3f} ms/tok;"
          f"  KV IO {seq['kv_io_bytes']:.3g} -> {flat['kv_io_bytes']:.3g} B)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "tpot_speedup_flatten_vs_seq",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / BASELINE_SPEEDUP, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

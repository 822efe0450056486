"""Steady-state batched-vs-single throughput (VERDICT r2 weak 5): N
requests through BatchedEngine vs the same N run sequentially, after a
full warmup pass so jit compiles are excluded (bench.py protocol).

  python experiments/batched_bench.py [model] [n_requests] [prompt] [gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "3b"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    prompt_len = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    gen = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    width = 4

    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate
    from deft_tpu.runtime.batched import BatchedEngine, Request

    cfg = PRESETS[model]
    slots = n_req * (prompt_len + width * (gen + 300)) + 4096
    ecfg = EngineConfig(
        kv_pool_slots=slots,
        max_requests=max(64, 4 * n_req * width),
        max_context_len=prompt_len + gen + 64,
    )
    runner = ModelRunner(cfg, ecfg, kernels="auto", seed=0)
    rng = np.random.default_rng(0)
    prompts = [
        [int(t) for t in rng.integers(4, cfg.vocab_size - 4, prompt_len)]
        for _ in range(n_req)
    ]

    def make_reqs():
        return [Request(p, Branch_Controller(workloads.simple_tree),
                        prompt_len + gen, width=width) for p in prompts]

    def run_batched():
        eng = BatchedEngine(runner)
        t0 = time.perf_counter()
        eng.add_requests(make_reqs())
        eng.run()
        return time.perf_counter() - t0

    def run_sequential():
        t0 = time.perf_counter()
        tot = 0
        for p in prompts:
            runner.reset_state()
            pm = tree_generate(
                model=runner, mode=ForwardMode.TREE_DECODE_FLATTEN,
                tokenizer=None, prompt_ids=p,
                max_seq_len=prompt_len + gen, width=width, depth=1,
                branch_controller=Branch_Controller(workloads.simple_tree),
            )
            tot += pm.generated_len
        return time.perf_counter() - t0, tot

    # warmup both paths (walks every jit bucket), then measure
    run_batched()
    runner.reset_state()
    run_sequential()
    runner.reset_state()
    t_b = run_batched()
    runner.reset_state()
    t_s, tokens = run_sequential()
    tokens_b = n_req * width * (gen - 1)
    out = {
        "metric": "batched_throughput_speedup",
        "value": round((tokens_b / t_b) / (tokens / t_s), 4),
        "unit": "x",
        "batched_tok_s": round(tokens_b / t_b, 1),
        "sequential_tok_s": round(tokens / t_s, 1),
        "batched_wall_s": round(t_b, 2),
        "sequential_wall_s": round(t_s, 2),
        "n_requests": n_req, "width": width,
        "prompt_len": prompt_len, "gen_len": gen, "model": model,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

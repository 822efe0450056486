"""Validate the attention-latency ESTIMATOR against an in-step measurement
(VERDICT r4 weak 5 / item 7).

All `attn_ms` figures in the results dumps come from the per-bucket compiled
microbench (`runner._measure_attention_bucket`), labeled
`attn_is_estimate: true`.  This script measures what attention actually
costs INSIDE the full jitted decode step at the headline bucket (8B int8,
width 50, prompt 4000) by timing

    (a) the production step with the real plan, and
    (b) the same compiled step with a plan whose every run interval is
        dead — the paged kernel then skips every block's DMA + compute
        (`live(bb)` guards), while the rest of the step (matmuls, norms,
        rope, KV store, logits head) executes identically,

so (a) - (b) is the attention cost as experienced in-stream, including any
overlap effects the stand-alone estimator cannot see.  Both timings use the
same N-step dependent loop with a single terminal sync (per-call RTT over
the device tunnel would otherwise dominate).

  python experiments/estimator_check.py [width] [prompt_len] [model] [wq]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    prompt_len = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    model = sys.argv[3] if len(sys.argv) > 3 else "8b"
    wq = sys.argv[4] if len(sys.argv) > 4 else "int8"
    kernels = sys.argv[5] if len(sys.argv) > 5 else "auto"
    steps = 64

    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.plan.flatten import _EMPTY_LO
    from deft_tpu.runtime import ForwardMode, ModelRunner

    cfg = PRESETS[model]
    ecfg = EngineConfig(
        kv_pool_slots=prompt_len + width * (steps + 8 + 256) + 2048,
        max_requests=max(64, 2 * width),
        max_context_len=prompt_len + steps + 64,
        weight_dtype=wq,
    )
    runner = ModelRunner(cfg, ecfg, kernels=kernels, seed=0)
    print("backend:", jax.default_backend(), "kernels:", runner.kernels,
          flush=True)

    runner.forward_prefill(list(np.random.default_rng(0).integers(
        4, cfg.vocab_size - 4, prompt_len)))
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, width)):
        c.append_token(100 + i)
    for _ in range(8):
        tree.alloc()
        for leaf in tree.leaves.values():
            leaf.append_token(1)
    tree.alloc()

    mode = ForwardMode.TREE_DECODE_FLATTEN
    plan = runner.build_plan(mode)
    buf_np, sizes, paged = runner._pack_plan(mode, plan)
    assert paged, "headline bucket must be on the paged path"
    print(f"bucket sizes={sizes} paged={paged} "
          f"compact={len(sizes) == 5}", flush=True)

    # dead-attention twin: every run interval emptied -> every block dead
    dead_np = buf_np.copy()
    if len(sizes) == 5:
        L, T, B, R, seg_len = sizes
        o = 2 + 3 * L + 2 * R           # hdr + q arrays + off + src
        dead_np[o : o + R] = _EMPTY_LO  # run_lo
        dead_np[o + R : o + 2 * R] = 0  # run_hi
    else:
        L, T, B, tail = sizes
        o = 3 * L
        dead_np[o : o + T] = _EMPTY_LO
        dead_np[o + T : o + 2 * T] = 0
        dead_np[o + 2 * T : o + 2 * T + B] = _EMPTY_LO
        dead_np[o + 2 * T + B : o + 2 * T + 2 * B] = 0

    step = runner._decode_step(mode, paged, sizes, "none", "greedy")
    dummy = jnp.zeros((0,), jnp.int32)
    buf = jnp.asarray(buf_np)
    dead = jnp.asarray(dead_np)

    def timed(b, n):
        out = step(runner.params, runner.k_pool, runner.v_pool, b, dummy)
        runner.k_pool, runner.v_pool = out[4], out[5]
        jax.block_until_ready(out[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = step(runner.params, runner.k_pool, runner.v_pool, b,
                           dummy)
                runner.k_pool, runner.v_pool = out[4], out[5]
            jax.block_until_ready(out[0])
            best = min(best, (time.perf_counter() - t0) / n * 1000)
        return best

    n = 30
    t_live = timed(buf, n)
    t_dead = timed(dead, n)
    measured = t_live - t_dead
    store_s, attn_s = runner._measure_attention_bucket(mode, plan, sizes,
                                                       paged)
    est = attn_s * 1000
    print(f"full step (live attn)  : {t_live:7.3f} ms/step", flush=True)
    print(f"full step (dead attn)  : {t_dead:7.3f} ms/step", flush=True)
    print(f"in-step attention      : {measured:7.3f} ms/step "
          f"(live - dead difference)", flush=True)
    print(f"estimator attention    : {est:7.3f} ms/step "
          f"(runner._measure_attention_bucket)", flush=True)
    print(f"estimator / in-step    : {est / measured if measured else float('nan'):7.3f}x"
          f"   (store estimate {store_s * 1000:.3f} ms excluded from both)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

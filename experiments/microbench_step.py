"""Attribute decode-step time: device compute vs per-step plan upload vs
host plan build.  Run on the real TPU after a workload warmup.

  python experiments/microbench_step.py [width] [prompt_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> int:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    prompt_len = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    steps = 200

    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner

    cfg = PRESETS["1b"]
    ecfg = EngineConfig(
        kv_pool_slots=prompt_len + width * (steps + 8 + 256) + 2048,
        max_requests=max(64, 2 * width),
        max_context_len=prompt_len + steps + 64,
    )
    runner = ModelRunner(cfg, ecfg, kernels="auto", seed=0)
    print("backend:", jax.default_backend(), "kernels:", runner.kernels,
          file=sys.stderr)

    runner.forward_prefill(list(np.random.default_rng(0).integers(
        4, cfg.vocab_size - 4, prompt_len)))
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, width)):
        c.append_token(100 + i)
    # grow to steady state
    for _ in range(8):
        tree.alloc()
        for leaf in tree.leaves.values():
            leaf.append_token(1)
    tree.alloc()

    mode = ForwardMode.TREE_DECODE_FLATTEN

    # host plan build cost
    t0 = time.perf_counter()
    for _ in range(20):
        plan = runner.build_plan(mode)
    t_plan = (time.perf_counter() - t0) / 20 * 1000
    print(f"host plan build        : {t_plan:7.3f} ms  "
          f"(t_pad={plan.t_pad}, paged={plan.paged})")

    # upload cost (single packed plan buffer)
    import jax.numpy as jnp

    buf_np, sizes, paged = runner._pack_plan(mode, plan)
    buf = jnp.asarray(buf_np)
    jax.block_until_ready(buf)
    t0 = time.perf_counter()
    for _ in range(20):
        b = jnp.asarray(buf_np)
        jax.block_until_ready(b)
    t_upload = (time.perf_counter() - t0) / 20 * 1000
    print(f"plan upload (H2D)      : {t_upload:7.3f} ms  (paged={paged})")

    # device step with fixed, resident buffer (pure compute + dispatch)
    step = runner._decode_step(mode, paged, sizes, "none")
    dummy = jnp.zeros((0,), jnp.int32)
    out = step(runner.params, runner.k_pool, runner.v_pool, buf, dummy)
    jax.block_until_ready(out[0])
    runner.k_pool, runner.v_pool = out[4], out[5]
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        out = step(runner.params, runner.k_pool, runner.v_pool, buf, dummy)
        runner.k_pool, runner.v_pool = out[4], out[5]
    jax.block_until_ready(out[0])
    t_dev = (time.perf_counter() - t0) / N * 1000
    print(f"device step (resident) : {t_dev:7.3f} ms")

    # device step with a FRESH upload per step (the real decode loop's
    # traffic pattern) — the delta vs resident isolates what the per-step
    # plan upload costs inside the pipelined stream, which per-transfer
    # timing above cannot show (async H2D may overlap compute... or not)
    out = step(runner.params, runner.k_pool, runner.v_pool,
               jnp.asarray(buf_np), dummy)
    runner.k_pool, runner.v_pool = out[4], out[5]
    t0 = time.perf_counter()
    for _ in range(N):
        b = jnp.asarray(buf_np)
        out = step(runner.params, runner.k_pool, runner.v_pool, b, dummy)
        runner.k_pool, runner.v_pool = out[4], out[5]
    jax.block_until_ready(out[0])
    t_dev_up = (time.perf_counter() - t0) / N * 1000
    print(f"device step (fresh up) : {t_dev_up:7.3f} ms  "
          f"(upload overhead {t_dev_up - t_dev:+.3f} ms/step, "
          f"buf {buf_np.nbytes // 1024} KiB)")

    # fetch RTT
    t0 = time.perf_counter()
    np.asarray(out[0])
    t_fetch = (time.perf_counter() - t0) * 1000
    print(f"result fetch (D2H)     : {t_fetch:7.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

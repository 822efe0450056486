"""Attribute decode-step time: device compute vs per-step plan upload vs
host plan build vs weight streaming vs attention.  Run on the real TPU
after a workload warmup.

  python experiments/microbench_step.py [width] [prompt_len] [model] [wq]
  python experiments/microbench_step.py 50 4000 8b int8
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def matmul_slope_bench(cfg, weights: str) -> None:
    """Per-layer matmul-stack time via a dependent in-jit loop at two
    lengths (slope removes dispatch/RTT overhead): is the weight stream at
    HBM speed-of-light for this dtype?"""
    import functools

    import jax.numpy as jnp

    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv, D = cfg.num_q_heads, cfg.num_kv_heads, cfg.head_dim
    R = 64
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (R, H), jnp.bfloat16)

    def mk(shape):
        if weights in ("int8", "int8-pallas"):
            w = jax.random.randint(key, shape, -127, 127, jnp.int8)
            s = jax.random.uniform(key, (shape[1],), jnp.float32)
            return (w, s)
        return (jax.random.normal(key, shape, jnp.bfloat16), None)

    # one decoder layer's matmuls: qkv, o, gate, up, down
    Ws = [mk(s) for s in ((H, (Hq + 2 * Hkv) * D), ((Hq * D), H),
                          (H, I), (H, I), (I, H))]

    if weights == "int8-pallas":
        from deft_tpu.ops import int8_matmul as i8mm

    def mm(x, wsc):
        w, s = wsc
        if weights == "int8-pallas" and i8mm.eligible(x, w):
            return i8mm.int8_matmul(x, w, s).astype(jnp.bfloat16)
        y = x @ w.astype(jnp.bfloat16) if w.dtype == jnp.int8 else x @ w
        if s is not None:
            y = y * s.astype(jnp.bfloat16)
        return y

    @functools.partial(jax.jit, static_argnames="k")
    def loop(x, ws, k):
        def body(x, _):
            qkv = mm(x, ws[0])
            o = mm(qkv[:, : ws[1][0].shape[0]], ws[1])
            g, u = mm(o, ws[2]), mm(o, ws[3])
            x = jnp.tanh(mm(g * u, ws[4]))
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(x.astype(jnp.float32))

    def timed(k, n=5):
        float(loop(x0, Ws, k))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(loop(x0, Ws, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1000

    K1, K2 = 10, 60
    per = (timed(K2) - timed(K1)) / (K2 - K1)
    elem = 1 if weights in ("int8", "int8-pallas") else 2
    nbytes = sum(w.size * elem for w, _ in Ws)
    total = per * cfg.num_layers
    print(f"matmul stack ({weights:5s}) : {per:7.3f} ms/layer -> "
          f"{nbytes / per / 1e6:.0f} GB/s ({weights} bytes); "
          f"x{cfg.num_layers} layers = {total:.2f} ms/step weight floor")
    # Free the bench buffers NOW: three stack benches leave ~1 GB of dead
    # device arrays behind otherwise, and the 8B-int8 runner built right
    # after needs every byte of a 16 GB v5e (observed RESOURCE_EXHAUSTED
    # when this was left to GC timing).
    for w, s in Ws:
        w.delete()
        if s is not None:
            s.delete()
    x0.delete()


def main() -> int:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    prompt_len = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    model = sys.argv[3] if len(sys.argv) > 3 else "1b"
    wq = sys.argv[4] if len(sys.argv) > 4 else "inherit"
    steps = 200

    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner

    cfg = PRESETS[model]
    matmul_slope_bench(cfg, "bf16")
    if wq in ("int8", "int8-pallas"):
        # time BOTH int8 flavors: XLA fused dequant vs the explicit Pallas
        # dequant-in-matmul kernel (ops/int8_matmul.py) — the faster one
        # should carry the 8B bench (ROADMAP pending-TPU item)
        matmul_slope_bench(cfg, "int8")
        matmul_slope_bench(cfg, "int8-pallas")
    ecfg = EngineConfig(
        kv_pool_slots=prompt_len + width * (steps + 8 + 256) + 2048,
        max_requests=max(64, 2 * width),
        max_context_len=prompt_len + steps + 64,
        weight_dtype=wq,
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

    # logits-head attribution: step time under each logits_kind.
    # topk-skip = lm_head matmul + softmax + top_k(64); greedy-skip =
    # lm_head + argmax/logsumexp; topk-greedy = what the full-vocab sort
    # and softmax materialization cost on top of the matmul.
    kinds = {}
    for kind in ("skip", "greedy", "topk"):
        s = runner._decode_step(mode, paged, sizes, "none", kind)
        o = s(runner.params, runner.k_pool, runner.v_pool, buf, dummy)
        jax.block_until_ready(o[0])
        runner.k_pool, runner.v_pool = o[4], o[5]
        t0 = time.perf_counter()
        for _ in range(N):
            o = s(runner.params, runner.k_pool, runner.v_pool, buf, dummy)
            runner.k_pool, runner.v_pool = o[4], o[5]
        jax.block_until_ready(o[0])
        kinds[kind] = (time.perf_counter() - t0) / N * 1000
    print(f"logits head: skip {kinds['skip']:.3f} / greedy "
          f"{kinds['greedy']:.3f} / topk {kinds['topk']:.3f} ms  "
          f"(lm_head+argmax {kinds['greedy'] - kinds['skip']:+.3f}, "
          f"top_k sort {kinds['topk'] - kinds['greedy']:+.3f})")

    # steady-state prefill (TTFT floor: ~2*params*prompt_len FLOPs on MXU)
    runner.reset_state()
    prompt = list(np.random.default_rng(1).integers(
        4, cfg.vocab_size - 4, prompt_len))
    t0 = time.perf_counter()
    pview = runner.forward_prefill(prompt)
    jax.block_until_ready(pview._vals)
    t_pref = (time.perf_counter() - t0) * 1000
    flops = 2 * prompt_len * (
        cfg.num_layers * (
            cfg.hidden_size * (cfg.num_q_heads + 2 * cfg.num_kv_heads)
            * cfg.head_dim
            + cfg.num_q_heads * cfg.head_dim * cfg.hidden_size
            + 3 * cfg.hidden_size * cfg.intermediate_size
        )
    )
    print(f"steady prefill p{prompt_len}: {t_pref:7.1f} ms  "
          f"({flops / (t_pref / 1e3) / 1e12:.1f} TFLOP/s effective, "
          f"matmuls only)")

    # attention + KV-store attribution (compiled per-bucket microbench;
    # uses the earlier plan's bucket — no live tree needed)
    store_s, attn_s = runner._measure_attention_bucket(
        mode, plan, sizes, paged
    )
    print(f"attention (all layers) : {attn_s * 1000:7.3f} ms")
    print(f"KV store (all layers)  : {store_s * 1000:7.3f} ms")
    print(f"residual (step - attn - store)      : "
          f"{t_dev - (attn_s + store_s) * 1000:7.3f} ms  "
          f"(matmuls + norms + dispatch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

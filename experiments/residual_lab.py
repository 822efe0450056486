"""Explain the decode-step residual with measurements (VERDICT r4 item 6).

The 8B w50 decode step is ~17 ms with int8 weights; attribution
(microbench_step.py) shows attention ~3.5 + KV store ~0.7 + a 10.65 ms
"weight floor" from the matmul-stack slope bench (655 GB/s on int8 bytes =
80% of the v5e's 819 GB/s paper HBM bandwidth) + ~2-3 ms residual.  Two
questions remain:

1. Is 655 GB/s leaving bandwidth on the table, or is it the practical
   ceiling?  Measure a PURE-READ kernel (jitted sum over a multi-GB int8
   array, two-point over reps) — the achievable ceiling for any
   weight-streaming matmul.  v5e paper bandwidth is 819 GB/s; the pure
   read typically lands below that, and the matmul stack cannot beat the
   pure read.
2. What does the round-5 compact-plan on-device EXPANSION cost per step?
   Time the jitted unpack alone at the 8B bucket.

  python experiments/residual_lab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def pure_read_ceiling() -> None:
    """GB/s of a dependent jitted reduction over an int8 array — the
    practical HBM read ceiling on this chip."""
    GB = 2 if jax.default_backend() != "cpu" else 0.125
    x = jnp.ones((int(GB * (1 << 30)),), jnp.int8)
    jax.block_until_ready(x)

    n = x.shape[0]

    @jax.jit
    def rd_dense(x, reps):
        # the slice START depends on the carry with 1024 possible values,
        # so XLA cannot hoist or enumerate the read out of the loop; size
        # is static (n - 1024 of n bytes).  A %2 start was not enough —
        # XLA precomputed both variants and the "read" measured 118 TB/s.
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(x, acc % 1024, n - 1024)
            return (jnp.sum(sl.astype(jnp.int32)) + acc) % 1024
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    def t(reps, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(rd_dense(x, jnp.int32(reps)))
            best = min(best, time.perf_counter() - t0)
        return best

    t(2)
    # wide rep span: the two-point difference must dominate the
    # transport's per-call jitter (tens of ms when degraded) — 2 GB/pass
    # at ~819 GB/s is only ~2.4 ms/pass
    lo, hi = t(4), t(64)
    per = (hi - lo) / 60
    print(f"pure int8 HBM read     : {GB / per:7.1f} GB/s "
          f"({GB} GB in {per * 1e3:.2f} ms/pass; v5e paper 819)",
          flush=True)
    x.delete()


def expansion_cost() -> None:
    """Per-step cost of the compact-plan on-device expansion at the 8B
    bucket (T=8192, R=128)."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner

    cfg = PRESETS["tiny"]  # unpack cost depends on plan sizes, not model
    runner = ModelRunner(cfg, EngineConfig(
        kv_pool_slots=16384, max_requests=128, max_context_len=8192),
        kernels="pallas", seed=0)
    runner.forward_prefill(list(np.random.default_rng(0).integers(
        4, cfg.vocab_size - 4, 4000)))
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, 50)):
        c.append_token(100 + i)
    for _ in range(8):
        tree.alloc()
        for leaf in tree.leaves.values():
            leaf.append_token(1)
    tree.alloc()
    mode = ForwardMode.TREE_DECODE_FLATTEN
    plan = runner.build_plan(mode)
    buf_np, sizes, paged = runner._pack_plan(mode, plan)
    assert paged and len(sizes) == 5, sizes
    unpack = runner._make_unpack(mode.plan_kind, sizes, True, "none")

    @jax.jit
    def expand(buf, reps):
        # poke the carry into the buffer's LAST element (a pad run row's
        # hi — inert for all outputs) so the expansion cannot be hoisted
        def body(i, acc):
            b2 = buf.at[buf.shape[0] - 1].set(acc)
            b = unpack(b2, None)
            return (acc % 2) + b.tok_lo[0] % 7 + b.blk_hi[0] % 5 + (
                b.seg_src[0] % 3)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    buf = jnp.asarray(buf_np)

    def t(reps, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(expand(buf, jnp.int32(reps)))
            best = min(best, time.perf_counter() - t0)
        return best

    t(8)
    lo, hi = t(8), t(64)
    per = (hi - lo) / 56 * 1e3
    print(f"compact-plan expansion : {per:7.3f} ms/step "
          f"(sizes={sizes}; searchsorted + blk reductions, once per step)",
          flush=True)


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    pure_read_ceiling()
    expansion_cost()
    return 0


if __name__ == "__main__":
    sys.exit(main())

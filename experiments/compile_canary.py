"""AOT-compile the paged decode kernels at the largest production shapes
WITHOUT running them — a fast canary for Mosaic lowering + scoped-VMEM
regressions before a long measurement session burns watchdog attempts on
them.

The headline case is the spec-decode ts256 bucket at 8B (Hkv=8, Rq=1024,
D=128): with naive scratch it needs ~18.7 MB scoped VMEM vs the 16 MB
limit (observed live in the round-4 take-3 session), which the lane-packed
m/l state + staged-q elisions in ops/paged_{flatten_attn,quant}.py fix.

Usage:  python experiments/compile_canary.py          # TPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention
from deft_tpu.ops.paged_quant import paged_flatten_attention_q


def canary(name, fn, args, **kw):
    # fn is already jax.jit-wrapped with the right static_argnames
    try:
        fn.lower(*args, **kw).compile()
        print(f"[canary] {name}: OK")
        return True
    except Exception as e:  # noqa: BLE001 — report and fail the session
        print(f"[canary] {name}: FAIL {type(e).__name__}: {str(e)[:400]}")
        return False


def main():
    L, S, Hkv, D = 2, 4096, 8, 128     # pool rows don't affect VMEM budget
    T, SEG = 2048, 128
    ok = True
    # BLOCK 512 canaries gate a default block_len bump (kernel_lab r5:
    # 512/1024 beat 256 on every measured shape — but the big-Rq
    # spec-decode buckets are the scoped-VMEM pinch point)
    for BLOCK in (256, 512):
        nb, nseg = T // BLOCK, BLOCK // SEG
        # Rq=256 is a CONTROL: it is in daily production use, so a FAIL
        # here means the remote compile service itself is down, while
        # big-Rq-only failures point at the compile helper dying on
        # large-scoped-VMEM compiles (observed as HTTP 500 / helper exit 1
        # on 2026-08-20 for ALL big-Rq shapes incl. ones that compiled in
        # round 4)
        for rq in (256, 1024, 2048):
            qf = jnp.zeros((Hkv, rq, D), jnp.bfloat16)
            li = jnp.zeros((), jnp.int32)
            seg = jnp.zeros((nb * nseg,), jnp.int32)
            lo = jnp.zeros((T,), jnp.int32)
            hi = jnp.ones((T,), jnp.int32)
            blo = jnp.zeros((nb,), jnp.int32)
            bhi = jnp.ones((nb,), jnp.int32)
            kw = dict(scale=0.088, qpk=4, block_len=BLOCK, seg_len=SEG)
            kp = jnp.zeros((L, S, Hkv * D), jnp.bfloat16)
            ok &= canary(f"bf16 Rq={rq} B={BLOCK}", paged_flatten_attention,
                         (qf, kp, kp, li, seg, lo, hi, blo, bhi), **kw)
            kq = jnp.zeros((L, S, Hkv * D), jnp.int8)
            ks = jnp.zeros((L, Hkv, S), jnp.float32)
            ok &= canary(f"int8 Rq={rq} B={BLOCK}",
                         paged_flatten_attention_q,
                         (qf, kq, kq, ks, ks, li, seg, lo, hi, blo, bhi),
                         **kw)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

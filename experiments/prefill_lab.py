"""Prefill-kernel lab (VERDICT r3 item 6): time the causal FA kernel at
the 8B p4000 geometry across (BM, BN) tile shapes on the real TPU, report
effective TFLOP/s and MFU vs the v5e ~197 bf16 peak.

  python experiments/prefill_lab.py [N [layers]]

The r3 kernel's BM=128 re-streamed K/V from HBM NQ/128 times per layer
(~5 GB/layer at this shape); the sweep quantifies what each tile choice
buys.  Amortized two-point timing over a layer scan (tunnel dispatch
cancels), identical to kernel_lab.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HKV, D, QPK = 8, 128, 4  # Llama-3-8B attention geometry
PEAK_TFLOPS = 197.0      # v5e bf16


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4608
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from deft_tpu.ops.prefill import prefill_attention

    rng = np.random.default_rng(0)
    NQ = N * QPK
    qf = jnp.asarray(rng.standard_normal((HKV, NQ, D)) * 0.3, jnp.bfloat16)
    kt = jnp.asarray(rng.standard_normal((HKV, N, D)) * 0.3, jnp.bfloat16)
    vt = jnp.asarray(rng.standard_normal((HKV, N, D)) * 0.3, jnp.bfloat16)
    lis = jnp.arange(layers, dtype=jnp.int32)
    scale = D ** -0.5
    # causal FLOPs: QK^T + PV, ~half the square masked away
    flops = 2 * 2 * HKV * NQ * N * D / 2

    ref = None
    for bm, bn in [(0, 0), (128, 128), (256, 256), (512, 512),
                   (1024, 512), (1024, 1024), (2048, 512),
                   (512, 1024), (1024, 2048), (2048, 1024)]:
        if bm and (NQ % bm or N % bn):
            continue

        def run_fn(qf, kt, vt, reps, bm=bm, bn=bn):
            def outer(_, acc):
                def body(a, li):
                    # carry-dependent q: the body must depend on the scan
                    # carry or XLA hoists the (layer-invariant) prefill out
                    # of the loop and times ONE call as `layers`
                    qi = (qf.astype(jnp.float32) + a * 1e-30).astype(
                        qf.dtype)
                    o = prefill_attention(qi, kt, vt, scale=scale, qpk=QPK,
                                          bm=bm, bn=bn)
                    return a + o.astype(jnp.float32).sum(), None

                tot, _ = jax.lax.scan(body, acc * 1e-30, lis)
                return tot

            return jax.lax.fori_loop(0, reps, outer, jnp.float32(0.0))

        run = jax.jit(run_fn)

        out = np.asarray(prefill_attention(qf, kt, vt, scale=scale, qpk=QPK,
                                           bm=bm, bn=bn), np.float64)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()

        def t(reps, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(run(qf, kt, vt, jnp.int32(reps)))
                best = min(best, time.perf_counter() - t0)
            return best

        t(2)
        lo, hi = t(2), t(8)
        ms = (hi - lo) / 6 / layers * 1000  # per layer
        tf = flops / (ms / 1e3) / 1e12
        print(f"bm={bm or 'auto':>4} bn={bn or 'auto':>4}  "
              f"{ms:7.3f} ms/layer  {tf:6.1f} TFLOP/s "
              f"({tf / PEAK_TFLOPS * 100:4.1f}% of peak)  "
              f"max|diff|={err:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-executable-launch overhead probe.

Three executions of ~identical total FLOPs:
  A. N sequential jit calls (same resident args)      — per-call launches
  B. one jit call with an N-step lax.scan             — single launch
  C. N sequential calls with a CHANGING device scalar — per-call launches
     with a distinct small argument (the replay executor's shape)

If A/N >> B/N, the runtime charges a large fixed cost per launch; C vs A
splits arg-marshaling from launch.  Run with nothing else on the chip.

  python experiments/call_probe.py [N] [M]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    print("backend:", jax.default_backend(), "N:", N, "M:", M, flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, M), jnp.bfloat16)
    w = jax.random.normal(key, (M, M), jnp.bfloat16)

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w)

    @jax.jit
    def f_scan(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), ()
        y, _ = jax.lax.scan(body, x, None, length=N)
        return y

    @jax.jit
    def f_ctr(x, w, c):
        return jnp.tanh(x @ w) * (1 + c.astype(jnp.bfloat16) * 0), c + 1

    jax.block_until_ready(f(x, w))
    jax.block_until_ready(f_scan(x, w))
    c0 = jnp.zeros((), jnp.int32)
    jax.block_until_ready(f_ctr(x, w, c0)[0])

    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y, w)
    jax.block_until_ready(y)
    a = time.perf_counter() - t0

    t0 = time.perf_counter()
    jax.block_until_ready(f_scan(x, w))
    b = time.perf_counter() - t0

    t0 = time.perf_counter()
    y, c = x, c0
    for _ in range(N):
        y, c = f_ctr(y, w, c)
    jax.block_until_ready(y)
    cc = time.perf_counter() - t0

    print(f"A per-call loop   : {a*1e3:8.1f} ms total = {a/N*1e3:7.2f} ms/step",
          flush=True)
    print(f"B scan (1 launch) : {b*1e3:8.1f} ms total = {b/N*1e3:7.2f} ms/step",
          flush=True)
    print(f"C per-call w/ ctr : {cc*1e3:8.1f} ms total = {cc/N*1e3:7.2f} ms/step",
          flush=True)
    print(f"=> per-launch overhead ~ {(a-b)/N*1e3:.2f} ms "
          f"(A-B)/N; arg churn adds {(cc-a)/N*1e3:.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

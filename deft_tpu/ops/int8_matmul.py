"""Weight-streaming int8 matmul, Pallas TPU kernel.

Decode is weight-bandwidth-bound: an 8B-parameter step reads ~8 GB of
matmul weights while the activations are a few hundred KB.  With int8
weight-only quantization (per-output-channel fp32 scales, models/loader.py)
the speed-of-light step time is halved — IF the int8->bf16 dequant streams
at int8 byte bandwidth.  The XLA path (models/llama.py ``mm``) relies on the
convert fusing into the dot's weight-streaming loop; this kernel makes the
fusion explicit and guaranteed:

  grid (I/bi, H/bh), h innermost: each step DMAs one (bh, bi) int8 weight
  tile HBM->VMEM (Pallas double-buffers automatically), converts to bf16 in
  VMEM, and feeds the MXU with the resident (R, bh) activation tile,
  accumulating (R, bi) fp32 in scratch; the final h step applies the
  per-channel scale and writes bf16.

The weight is the ONLY HBM-resident operand streamed, so the kernel's HBM
traffic is exactly H*I int8 bytes (+ activations once).

No reference counterpart (the reference is fp16-only, single A100 —
SURVEY.md §2.4); this is north-star item "fuse KV gather with dequant"
(SURVEY.md §7 step 7) applied to the weight path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import _interpret


def _pick_block(dim: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nh: int):
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...].astype(x_ref.dtype),  # dequant in VMEM, matches engine dtype
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == nh - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_i", "block_h"))
def int8_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    block_i: int = 512,
    block_h: int = 512,
) -> jnp.ndarray:
    """x (R, H) bf16 @ dequant(w (H, I) int8, scale (I,) f32) -> (R, I) bf16.

    R must be a multiple of 8 (the fp32 sublane); the decode row counts
    (l_pad buckets) already are.  Callers gate on `eligible`."""
    R, H = x.shape
    _, I = w.shape
    bi = min(block_i, _pick_block(I) or I)
    bh = min(block_h, _pick_block(H) or H)
    # the grid floor-divides: non-dividing tiles would silently leave
    # output columns unwritten / weight rows unread (eligible() pre-checks
    # the runtime path, but direct callers must fail loudly)
    assert I % bi == 0 and H % bh == 0, (I, bi, H, bh)
    nh = H // bh
    grid = (I // bi, nh)
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, bh), lambda i, h: (0, h)),
            pl.BlockSpec((bh, bi), lambda i, h: (h, i)),
            pl.BlockSpec((1, bi), lambda i, h: (0, i)),
        ],
        out_specs=pl.BlockSpec((R, bi), lambda i, h: (0, i)),
        out_shape=jax.ShapeDtypeStruct((R, I), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, bi), jnp.float32)],
        interpret=_interpret(),
    )(x, w, scale.reshape(1, I).astype(jnp.float32))
    return out


def eligible(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    """Kernel preconditions: 2-D decode-sized activations (whole x tile
    resident in VMEM), sublane-aligned rows, tileable dims.  Prefill
    (R in the thousands) stays on XLA — it is compute-bound and the
    convert amortizes there."""
    if x.ndim != 2 or w.ndim != 2:
        return False
    R, H = x.shape
    return (
        R % 8 == 0
        and R <= 256
        and _pick_block(H) != 0
        and _pick_block(w.shape[1]) != 0
    )

"""DeFT-Flatten tree attention, Pallas TPU kernel.

This is the TPU-native replacement for the reference's flagship Triton path
(/root/reference/DeFT/deft/layers/attention/tree_attention.py:551-976, the
``tree_attention_subtree_fwd`` stage-1 kernel + the two-stage atomic LSE
reduction :296-548).  Differences, by TPU design:

- **No bitmasks.**  KV tokens are laid out in DFS order and carry a
  contiguous descendant-leaf interval [tok_lo, tok_hi); "query q attends
  token t" is a range test (see plan/flatten.py).  The (32-query, int64
  bitmask) partial packing disappears.
- **No atomics.**  TPU grids iterate sequentially over the innermost
  dimension on a core, so the flash-attention online softmax accumulates
  (m, l, acc) in VMEM scratch across KV blocks; the global LSE combine is
  implicit.  (The reference needs fp32 HBM atomics because its CUDA thread
  blocks run concurrently.)
- **Block skipping.**  Per-block leaf-interval bounds (blk_lo, blk_hi) live
  in SMEM; a block whose interval is empty (tree padding) is skipped.
- **GQA folding.**  Queries fold to (Hkv, R*q_per_kv, D) so each KV head's
  tile feeds the MXU with R*q_per_kv rows.

The KV gather from the paged pool is performed by XLA (one fused
gather+transpose into a contiguous (Hkv, T, D) operand) before the kernel;
`ops/paged_flatten_attn.py` supplies the IO-optimal in-kernel paged gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def head_pack(head_dim: int, num_kv_heads: int) -> int:
    """Heads packed per 128-lane group in the paged kernels: the largest
    divisor of num_kv_heads that fits 128 lanes (a non-divisor pack would
    make the last group's lane slice overrun the Hkv*D pool row, e.g.
    Hkv=3, D=64)."""
    pack = max(1, min(128 // head_dim, num_kv_heads))
    while num_kv_heads % pack:
        pack -= 1
    return pack


def fold_q(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """(R, Hq, D) -> (Hkv, R*qpk, D); row r*qpk+g is query head
    h_kv*qpk+g of leaf r (standard GQA grouping)."""
    R, Hq, D = q.shape
    qpk = Hq // num_kv_heads
    return (
        q.reshape(R, num_kv_heads, qpk, D)
        .transpose(1, 0, 2, 3)
        .reshape(num_kv_heads, R * qpk, D)
    )


def unfold_o(o: jnp.ndarray, num_leaves: int) -> jnp.ndarray:
    """(Hkv, R*qpk, D) -> (R, Hq, D)."""
    Hkv, Rq, D = o.shape
    qpk = Rq // num_leaves
    return (
        o.reshape(Hkv, num_leaves, qpk, D)
        .transpose(1, 0, 2, 3)
        .reshape(num_leaves, Hkv * qpk, D)
    )


def _flatten_kernel(
    blk_lo_ref,  # SMEM (1, B)
    blk_hi_ref,  # SMEM (1, B)
    q_ref,       # VMEM (1, Rq, D)
    k_ref,       # VMEM (1, BLOCK, D)
    v_ref,       # VMEM (1, BLOCK, D)
    lo_ref,      # VMEM (1, BLOCK)
    hi_ref,      # VMEM (1, BLOCK)
    o_ref,       # VMEM (1, Rq, D)
    acc_ref,     # VMEM (Rq, D) f32
    m_ref,       # VMEM (Rq, 128) f32
    l_ref,       # VMEM (Rq, 128) f32
    *,
    scale: float,
    qpk: int,
    block_len: int,
    num_blocks: int,
):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    live = blk_lo_ref[0, b] < blk_hi_ref[0, b]

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        rq = q.shape[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Rq, BLOCK)
        leaf = jax.lax.broadcasted_iota(jnp.int32, (rq, block_len), 0) // qpk
        mask = (lo_ref[...] <= leaf) & (leaf < hi_ref[...])  # (1,B)x(Rq,B)
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(jnp.where(mask, s, _NEG), axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # (Rq, BLOCK) f32
        alpha = jnp.exp(m_prev - m_new)  # (Rq, 1)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p,
            v_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(b == num_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("scale", "qpk", "block_len")
)
def flatten_attention(
    qf: jnp.ndarray,      # (Hkv, Rq, D) folded queries
    kt: jnp.ndarray,      # (Hkv, T, D) tree KV in DFS order
    vt: jnp.ndarray,      # (Hkv, T, D)
    tok_lo: jnp.ndarray,  # (T,) int32
    tok_hi: jnp.ndarray,  # (T,) int32
    blk_lo: jnp.ndarray,  # (B,) int32
    blk_hi: jnp.ndarray,  # (B,) int32
    *,
    scale: float,
    qpk: int,
    block_len: int = 128,
) -> jnp.ndarray:
    Hkv, Rq, D = qf.shape
    T = kt.shape[1]
    nb = T // block_len
    assert nb * block_len == T, (T, block_len)

    kernel = functools.partial(
        _flatten_kernel,
        scale=scale,
        qpk=qpk,
        block_len=block_len,
        num_blocks=nb,
    )
    grid = (Hkv, nb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nb), lambda h, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb), lambda h, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Rq, D), lambda h, b: (h, 0, 0)),
            pl.BlockSpec((1, block_len, D), lambda h, b: (h, b, 0)),
            pl.BlockSpec((1, block_len, D), lambda h, b: (h, b, 0)),
            pl.BlockSpec((1, block_len), lambda h, b: (0, b)),
            pl.BlockSpec((1, block_len), lambda h, b: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, Rq, D), lambda h, b: (h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Hkv, Rq, D), qf.dtype),
        scratch_shapes=[
            pltpu.VMEM((Rq, D), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hkv * Rq * T * D,
            bytes_accessed=2 * Hkv * T * D * kt.dtype.itemsize,
            transcendentals=Hkv * Rq * T,
        ),
    )(
        blk_lo.reshape(1, nb),
        blk_hi.reshape(1, nb),
        qf,
        kt,
        vt,
        tok_lo.reshape(1, T),
        tok_hi.reshape(1, T),
    )
    return out


def flatten_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """AttnFn entry: gather tree KV (XLA fused gather+transpose) and run the
    flatten kernel.  Matches attn_impls.flatten_attn_xla semantics."""
    from deft_tpu.models.llama import kv_gather_heads

    R, Hq, D = q.shape
    Hkv = k_pool.data.shape[-1] // D
    qpk = Hq // Hkv
    kt = jnp.moveaxis(kv_gather_heads(k_pool, li, batch.kv_idx, D, q.dtype), 1, 0)
    vt = jnp.moveaxis(kv_gather_heads(v_pool, li, batch.kv_idx, D, q.dtype), 1, 0)
    qf = fold_q(q, Hkv)
    o = flatten_attention(
        qf,
        kt,
        vt,
        batch.tok_lo,
        batch.tok_hi,
        batch.blk_lo,
        batch.blk_hi,
        scale=scale,
        qpk=qpk,
        block_len=int(batch.kv_idx.shape[0]) // int(batch.blk_lo.shape[0]),
    )
    return unfold_o(o, R)

"""DeFT-Flatten tree attention with in-kernel paged KV gather — the
IO-optimal flagship kernel.

The gather-path kernel (ops/flatten_attn.py) lets XLA materialize the
DFS-flattened KV (gather: read pool + write T + re-read T => ~3x the
minimum KV IO).  Here the paged pools stay in HBM and the kernel itself
DMA-gathers each 128-token KV block as ``block_len/seg_len`` contiguous
(seg_len, head_dim) segments (plan/flatten.py seg tables; pool contiguity
from TokenKVPool.alloc_for chunking), double-buffered across blocks — KV is
read from HBM exactly once, the DeFT IO bound.

This replaces the reference's per-token ``KV_indices`` gather inside the
Triton kernel (/root/reference/DeFT/deft/layers/attention/
tree_attention.py:859-976): GPU gathers ride the cache hierarchy, while TPU
needs explicit bulk DMA — hence segments instead of token indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import fold_q, unfold_o

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _paged_kernel(
    # scalar prefetch
    li_ref,       # (1,) layer index
    seg_src_ref,  # (B * nseg,) pool address of each segment
    blk_lo_ref,   # (B,)
    blk_hi_ref,   # (B,)
    # inputs
    q_ref,        # VMEM (1, Rq, D)
    k_pool_ref,   # ANY  (L, Hkv, S, D)
    v_pool_ref,   # ANY  (L, Hkv, S, D)
    lo_ref,       # VMEM (1, BLOCK)
    hi_ref,       # VMEM (1, BLOCK)
    # outputs
    o_ref,        # VMEM (1, Rq, D)
    # scratch
    kbuf,         # VMEM (2, BLOCK, D) pool dtype
    vbuf,         # VMEM (2, BLOCK, D)
    sem,          # DMA sems (2, 2, nseg)
    acc_ref,      # VMEM (Rq, D) f32
    m_ref,        # VMEM (Rq, 128) f32
    l_ref,        # VMEM (Rq, 128) f32
    *,
    scale: float,
    qpk: int,
    block_len: int,
    seg_len: int,
    num_blocks: int,
):
    h = pl.program_id(0)
    b = pl.program_id(1)
    li = li_ref[0]
    nseg = block_len // seg_len

    def seg_copies(bb, slot):
        copies = []
        for j in range(nseg):
            src = seg_src_ref[bb * nseg + j]
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, h, pl.ds(src, seg_len), :],
                kbuf.at[slot, pl.ds(j * seg_len, seg_len), :],
                sem.at[slot, 0, j],
            ))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, h, pl.ds(src, seg_len), :],
                vbuf.at[slot, pl.ds(j * seg_len, seg_len), :],
                sem.at[slot, 1, j],
            ))
        return copies

    def live(bb):
        return blk_lo_ref[bb] < blk_hi_ref[bb]

    def issue(bb, slot):
        @pl.when(live(bb))
        def _():
            for c in seg_copies(bb, slot):
                c.start()

    # warmup: first block of this head row
    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        issue(0, 0)

    # prefetch next block into the other buffer
    @pl.when(b + 1 < num_blocks)
    def _prefetch():
        issue(b + 1, (b + 1) % 2)

    @pl.when(live(b))
    def _compute():
        slot = b % 2
        for c in seg_copies(b, slot):
            c.wait()
        q = q_ref[0]
        rq = q.shape[0]
        k = kbuf[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        leaf = jax.lax.broadcasted_iota(jnp.int32, (rq, block_len), 0) // qpk
        mask = (lo_ref[...] <= leaf) & (leaf < hi_ref[...])
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(jnp.where(mask, s, _NEG), axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p,
            vbuf[slot].astype(jnp.float32),
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
    jax.jit, static_argnames=("scale", "qpk", "block_len", "seg_len")
)
def paged_flatten_attention(
    qf: jnp.ndarray,       # (Hkv, Rq, D)
    k_pool: jnp.ndarray,   # (L, Hkv, S, D)
    v_pool: jnp.ndarray,   # (L, Hkv, S, D)
    li: jnp.ndarray,       # () int32 layer index
    seg_src: jnp.ndarray,  # (B * nseg,) int32
    tok_lo: jnp.ndarray,   # (T,)
    tok_hi: jnp.ndarray,   # (T,)
    blk_lo: jnp.ndarray,   # (B,)
    blk_hi: jnp.ndarray,   # (B,)
    *,
    scale: float,
    qpk: int,
    block_len: int,
    seg_len: int,
) -> jnp.ndarray:
    Hkv, Rq, D = qf.shape
    T = tok_lo.shape[0]
    nb = T // block_len
    assert nb * block_len == T

    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        qpk=qpk,
        block_len=block_len,
        seg_len=seg_len,
        num_blocks=nb,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, Rq, D), lambda h, b, *_: (h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block_len), lambda h, b, *_: (0, b)),
            pl.BlockSpec((1, block_len), lambda h, b, *_: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, Rq, D), lambda h, b, *_: (h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_len, D), k_pool.dtype),
            pltpu.VMEM((2, block_len, D), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2, block_len // seg_len)),
            pltpu.VMEM((Rq, D), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, Rq, D), qf.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hkv * Rq * T * D,
            bytes_accessed=2 * Hkv * T * D * k_pool.dtype.itemsize,
            transcendentals=Hkv * Rq * T,
        ),
    )(
        li.reshape(1).astype(jnp.int32),
        seg_src,
        blk_lo,
        blk_hi,
        qf,
        k_pool,
        v_pool,
        tok_lo.reshape(1, T),
        tok_hi.reshape(1, T),
    )
    return out


def paged_flatten_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """AttnFn entry for the paged path; requires batch.seg_src."""
    R, Hq, D = q.shape
    assert not k_pool.quantized, "paged kernel int8 path: use gather fallback"
    k_pool, v_pool = k_pool.data, v_pool.data
    Hkv = k_pool.shape[1]
    T = int(batch.tok_lo.shape[0])
    B = int(batch.blk_lo.shape[0])
    block_len = T // B
    nseg = int(batch.seg_src.shape[0]) // B
    o = paged_flatten_attention(
        fold_q(q, Hkv),
        k_pool,
        v_pool,
        li,
        batch.seg_src,
        batch.tok_lo,
        batch.tok_hi,
        batch.blk_lo,
        batch.blk_hi,
        scale=scale,
        qpk=Hq // Hkv,
        block_len=block_len,
        seg_len=block_len // nseg,
    )
    return unfold_o(o, R)

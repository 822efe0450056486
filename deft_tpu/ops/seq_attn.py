"""Sequential per-leaf decode attention (Flash-Decoding / Radix baseline),
Pallas TPU kernel.

Parity surface: /root/reference/DeFT/deft/layers/attention/token_attention.py
(:11-150, :297-335).  The reference's two-stage variant materializes the full
(heads, total_tokens) logits array in HBM between stages; here the online
softmax runs in VMEM scratch so only the per-leaf KV path reads hit HBM —
those per-leaf reads (a shared prefix re-read once per leaf) are the point of
this baseline and are kept.
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


def _seq_kernel(
    seq_lens_ref,  # SMEM (1, R)
    q_ref,         # VMEM (1, 1, qpk, D)
    k_ref,         # VMEM (1, 1, BLOCK, D)
    v_ref,         # VMEM (1, 1, BLOCK, D)
    o_ref,         # VMEM (1, 1, qpk, D)
    acc_ref,       # VMEM (qpk, D) f32
    m_ref,         # VMEM (qpk, 128) f32
    l_ref,         # VMEM (qpk, 128) f32
    *,
    scale: float,
    block_len: int,
    num_blocks: int,
):
    r = pl.program_id(0)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    sl = seq_lens_ref[0, r]
    live = c * block_len < sl

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]  # (qpk, D)
        k = k_ref[0, 0]  # (BLOCK, D)
        qpk = q.shape[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (qpk, BLOCK)
        tok = jax.lax.broadcasted_iota(jnp.int32, (1, block_len), 1) + c * block_len
        mask = tok < sl  # (1, BLOCK)
        mask = jnp.broadcast_to(mask, (qpk, block_len))
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(jnp.where(mask, s, _NEG), axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p,
            v_ref[0, 0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(c == num_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0, 0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("scale", "block_len"))
def seq_attention(
    qf: jnp.ndarray,       # (R, Hkv, qpk, D)
    kt: jnp.ndarray,       # (R, Hkv, C, D) per-leaf gathered paths
    vt: jnp.ndarray,       # (R, Hkv, C, D)
    seq_lens: jnp.ndarray,  # (R,) int32
    *,
    scale: float,
    block_len: int = 128,
) -> jnp.ndarray:
    R, Hkv, qpk, D = qf.shape
    C = kt.shape[2]
    nb = C // block_len
    assert nb * block_len == C, (C, block_len)

    kernel = functools.partial(
        _seq_kernel, scale=scale, block_len=block_len, num_blocks=nb
    )
    out = pl.pallas_call(
        kernel,
        grid=(R, Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, R), lambda r, h, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, qpk, D), lambda r, h, c: (r, h, 0, 0)),
            pl.BlockSpec((1, 1, block_len, D), lambda r, h, c: (r, h, c, 0)),
            pl.BlockSpec((1, 1, block_len, D), lambda r, h, c: (r, h, c, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, qpk, D), lambda r, h, c: (r, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, Hkv, qpk, D), qf.dtype),
        scratch_shapes=[
            pltpu.VMEM((qpk, D), jnp.float32),
            pltpu.VMEM((qpk, 128), jnp.float32),
            pltpu.VMEM((qpk, 128), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * Hkv * qpk * C * D,
            bytes_accessed=2 * R * Hkv * C * D * kt.dtype.itemsize,
            transcendentals=R * Hkv * qpk * C,
        ),
    )(seq_lens.reshape(1, R), qf, kt, vt)
    return out


def seq_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """AttnFn entry for the sequential baseline: per-leaf path gather (the
    baseline's defining per-leaf KV re-read) then flash decode."""
    from deft_tpu.models.llama import kv_gather_heads

    R, Hq, D = q.shape
    Hkv = k_pool.data.shape[-1] // D
    qpk = Hq // Hkv
    kt = jnp.swapaxes(kv_gather_heads(k_pool, li, batch.paths, D, q.dtype), 1, 2)
    vt = jnp.swapaxes(kv_gather_heads(v_pool, li, batch.paths, D, q.dtype), 1, 2)
    qf = q.reshape(R, Hkv, qpk, D)
    o = seq_attention(qf, kt, vt, batch.seq_lens, scale=scale)
    return o.reshape(R, Hq, D)

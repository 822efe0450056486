"""Causal prefill flash attention, Pallas TPU kernel.

Parity surface: /root/reference/DeFT/deft/layers/attention/
context_flashattention_nopad.py:13-195 (lightllm-derived causal FA).  The
reference batches ragged sequences with B_Start_Loc/B_Seqlen; this engine
prefills one prompt at a time (same as the reference's actual usage — one
tree per run), padded to a static bucket.  Queries fold GQA groups into MXU
rows; blocks strictly above the causal diagonal are skipped.
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


def _prefill_kernel(
    q_ref,    # VMEM (1, BM, D)
    k_ref,    # VMEM (1, BN, D)
    v_ref,    # VMEM (1, BN, D)
    o_ref,    # VMEM (1, BM, D)
    acc_ref,  # VMEM (BM, D) f32
    m_ref,    # VMEM (BM, 128) f32
    l_ref,    # VMEM (BM, 128) f32
    *,
    scale: float,
    qpk: int,
    bm: int,
    bn: int,
    num_kv_blocks: int,
):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # last query *token* in this q tile; skip KV blocks fully above diagonal
    last_tok_q = (i * bm + bm - 1) // qpk
    live = j * bn <= last_tok_q

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BM, BN)
        tok_q = (jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0) + i * bm) // qpk
        tok_k = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        mask = tok_q >= tok_k
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(jnp.where(mask, s, _NEG), axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p,
            v_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("scale", "qpk"))
def prefill_attention(
    qf: jnp.ndarray,  # (Hkv, N*qpk, D) folded queries
    kt: jnp.ndarray,  # (Hkv, N, D)
    vt: jnp.ndarray,  # (Hkv, N, D)
    *,
    scale: float,
    qpk: int,
) -> jnp.ndarray:
    Hkv, NQ, D = qf.shape
    N = kt.shape[1]
    BM = min(128, NQ)
    BN = min(128, N)
    assert NQ % BM == 0 and N % BN == 0, (NQ, N)
    nqb, nkb = NQ // BM, N // BN

    kernel = functools.partial(
        _prefill_kernel, scale=scale, qpk=qpk, bm=BM, bn=BN, num_kv_blocks=nkb
    )
    out = pl.pallas_call(
        kernel,
        grid=(Hkv, nqb, nkb),
        in_specs=[
            pl.BlockSpec((1, BM, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, BN, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, BN, D), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, BM, D), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hkv, NQ, D), qf.dtype),
        scratch_shapes=[
            pltpu.VMEM((BM, D), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
            pltpu.VMEM((BM, 128), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hkv * NQ * N * D // 2,  # ~half masked away
            bytes_accessed=2 * Hkv * N * D * kt.dtype.itemsize * max(nqb, 1),
            transcendentals=Hkv * NQ * N // 2,
        ),
    )(qf, kt, vt)
    return out


def prefill_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """AttnFn entry: causal self-attention over the in-flight projections."""
    N, Hq, D = q.shape
    Hkv = k_new.shape[1]
    qpk = Hq // Hkv
    qf = fold_q(q, Hkv)
    kt = jnp.swapaxes(k_new, 0, 1)  # (Hkv, N, D)
    vt = jnp.swapaxes(v_new, 0, 1)
    o = prefill_attention(qf, kt, vt, scale=scale, qpk=qpk)
    return unfold_o(o, N)

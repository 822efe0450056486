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

from deft_tpu.ops.flatten_attn import _NEG, _interpret, fold_q, unfold_o


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


# -- ragged batch (multiple prompts in one launch) -----------------------------


def _ragged_prefill_kernel(
    qblk_lo_ref,  # SMEM (1, nqb): first kv token q-block i may attend
    q_ref,        # VMEM (1, BM, D)
    k_ref,        # VMEM (1, BN, D)
    v_ref,        # VMEM (1, BN, D)
    segq_ref,     # VMEM (1, BM) int32 segment id per folded q row (pads -1)
    segk_ref,     # VMEM (1, BN) int32 segment id per kv token (pads -2)
    o_ref,        # VMEM (1, BM, D)
    acc_ref,      # VMEM (BM, D) f32
    m_ref,        # VMEM (BM, 128) f32
    l_ref,        # VMEM (BM, 128) f32
    *,
    scale: float,
    qpk: int,
    bm: int,
    bn: int,
    num_kv_blocks: int,
):
    """Ragged-batch causal prefill: N prompts concatenated along the token
    axis with per-token segment ids; token i attends token j iff both are in
    the same segment and i >= j.  Parity surface: the reference's ragged
    B_Start_Loc/B_Seqlen prefill (context_flashattention_nopad.py:132-195) —
    re-expressed with segment ids, the static-shape TPU formulation.

    Compute skipping is two-sided: KV blocks past the causal diagonal AND
    blocks entirely before the q-block's first segment start are skipped
    (per-qblock lo from SMEM), so B equal prompts cost ~B x L^2/2, not
    (B x L)^2/2."""
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    last_tok_q = (i * bm + bm - 1) // qpk
    lo = qblk_lo_ref[0, i]
    live = (j * bn <= last_tok_q) & (j * bn + bn - 1 >= lo)

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BM, BN)
        tok_q = (jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0) + i * bm) // qpk
        tok_k = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        same_seg = segq_ref[0][:, None] == segk_ref[0][None, :]
        mask = same_seg & (tok_q >= tok_k)
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
def ragged_prefill_attention(
    qf: jnp.ndarray,   # (Hkv, N*qpk, D) folded queries
    kt: jnp.ndarray,   # (Hkv, N, D)
    vt: jnp.ndarray,   # (Hkv, N, D)
    seg: jnp.ndarray,  # (N,) int32 prompt id per token, ascending; pads < 0
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

    seg = seg.astype(jnp.int32)
    seg_k = jnp.where(seg >= 0, seg, -2)[None, :]           # (1, N)
    seg_q = jnp.repeat(jnp.where(seg >= 0, seg, -1), qpk)[None, :]  # (1, NQ)
    # first-token index of each token's segment (segments are contiguous and
    # ascending, so a running max over change-points gives it vectorized)
    idx = jnp.arange(N, dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), seg[1:] != seg[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(change, idx, 0))
    qblk_lo = seg_start[(jnp.arange(nqb, dtype=jnp.int32) * BM) // qpk][None, :]

    kernel = functools.partial(
        _ragged_prefill_kernel, scale=scale, qpk=qpk, bm=BM, bn=BN,
        num_kv_blocks=nkb,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Hkv, nqb, nkb),
        in_specs=[
            pl.BlockSpec((1, nqb), lambda h, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BM, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, BN, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, BN, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, BM), lambda h, i, j: (0, i)),
            pl.BlockSpec((1, BN), lambda h, i, j: (0, j)),
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
            flops=2 * 2 * Hkv * NQ * N * D // 2,
            bytes_accessed=2 * Hkv * N * D * kt.dtype.itemsize * max(nqb, 1),
            transcendentals=Hkv * NQ * N // 2,
        ),
    )(qblk_lo, qf, kt, vt, seg_q, seg_k)
    return out


def ragged_prefill_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch,
                               scale):
    """AttnFn entry: ragged-batch causal self-attention (batch.seg_ids)."""
    N, Hq, D = q.shape
    Hkv = k_new.shape[1]
    qpk = Hq // Hkv
    qf = fold_q(q, Hkv)
    kt = jnp.swapaxes(k_new, 0, 1)
    vt = jnp.swapaxes(v_new, 0, 1)
    o = ragged_prefill_attention(qf, kt, vt, batch.seg_ids, scale=scale,
                                 qpk=qpk)
    return unfold_o(o, N)

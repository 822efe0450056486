"""Causal prefill flash attention, Pallas TPU kernel.

Parity surface: /root/reference/DeFT/deft/layers/attention/
context_flashattention_nopad.py:13-195 (lightllm-derived causal FA).  The
reference batches ragged sequences with B_Start_Loc/B_Seqlen; this engine
prefills one prompt at a time (same as the reference's actual usage — one
tree per run), padded to a static bucket.  Queries fold GQA groups into MXU
rows; blocks strictly above the causal diagonal are skipped.

Performance notes (r4 prefill kernel lab, VERDICT r3 item 6):
- **KV re-streaming sets the floor.**  The grid is (head, q block, kv
  block) with kv innermost, so K/V stream from HBM once per Q BLOCK:
  bytes ~ nqb * N * D * 2 * 2 per head.  The r3 kernel's BM=128 gave
  nqb = NQ/128 re-reads (~5 GB/layer at the 8B p4000 shape, ~36% MFU);
  q tiles now default to BM=512 (4x less KV traffic) with BN=512 kv
  blocks (fewer per-block fixed costs), both static-tunable.
- The score pass borrows the flatten kernel's measured trims
  (ops/paged_flatten_attn.py): softmax scale + log2(e) folded into q once
  per tile (exp -> exp2, the VPU primitive), ONE where for masking
  (masked scores -> -1e30 with m clamped >= -1e5 so exp2 underflows to
  exact 0), m/l state written on lane 0 only.
- **Interior blocks skip the mask entirely**: a kv block whose last token
  <= the q tile's first token is fully causal-visible, so the iota/
  compare/where passes vanish (half the blocks at long prompt lengths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import _NEG, _interpret, fold_q, unfold_o

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _pick_block(n: int, cap: int = 512) -> int:
    """Largest power-of-two block <= cap dividing n (n is bucket-padded,
    so this is >= 128 in practice and never fails for n >= 8)."""
    b = cap
    while b > 8 and n % b:
        b //= 2
    return min(b, n)


# Default tile caps, tuned on v5e (experiments/results_r4/prefill_lab_*):
# q tiles of 1024 rows quarter the KV re-streaming vs 256-row tiles, and
# 1024-token kv blocks halve the per-block rescale/state passes again —
# (1024, 1024) measured 132 TFLOP/s = 67% of bf16 peak at p16384 (vs 13.7
# TFLOP/s for the r3 kernel's (128, 128)); (2048, 2048) VMEM-OOMs.
# Non-dividing shapes fall back to the largest dividing power of two.
_BM_CAP = 1024
_BN_CAP = 1024


def _flash_update(s, mask, m_ref, l_ref, acc_ref, v, sl=None):
    """One online-softmax update on a (BM', BN) score tile in the exp2
    domain.  ``mask=None`` means fully visible (no where pass).  ``sl``
    restricts the update to rows [sl.start, ...) of the state refs."""
    idx = slice(None) if sl is None else sl
    sm = s if mask is None else jnp.where(mask, s, _NEG)
    m_prev = m_ref[idx, :1]
    m_new = jnp.maximum(
        jnp.maximum(m_prev, jnp.max(sm, axis=-1, keepdims=True)), -1e5
    )
    p = jnp.exp2(sm - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_ref[idx, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[idx, :] = acc_ref[idx, :] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[idx, :1] = m_new
    l_ref[idx, :1] = l_new


def _prefill_kernel(
    q_ref,    # VMEM (1, BM, D)
    k_ref,    # VMEM (1, BN, D)
    v_ref,    # VMEM (1, BN, D)
    o_ref,    # VMEM (1, BM, D)
    qs_ref,   # VMEM (BM, D) — scale-folded queries (pool dtype)
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
        s2 = scale * _LOG2E  # softmax scale + exp2 base folded into q
        qs_ref[...] = (
            q_ref[0].astype(jnp.float32) * s2).astype(qs_ref.dtype)

    # last/first query *token* in this q tile
    last_tok_q = (i * bm + bm - 1) // qpk
    first_tok_q = (i * bm) // qpk
    live = j * bn <= last_tok_q
    # kv block fully at/below the tile's first token: mask-free
    interior = j * bn + bn - 1 <= first_tok_q

    def scores():
        return jax.lax.dot_general(
            qs_ref[...], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BM, BN), already in the exp2 domain

    @pl.when(live & interior)
    def _compute_interior():
        _flash_update(scores(), None, m_ref, l_ref, acc_ref, v_ref[0])

    @pl.when(live & ~interior)
    def _compute_diag():
        tok_q = (jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
                 + i * bm) // qpk
        tok_k = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        _flash_update(scores(), tok_q >= tok_k, m_ref, l_ref, acc_ref,
                      v_ref[0])

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("scale", "qpk", "bm", "bn"))
def prefill_attention(
    qf: jnp.ndarray,  # (Hkv, N*qpk, D) folded queries
    kt: jnp.ndarray,  # (Hkv, N, D)
    vt: jnp.ndarray,  # (Hkv, N, D)
    *,
    scale: float,
    qpk: int,
    bm: int = 0,
    bn: int = 0,
) -> jnp.ndarray:
    Hkv, NQ, D = qf.shape
    N = kt.shape[1]
    BM = bm or _pick_block(NQ, _BM_CAP)
    BN = bn or _pick_block(N, _BN_CAP)
    assert NQ % BM == 0 and N % BN == 0, (NQ, N, BM, BN)
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
            pltpu.VMEM((BM, D), qf.dtype),
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
    qblk_lo_ref,   # SMEM (1, nqb): first kv token q-block i may attend
    qblk_seg_ref,  # SMEM (1, nqb): q-block's uniform segment id, or -1
    kblk_seg_ref,  # SMEM (1, nkb): kv-block's uniform segment id, or -1
    q_ref,         # VMEM (1, BM, D)
    k_ref,         # VMEM (1, BN, D)
    v_ref,         # VMEM (1, BN, D)
    segq_ref,      # VMEM (1, BM) int32 segment id per folded q row (pads -1)
    segk_ref,      # VMEM (1, BN) int32 segment id per kv token (pads -2)
    o_ref,         # VMEM (1, BM, D)
    qs_ref,        # VMEM (BM, D) scale-folded queries
    acc_ref,       # VMEM (BM, D) f32
    m_ref,         # VMEM (BM, 128) f32
    l_ref,         # VMEM (BM, 128) f32
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
    (B x L)^2/2.  Blocks where both tiles sit inside ONE shared segment and
    the causal diagonal does not cross take the mask-free interior path."""
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        s2 = scale * _LOG2E
        qs_ref[...] = (
            q_ref[0].astype(jnp.float32) * s2).astype(qs_ref.dtype)

    last_tok_q = (i * bm + bm - 1) // qpk
    first_tok_q = (i * bm) // qpk
    lo = qblk_lo_ref[0, i]
    live = (j * bn <= last_tok_q) & (j * bn + bn - 1 >= lo)
    qseg = qblk_seg_ref[0, i]
    interior = (
        (qseg >= 0)
        & (qseg == kblk_seg_ref[0, j])
        & (j * bn + bn - 1 <= first_tok_q)
    )

    def scores():
        return jax.lax.dot_general(
            qs_ref[...], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(live & interior)
    def _compute_interior():
        _flash_update(scores(), None, m_ref, l_ref, acc_ref, v_ref[0])

    @pl.when(live & ~interior)
    def _compute_masked():
        tok_q = (jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
                 + i * bm) // qpk
        tok_k = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1) + j * bn
        same_seg = segq_ref[0][:, None] == segk_ref[0][None, :]
        _flash_update(scores(), same_seg & (tok_q >= tok_k),
                      m_ref, l_ref, acc_ref, v_ref[0])

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("scale", "qpk", "bm", "bn"))
def ragged_prefill_attention(
    qf: jnp.ndarray,   # (Hkv, N*qpk, D) folded queries
    kt: jnp.ndarray,   # (Hkv, N, D)
    vt: jnp.ndarray,   # (Hkv, N, D)
    seg: jnp.ndarray,  # (N,) int32 prompt id per token, ascending; pads < 0
    *,
    scale: float,
    qpk: int,
    bm: int = 0,
    bn: int = 0,
) -> jnp.ndarray:
    Hkv, NQ, D = qf.shape
    N = kt.shape[1]
    BM = bm or _pick_block(NQ, _BM_CAP)
    BN = bn or _pick_block(N, _BN_CAP)
    assert NQ % BM == 0 and N % BN == 0, (NQ, N, BM, BN)
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

    def blk_uniform_seg(s, width):
        t = s.reshape(-1, width)
        u = t[:, 0]
        return jnp.where((t == u[:, None]).all(axis=1) & (u >= 0),
                         u, -1)[None, :].astype(jnp.int32)

    qblk_seg = blk_uniform_seg(seg_q[0], BM)
    kblk_seg = blk_uniform_seg(seg_k[0], BN)

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
            pl.BlockSpec((1, nqb), lambda h, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nkb), lambda h, i, j: (0, 0),
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
            pltpu.VMEM((BM, D), qf.dtype),
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
    )(qblk_lo, qblk_seg, kblk_seg, qf, kt, vt, seg_q, seg_k)
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

"""Paged DeFT-Flatten kernel for the int8 KV cache: DMA-gathers int8 KV
segments *and* their per-(token, head) fp32 scale segments from HBM,
dequantizing in VMEM.  int8 halves the attention's HBM KV traffic on top of
the flatten algorithm's tree-sharing savings.

Same token-major / all-heads-per-DMA / head-packed structure as
ops/paged_flatten_attn.py.  Dequantization is **lane-wise post-scaling**:
scales live head-major (L, Hkv, S) so each head's per-token scales arrive as
a lane vector, and since the zero-padded q isolates head h in QK^T,

    s_h = (q_h . k_raw) * ks_h[token]     (scale s columns after the matmul)
    o_h = (p_h * vs_h[token]) @ v_raw     (scale p columns before PV)

— exact, with no transposes, reshapes, or per-element scale expansion in the
hot loop (Mosaic rejects lane<->sublane shape casts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import (_NEG, _interpret, fold_q,
                                        head_pack, unfold_o)
from deft_tpu.ops.paged_flatten_attn import _LN2, _LOG2E


def _paged_q_kernel(
    li_ref, seg_src_ref, blk_lo_ref, blk_hi_ref,
    q_ref,                       # VMEM (Hkv, Rq, D)
    k_pool_ref, v_pool_ref,      # ANY (L, S, Hkv*D) int8
    ks_pool_ref, vs_pool_ref,    # ANY (L, Hkv, S) f32 head-major
    lo_ref, hi_ref,
    # outputs + scratch (unpacked below):
    #   partial=False: o_ref (Hkv, Rq, D)
    #   partial=True:  acc_out, m_out, l_out — (Hkv, Rq, D) f32
    #                  unnormalized flash state for the sp LSE merge
    *refs,
    scale, qpk, block_len, seg_len, num_blocks, num_kv_heads, head_dim,
    partial: bool = False,
    qwin: int = 0,
):
    if partial:
        acc_out, m_out, l_out = refs[:3]
        refs = refs[3:]
    else:
        o_ref = refs[0]
        refs = refs[1:]
    b = pl.program_id(0)
    li = li_ref[0]
    nseg = block_len // seg_len
    Hkv = num_kv_heads
    D = head_dim
    pack = head_pack(D, Hkv)
    gw = pack * D
    # VMEM-budget elisions — same scheme as paged_flatten_attn._paged_kernel
    # (m/l share one lane-packed buffer; pack==1 stages q in o_ref /
    # accumulates in acc_out): the spec-decode ts256 8B bucket (Rq=1024)
    # otherwise exceeds the 16 MB scoped-vmem limit.
    (kbuf, vbuf,                 # VMEM (2, BLOCK, Hkv*D) int8
     ksbuf, vsbuf,               # VMEM (2, Hkv, BLOCK) f32
     sem,                        # DMA sems (2, 4, nseg)
     ) = refs[:5]
    refs = refs[5:]
    if pack == 1 and not partial:
        qpad_ref = o_ref         # staged q (overwritten at finish)
    else:
        qpad_ref = refs[0]       # VMEM (Hkv, Rq, gw) lane-slotted queries
        refs = refs[1:]
    if partial and pack == 1:
        acc_ref = acc_out        # accumulate in place
    else:
        acc_ref = refs[0]        # VMEM (Hkv, Rq, gw) f32
        refs = refs[1:]
    (ml_ref,) = refs             # VMEM (Hkv, Rq, gw) f32: m@lane0, l@lane1

    def seg_copies(bb, slot):
        copies = []
        for j in range(nseg):
            src = pl.multiple_of(seg_src_ref[bb * nseg + j], seg_len)
            dst = pl.ds(j * seg_len, seg_len)
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, pl.ds(src, seg_len), :],
                kbuf.at[slot, dst, :], sem.at[slot, 0, j]))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, pl.ds(src, seg_len), :],
                vbuf.at[slot, dst, :], sem.at[slot, 1, j]))
            # all heads' scale rows for this segment in one 2-D copy
            copies.append(pltpu.make_async_copy(
                ks_pool_ref.at[li, :, pl.ds(src, seg_len)],
                ksbuf.at[slot, :, dst], sem.at[slot, 2, j]))
            copies.append(pltpu.make_async_copy(
                vs_pool_ref.at[li, :, pl.ds(src, seg_len)],
                vsbuf.at[slot, :, dst], sem.at[slot, 3, j]))
        return copies

    def live(bb):
        return blk_lo_ref[bb] < blk_hi_ref[bb]

    def issue(bb, slot):
        @pl.when(live(bb))
        def _():
            for c in seg_copies(bb, slot):
                c.start()

    @pl.when(b == 0)
    def _init():
        lane = jax.lax.broadcasted_iota(jnp.int32, ml_ref.shape, 2)
        ml_ref[...] = jnp.where(lane == 0, _NEG, 0.0)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        rq = q_ref.shape[1]
        s2 = scale * _LOG2E  # softmax scale + exp2 base folded into q
        for h in range(num_kv_heads):
            i = h % pack
            parts = []
            if i:
                parts.append(jnp.zeros((rq, i * D), qpad_ref.dtype))
            parts.append(
                (q_ref[h].astype(jnp.float32) * s2).astype(qpad_ref.dtype))
            if pack - 1 - i:
                parts.append(jnp.zeros((rq, (pack - 1 - i) * D),
                                       qpad_ref.dtype))
            qpad_ref[h] = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            )
        issue(0, 0)

    @pl.when(b + 1 < num_blocks)
    def _prefetch():
        issue(b + 1, (b + 1) % 2)

    rq = q_ref.shape[1]

    def update_heads(slot, r0, rw, masked=True):
        """Online-softmax update for q rows [r0, r0 + rw) — see
        paged_flatten_attn.update_heads for the exactness arguments of the
        narrow window (skipped rows' masked updates are identities) and
        the mask-free full-block path (masked=False; blk_lo = FULL_BLOCK_LO plan
        sentinel proves the mask all-true for live rows)."""
        rs = pl.ds(r0, rw)
        if masked:
            leaf = (jax.lax.broadcasted_iota(jnp.int32, (rw, block_len), 0)
                    + r0) // qpk
            mask = (lo_ref[...] <= leaf) & (leaf < hi_ref[...])
        for h in range(num_kv_heads):
            g = h // pack
            # int8 values up to 127 are EXACT in bf16 (8-bit mantissa), so
            # widening to the q dtype keeps single-pass MXU dots — the f32
            # dequant precision lives entirely in the lane-wise scales
            k2 = kbuf[slot, :, g * gw:(g + 1) * gw].astype(qpad_ref.dtype)
            ks_row = ksbuf[slot, h:h + 1, :]  # (1, BLOCK) lane vector
            s = jax.lax.dot_general(
                qpad_ref[h, rs, :], k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * ks_row
            sm = jnp.where(mask, s, _NEG) if masked else s
            m_prev = ml_ref[h, rs, :1]
            m_new = jnp.maximum(
                jnp.maximum(m_prev,
                            jnp.max(sm, axis=-1, keepdims=True)),
                -1e5,
            )
            p = jnp.exp2(sm - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = ml_ref[h, rs, 1:2] * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            v2 = vbuf[slot, :, g * gw:(g + 1) * gw].astype(qpad_ref.dtype)
            vs_row = vsbuf[slot, h:h + 1, :]
            acc_ref[h, rs, :] = acc_ref[h, rs, :] * alpha + jax.lax.dot_general(
                (p * vs_row).astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ml_ref[h, rs, :1] = m_new
            ml_ref[h, rs, 1:2] = l_new

    # narrow-q window + mask-free full blocks (blk_lo = FULL_BLOCK_LO plan
    # sentinel, threshold test — dp shifts make small negatives possible on
    # straddling blocks) — same fast-path structure as paged_flatten_attn.py
    is_full = blk_lo_ref[b] < -(1 << 20)

    @pl.when(live(b))
    def _compute():
        slot = b % 2
        for c in seg_copies(b, slot):
            c.wait()
        if qwin and qwin < rq:
            r0 = blk_lo_ref[b] * qpk
            r0 = jnp.clip((r0 // 8) * 8, 0, rq - qwin)  # sublane-aligned
            narrow = (blk_hi_ref[b] * qpk - r0 <= qwin) & ~is_full

            @pl.when(narrow)
            def _narrow():
                update_heads(slot, pl.multiple_of(r0, 8), qwin)

            @pl.when(~narrow & is_full)
            def _full_maskfree():
                update_heads(slot, 0, rq, masked=False)

            @pl.when(~narrow & ~is_full)
            def _full_masked():
                update_heads(slot, 0, rq)
        else:
            @pl.when(is_full)
            def _maskfree():
                update_heads(slot, 0, rq, masked=False)

            @pl.when(~is_full)
            def _masked():
                update_heads(slot, 0, rq)

    @pl.when(b == num_blocks - 1)
    def _finish():
        rq = q_ref.shape[1]
        for h in range(num_kv_heads):
            i = h % pack
            if partial:
                # lanes 0/1 of ml are live; broadcast at finish, m back to
                # the natural-log domain the sp merge uses
                if acc_ref is not acc_out:
                    acc_out[h] = acc_ref[h, :, i * D:(i + 1) * D]
                m_out[h] = jnp.broadcast_to(ml_ref[h, :, :1] * _LN2, (rq, D))
                l_out[h] = jnp.broadcast_to(ml_ref[h, :, 1:2], (rq, D))
            else:
                l = ml_ref[h, :, 1:2]
                o_ref[h] = (
                    acc_ref[h, :, i * D:(i + 1) * D]
                    / jnp.where(l == 0.0, 1.0, l)
                ).astype(o_ref.dtype)


def _paged_q_call(qf, k_pool, v_pool, k_scale, v_scale, li, seg_src,
                  tok_lo, tok_hi, blk_lo, blk_hi,
                  *, scale, qpk, block_len, seg_len, partial, qwin=-1):
    Hkv, Rq, D = qf.shape
    assert 128 % D == 0
    gw = head_pack(D, Hkv) * D
    T = tok_lo.shape[0]
    nb = T // block_len
    assert nb * block_len == T, (T, block_len)
    if qwin < 0:
        qwin = max(16, 8 * qpk)  # same auto policy as the bf16 kernel
    qwin = min(qwin, Rq)
    kernel = functools.partial(
        _paged_q_kernel, scale=scale, qpk=qpk,
        block_len=block_len, seg_len=seg_len, num_blocks=nb,
        num_kv_heads=Hkv, head_dim=D, partial=partial, qwin=qwin,
    )
    out_spec = pl.BlockSpec((Hkv, Rq, D), lambda b, *_: (0, 0, 0))
    fstate = jax.ShapeDtypeStruct((Hkv, Rq, D), jnp.float32)
    pack = head_pack(D, Hkv)
    # conditional scratch — see _paged_q_kernel's VMEM-budget elisions
    scratch = [
        pltpu.VMEM((2, block_len, Hkv * D), k_pool.dtype),
        pltpu.VMEM((2, block_len, Hkv * D), v_pool.dtype),
        pltpu.VMEM((2, Hkv, block_len), jnp.float32),
        pltpu.VMEM((2, Hkv, block_len), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4, block_len // seg_len)),
    ]
    if not (pack == 1 and not partial):
        scratch.append(pltpu.VMEM((Hkv, Rq, gw), qf.dtype))
    if not (partial and pack == 1):
        scratch.append(pltpu.VMEM((Hkv, Rq, gw), jnp.float32))
    scratch.append(pltpu.VMEM((Hkv, Rq, gw), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Hkv, Rq, D), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
            pl.BlockSpec((1, block_len), lambda b, *_: (0, b)),
        ],
        out_specs=(out_spec, out_spec, out_spec) if partial else out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(fstate, fstate, fstate) if partial
        else jax.ShapeDtypeStruct((Hkv, Rq, D), qf.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hkv * Rq * T * 128,
            bytes_accessed=Hkv * T * (2 * D + 8),
            transcendentals=Hkv * Rq * T,
        ),
    )(
        li.reshape(1).astype(jnp.int32), seg_src, blk_lo, blk_hi,
        qf, k_pool, v_pool, k_scale, v_scale,
        tok_lo.reshape(1, T), tok_hi.reshape(1, T),
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "qpk", "block_len", "seg_len", "qwin")
)
def paged_flatten_attention_q(
    qf, k_pool, v_pool, k_scale, v_scale, li, seg_src,
    tok_lo, tok_hi, blk_lo, blk_hi,
    *, scale, qpk, block_len, seg_len, qwin=-1,
):
    return _paged_q_call(
        qf, k_pool, v_pool, k_scale, v_scale, li, seg_src,
        tok_lo, tok_hi, blk_lo, blk_hi,
        scale=scale, qpk=qpk, block_len=block_len, seg_len=seg_len,
        partial=False, qwin=qwin,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "qpk", "block_len", "seg_len", "qwin")
)
def paged_flatten_attention_q_partial(
    qf, k_pool, v_pool, k_scale, v_scale, li, seg_src,
    tok_lo, tok_hi, blk_lo, blk_hi,
    *, scale, qpk, block_len, seg_len, qwin=-1,
):
    """Per-chip int8-KV pass over a LOCAL sp-span of blocks, returning
    unnormalized (acc, m, l) for the cross-chip LSE merge — the quantized
    counterpart of paged_flatten_attention_partial, so int8-KV decoding
    keeps in-kernel paged reads under a mesh too."""
    return _paged_q_call(
        qf, k_pool, v_pool, k_scale, v_scale, li, seg_src,
        tok_lo, tok_hi, blk_lo, blk_hi,
        scale=scale, qpk=qpk, block_len=block_len, seg_len=seg_len,
        partial=True, qwin=qwin,
    )


def paged_flatten_attn_q_pallas(q, k_new, v_new, k_pool, v_pool, li, batch,
                                scale):
    """AttnFn entry for int8 pools with seg tables."""
    R, Hq, D = q.shape
    assert k_pool.quantized
    Hkv = k_pool.data.shape[-1] // D
    T = int(batch.tok_lo.shape[0])
    B = int(batch.blk_lo.shape[0])
    block_len = T // B
    nseg = int(batch.seg_src.shape[0]) // B
    qf = fold_q(q, Hkv)
    qpk = Hq // Hkv
    kw = dict(scale=scale, qpk=qpk, block_len=block_len,
              seg_len=block_len // nseg)
    from deft_tpu.ops.paged_flatten_attn import q_split_chunks

    chunks = list(q_split_chunks(batch, qf.shape[1], qpk))
    if chunks:
        # DEFT_MAX_RQ big-Rq compile workaround — see q_split_chunks
        o = jnp.concatenate([
            paged_flatten_attention_q(
                qf[:, r0:r0 + rows, :], k_pool.data, v_pool.data,
                k_pool.scale, v_pool.scale, li, batch.seg_src,
                lo_c, hi_c, blo, bhi, **kw)
            for r0, rows, lo_c, hi_c, blo, bhi in chunks
        ], axis=1)
        return unfold_o(o, R)
    o = paged_flatten_attention_q(
        qf, k_pool.data, v_pool.data, k_pool.scale, v_pool.scale,
        li, batch.seg_src, batch.tok_lo, batch.tok_hi,
        batch.blk_lo, batch.blk_hi, **kw,
    )
    return unfold_o(o, R)

"""Sequential per-leaf decode attention with in-kernel paged KV reads — the
FAIR Flash-Decoding / Radix baseline.

Parity surface: /root/reference/DeFT/deft/layers/attention/
token_attention.py:80-150 — the reference's seq baseline gathers per-token KV
*inside* the Triton kernel through the Req_to_tokens page table.  The
XLA-gather fallback (ops/seq_attn.py) first materializes a padded dense
(R, C, Hkv, D) copy of every leaf's path, costing ~3x the true baseline KV IO
— benchmarking DeFT-Flatten against that would inflate the speedup.  This
kernel reads the paged pools directly:

- Per-leaf DMA segment tables (plan/seq.py): a leaf's root-to-leaf path is a
  short list of pool-contiguous runs (chunked allocator, TokenKVPool); each
  run padded to ``seg_len`` makes every seg_len-token span of the padded
  path ONE contiguous HBM read.  A segment's live tokens are the span
  [seg_off, seg_off + seg_live) inside it (unaligned runs are covered by
  their enclosing ALIGNED segment with the lead-in masked).
- Grid (R leaves, path blocks); flash state per KV head in VMEM scratch
  carries across a leaf's blocks; double-buffered DMAs overlap the next
  block's reads with compute.
- Head packing for head_dim < 128 as in ops/paged_flatten_attn.py.

The per-leaf path re-read (a shared prefix fetched once per leaf) is the
baseline's defining cost and is deliberately kept — that is what DeFT's
KV-guided grouping eliminates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deft_tpu.ops.flatten_attn import _NEG, _interpret, head_pack
from deft_tpu.ops.paged_flatten_attn import _LN2, _LOG2E


def _paged_seq_kernel(
    # scalar prefetch
    li_ref,        # (1,) layer index
    seg_src_ref,   # (R * nb * spb,) ALIGNED pool address of each segment
    seg_off_ref,   # (R * nb * spb,) live span's leading offset in-segment
    seg_live_ref,  # (R * nb * spb,) live tokens in each segment
    blk_live_ref,  # (R * nb,)
    # inputs
    q_ref,         # VMEM (1, Hkv, qpk, D)
    k_pool_ref,    # ANY  (L, S, Hkv*D)
    v_pool_ref,    # ANY  (L, S, Hkv*D)
    # quantized=True adds ks_pool_ref / vs_pool_ref — ANY (L, Hkv, S) f32
    # head-major per-(token, head) scales (same layout as ops/paged_quant)
    # outputs + scratch (unpacked below):
    #   partial=False: o_ref (1, Hkv, qpk, D)
    #   partial=True:  acc_out, m_out, l_out — (1, Hkv, qpk, D) f32
    #                  unnormalized flash state for the sp LSE merge
    *refs,
    scale: float,
    block_len: int,
    seg_len: int,
    num_blocks: int,
    num_leaves: int,
    num_kv_heads: int,
    head_dim: int,
    partial: bool = False,
    quantized: bool = False,
):
    if quantized:
        ks_pool_ref, vs_pool_ref = refs[:2]
        refs = refs[2:]
    if partial:
        acc_out, m_out, l_out = refs[:3]
        refs = refs[3:]
    else:
        o_ref = refs[0]
        refs = refs[1:]
    if quantized:
        ksbuf, vsbuf = refs[:2]  # VMEM (2, Hkv, BLOCK) f32
        refs = refs[2:]
    (kbuf,       # VMEM (2, BLOCK, Hkv*D)
     vbuf,       # VMEM (2, BLOCK, Hkv*D)
     sem,        # DMA sems (2, 2 or 4, spb)
     qpad_ref,   # VMEM (Hkv, qpk, gw) lane-slotted queries
     acc_ref,    # VMEM (Hkv, qpk, gw) f32
     m_ref,      # VMEM (Hkv, qpk, gw) f32
     l_ref,      # VMEM (Hkv, qpk, gw) f32
     ) = refs
    r = pl.program_id(0)
    b = pl.program_id(1)
    li = li_ref[0]
    spb = block_len // seg_len
    D = head_dim
    # heads per lane group (largest divisor of num_kv_heads fitting 128
    # lanes — see flatten_attn.head_pack)
    pack = head_pack(D, num_kv_heads)
    gw = pack * D
    nb = num_blocks

    def seg_copies(linear, slot):
        copies = []
        for j in range(spb):
            # sources are seg-aligned by the plan builder (Mosaic DMA row
            # offsets must respect sublane tiling); unaligned runs arrive
            # as an aligned cover with seg_off marking the live span
            src = pl.multiple_of(seg_src_ref[linear * spb + j], seg_len)
            dst = pl.ds(j * seg_len, seg_len)
            copies.append(pltpu.make_async_copy(
                k_pool_ref.at[li, pl.ds(src, seg_len), :],
                kbuf.at[slot, dst, :],
                sem.at[slot, 0, j],
            ))
            copies.append(pltpu.make_async_copy(
                v_pool_ref.at[li, pl.ds(src, seg_len), :],
                vbuf.at[slot, dst, :],
                sem.at[slot, 1, j],
            ))
            if quantized:
                # every head's scale row for the segment in one 2-D copy
                copies.append(pltpu.make_async_copy(
                    ks_pool_ref.at[li, :, pl.ds(src, seg_len)],
                    ksbuf.at[slot, :, dst],
                    sem.at[slot, 2, j],
                ))
                copies.append(pltpu.make_async_copy(
                    vs_pool_ref.at[li, :, pl.ds(src, seg_len)],
                    vsbuf.at[slot, :, dst],
                    sem.at[slot, 3, j],
                ))
        return copies

    def issue(linear, slot):
        @pl.when(blk_live_ref[linear] > 0)
        def _():
            for c in seg_copies(linear, slot):
                c.start()

    linear = r * nb + b

    @pl.when(b == 0)
    def _init_leaf():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        s2 = scale * _LOG2E  # softmax scale + exp2 base folded into q
        for h in range(num_kv_heads):
            i = h % pack
            parts = []
            if i:
                parts.append(jnp.zeros((qpad_ref.shape[1], i * D),
                                       qpad_ref.dtype))
            parts.append(
                (q_ref[0, h].astype(jnp.float32) * s2).astype(qpad_ref.dtype))
            if pack - 1 - i:
                parts.append(jnp.zeros(
                    (qpad_ref.shape[1], (pack - 1 - i) * D), qpad_ref.dtype
                ))
            qpad_ref[h] = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            )

    @pl.when(linear == 0)
    def _first():
        issue(0, 0)

    @pl.when(linear + 1 < num_leaves * nb)
    def _prefetch():
        issue(linear + 1, (linear + 1) % 2)

    @pl.when(blk_live_ref[linear] > 0)
    def _compute():
        slot = linear % 2
        for c in seg_copies(linear, slot):
            c.wait()
        qpk = qpad_ref.shape[1]
        # per-token live mask: each segment's live span is
        # [seg_off, seg_off + seg_live) within the segment
        tok = jax.lax.broadcasted_iota(jnp.int32, (qpk, block_len), 1)
        mask = jnp.zeros((qpk, block_len), jnp.bool_)
        for j in range(spb):
            off = seg_off_ref[linear * spb + j]
            cnt = seg_live_ref[linear * spb + j]
            lo = j * seg_len + off
            mask = mask | ((tok >= lo) & (tok < lo + cnt))
        for h in range(num_kv_heads):
            g = h // pack
            k2 = kbuf[slot, :, g * gw:(g + 1) * gw]
            if quantized:
                # int8 values are exact in bf16; widening to the q dtype
                # keeps single-pass MXU dots (f32 dequant precision lives
                # in the lane-wise scales)
                k2 = k2.astype(qpad_ref.dtype)
            s = jax.lax.dot_general(
                qpad_ref[h], k2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                # lane-wise dequant: per-token K scales column-scale the
                # scores (zero-padded q isolates head h in the dot)
                s = s * ksbuf[slot, h:h + 1, :]
            sm = jnp.where(mask, s, _NEG)
            m_prev = m_ref[h, :, :1]
            m_new = jnp.maximum(
                jnp.maximum(m_prev,
                            jnp.max(sm, axis=-1, keepdims=True)),
                -1e5,
            )
            p = jnp.exp2(sm - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = l_ref[h, :, :1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True
            )
            v2 = vbuf[slot, :, g * gw:(g + 1) * gw]
            if quantized:
                # scale p by the per-token V scales (f32), then both PV
                # operands drop to the q dtype for a single MXU pass
                p = p * vsbuf[slot, h:h + 1, :]
                v2 = v2.astype(qpad_ref.dtype)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[h, :, :1] = m_new
            l_ref[h, :, :1] = l_new

    @pl.when(b == nb - 1)
    def _finish():
        qpk = qpad_ref.shape[1]
        for h in range(num_kv_heads):
            i = h % pack
            if partial:
                # lane 0 of m/l is live; broadcast at finish, m back to the
                # natural-log domain the sp merge uses
                acc_out[0, h] = acc_ref[h, :, i * D:(i + 1) * D]
                m_out[0, h] = jnp.broadcast_to(
                    m_ref[h, :, :1] * _LN2, (qpk, D))
                l_out[0, h] = jnp.broadcast_to(l_ref[h, :, :1], (qpk, D))
            else:
                l = l_ref[h, :, :1]
                o_ref[0, h] = (
                    acc_ref[h, :, i * D:(i + 1) * D]
                    / jnp.where(l == 0.0, 1.0, l)
                ).astype(o_ref.dtype)


def _paged_seq_call(qr, k_pool, v_pool, li, seg_src, seg_off, seg_live,
                    blk_live, *, scale, block_len, seg_len, partial,
                    k_scale=None, v_scale=None):
    R, Hkv, qpk, D = qr.shape
    assert 128 % D == 0, "head packing requires head_dim dividing 128"
    nb = int(blk_live.shape[0]) // R
    assert nb * R == int(blk_live.shape[0])
    spb = block_len // seg_len
    assert seg_src.shape == (R * nb * spb,), (seg_src.shape, R, nb, spb)
    quantized = k_scale is not None

    gw = head_pack(D, Hkv) * D
    kernel = functools.partial(
        _paged_seq_kernel,
        scale=scale,
        block_len=block_len,
        seg_len=seg_len,
        num_blocks=nb,
        num_leaves=R,
        num_kv_heads=Hkv,
        head_dim=D,
        partial=partial,
        quantized=quantized,
    )
    out_spec = pl.BlockSpec((1, Hkv, qpk, D), lambda r, b, *_: (r, 0, 0, 0))
    fstate = jax.ShapeDtypeStruct((R, Hkv, qpk, D), jnp.float32)
    in_specs = [
        pl.BlockSpec((1, Hkv, qpk, D), lambda r, b, *_: (r, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [qr, k_pool, v_pool]
    scratch = [
        pltpu.VMEM((2, block_len, Hkv * D), k_pool.dtype),
        pltpu.VMEM((2, block_len, Hkv * D), v_pool.dtype),
        pltpu.SemaphoreType.DMA((2, 4 if quantized else 2, spb)),
        pltpu.VMEM((Hkv, qpk, gw), qr.dtype),
        pltpu.VMEM((Hkv, qpk, gw), jnp.float32),
        pltpu.VMEM((Hkv, qpk, gw), jnp.float32),
        pltpu.VMEM((Hkv, qpk, gw), jnp.float32),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        operands += [k_scale, v_scale]
        # scale buffers lead the scratch list (kernel unpack order)
        scratch = [
            pltpu.VMEM((2, Hkv, block_len), jnp.float32),
            pltpu.VMEM((2, Hkv, block_len), jnp.float32),
        ] + scratch
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(R, nb),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec) if partial else out_spec,
        scratch_shapes=scratch,
    )
    kv_bytes = D * k_pool.dtype.itemsize + (4 if quantized else 0)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(fstate, fstate, fstate) if partial
        else jax.ShapeDtypeStruct((R, Hkv, qpk, D), qr.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * R * Hkv * qpk * nb * block_len * 128,
            bytes_accessed=2 * R * nb * block_len * Hkv * kv_bytes,
            transcendentals=R * Hkv * qpk * nb * block_len,
        ),
    )(
        li.reshape(1).astype(jnp.int32),
        seg_src,
        seg_off,
        seg_live,
        blk_live,
        *operands,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_len", "seg_len")
)
def paged_seq_attention(
    qr: jnp.ndarray,       # (R, Hkv, qpk, D)
    k_pool: jnp.ndarray,   # (L, S, Hkv*D)
    v_pool: jnp.ndarray,   # (L, S, Hkv*D)
    li: jnp.ndarray,       # () int32
    seg_src: jnp.ndarray,  # (R * nb * spb,) int32 (seg-aligned)
    seg_off: jnp.ndarray,  # (R * nb * spb,) int32
    seg_live: jnp.ndarray,  # (R * nb * spb,) int32
    blk_live: jnp.ndarray,  # (R * nb,) int32
    *,
    scale: float,
    block_len: int,
    seg_len: int,
) -> jnp.ndarray:
    return _paged_seq_call(
        qr, k_pool, v_pool, li, seg_src, seg_off, seg_live, blk_live,
        scale=scale, block_len=block_len, seg_len=seg_len, partial=False,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_len", "seg_len")
)
def paged_seq_attention_partial(
    qr, k_pool, v_pool, li, seg_src, seg_off, seg_live, blk_live,
    *, scale, block_len, seg_len,
):
    """Per-chip pass over a LOCAL span of each leaf's path blocks, returning
    unnormalized (acc, m, l) — each (R, Hkv, qpk, D) f32 — for the sp-axis
    LSE merge (parallel/seq_engine.py).  Keeps the baseline fair under a
    mesh: every chip still reads its KV span in-kernel from the paged pool
    (reference semantics token_attention.py:80-150), no XLA gather."""
    return _paged_seq_call(
        qr, k_pool, v_pool, li, seg_src, seg_off, seg_live, blk_live,
        scale=scale, block_len=block_len, seg_len=seg_len, partial=True,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_len", "seg_len")
)
def paged_seq_attention_q(
    qr, k_pool, v_pool, k_scale, v_scale, li,
    seg_src, seg_off, seg_live, blk_live,
    *, scale, block_len, seg_len,
):
    """int8-KV paged seq baseline: DMAs int8 KV segments AND their
    head-major per-(token, head) fp32 scale rows, dequantizing lane-wise in
    VMEM (same scheme as ops/paged_quant.py) — the baseline keeps its
    in-kernel paged reads at half the KV HBM traffic, so int8-KV
    flatten-vs-seq comparisons stay fair."""
    return _paged_seq_call(
        qr, k_pool, v_pool, li, seg_src, seg_off, seg_live, blk_live,
        scale=scale, block_len=block_len, seg_len=seg_len, partial=False,
        k_scale=k_scale, v_scale=v_scale,
    )


@functools.partial(
    jax.jit, static_argnames=("scale", "block_len", "seg_len")
)
def paged_seq_attention_q_partial(
    qr, k_pool, v_pool, k_scale, v_scale, li,
    seg_src, seg_off, seg_live, blk_live,
    *, scale, block_len, seg_len,
):
    """int8-KV per-chip partial pass (sp LSE merge): the quantized seq
    baseline stays in-kernel-paged under a mesh."""
    return _paged_seq_call(
        qr, k_pool, v_pool, li, seg_src, seg_off, seg_live, blk_live,
        scale=scale, block_len=block_len, seg_len=seg_len, partial=True,
        k_scale=k_scale, v_scale=v_scale,
    )


def paged_seq_attn_pallas(q, k_new, v_new, k_pool, v_pool, li, batch, scale,
                          *, block_len: int, seg_len: int):
    """AttnFn entry for the paged seq baseline (runner binds the static
    block/seg lengths from the plan's jit-key sizes)."""
    R, Hq, D = q.shape
    assert not k_pool.quantized, \
        "int8 pools route through paged_seq_attn_q_pallas"
    k_pool, v_pool = k_pool.data, v_pool.data
    Hkv = k_pool.shape[-1] // D
    qpk = Hq // Hkv
    o = paged_seq_attention(
        q.reshape(R, Hkv, qpk, D),
        k_pool,
        v_pool,
        li,
        batch.seg_src,
        batch.seg_off,
        batch.seg_live,
        batch.blk_live,
        scale=scale,
        block_len=block_len,
        seg_len=seg_len,
    )
    return o.reshape(R, Hq, D)


def paged_seq_attn_q_pallas(q, k_new, v_new, k_pool, v_pool, li, batch,
                            scale, *, block_len: int, seg_len: int):
    """AttnFn entry for the int8-KV paged seq baseline."""
    R, Hq, D = q.shape
    assert k_pool.quantized
    Hkv = k_pool.data.shape[-1] // D
    qpk = Hq // Hkv
    o = paged_seq_attention_q(
        q.reshape(R, Hkv, qpk, D),
        k_pool.data, v_pool.data, k_pool.scale, v_pool.scale,
        li,
        batch.seg_src,
        batch.seg_off,
        batch.seg_live,
        batch.blk_live,
        scale=scale,
        block_len=block_len,
        seg_len=seg_len,
    )
    return o.reshape(R, Hq, D)

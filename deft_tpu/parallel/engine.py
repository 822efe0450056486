"""Mesh-sharded attention impls for the decode/prefill steps.

This is what makes the multi-chip path an *engine* rather than a standalone
op: ``ModelRunner(mesh=...)`` swaps these AttnFns into the same jitted steps
``tree_generate`` already drives, so generation code is unchanged while

- the model matmuls partition under GSPMD (Megatron tp specs,
  parallel/sharding.py),
- tree attention runs the Pallas flatten kernel **per chip** under
  ``shard_map`` with (dp, sp, tp) specs, and
- the cross-chip softmax is recovered with the LSE merge over the
  sequence-parallel axis — DeFT's two-stage reduction
  (/root/reference/DeFT/deft/layers/attention/tree_attention.py:296-548)
  generalized to XLA collectives over ICI (SURVEY.md §2.6, §5).

Sharding contract per decode step:

- ``tp`` shards heads: queries on Hq, KV pool rows on the head-flattened
  Hkv*D axis.  Attention is embarrassingly parallel here (the reference
  kernel's grid axis 0); tp alignment is exact because tp | Hkv and GQA
  groups are head-major.
- ``sp`` shards the DFS-flattened tree-KV token axis (whole 128-token
  blocks).  Each chip gathers only its own KV span from the pool — global
  KV IO stays exactly-once — and computes partial (acc, m, l); pmax/psum
  merge.
- ``dp`` shards query rows (decoding branches).  Leaf intervals are global
  leaf indices, so each shard shifts [tok_lo, tok_hi) by its row offset
  before the range-mask kernel.

When the plan is segment-aligned (``batch.seg_src``), each chip runs the
**in-kernel DMA paged kernel** over its own sp-span of blocks
(ops/paged_flatten_attn.paged_flatten_attention_partial): seg_src rows are
block-major, so sharding the table over sp hands every chip exactly its
blocks' pool addresses and the flagship exactly-once KV IO property holds
across the mesh — no XLA gather materialization on any chip (VERDICT r2
item 1; reference counterpart tree_attention.py:859-976).  Plans that fell
back to tight packing use the XLA gather + partial kernel
(ops/sharded_flatten.py) per chip instead.  Under dp>1 the per-chip block
skip drops blocks outside the chip's leaf window before any DMA is issued;
blocks spanning two dp shards are read once per shard (inherent to
query-axis replication of KV — dp=1 on single-tree meshes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deft_tpu.ops.flatten_attn import fold_q, unfold_o


def _axis(mesh: Mesh, name: str) -> int:
    return mesh.shape.get(name, 1)


def _pad_to(x, n, value=0):
    if x.shape[0] == n:
        return x
    return jnp.pad(x, (0, n - x.shape[0]), constant_values=value)


def _lse_merge(acc, m, l, dtype):
    """Cross-chip softmax recovery over the sp axis from per-shard
    unnormalized flash state (acc (Hkv, Rq, D), m/l lane-broadcast)."""
    m = m[..., :1]
    l = l[..., :1]
    m_g = jax.lax.pmax(m, "sp")
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, "sp")
    acc_g = jax.lax.psum(acc * corr, "sp")
    o = acc_g / jnp.where(l_g == 0.0, 1.0, l_g)
    return o.astype(dtype)


def make_sharded_tree_attn(mesh: Mesh, paged: bool = False):
    """AttnFn for the flatten-family modes on a (dp, sp, tp) mesh.

    Per shard: run the flatten kernel's partial pass over the chip's own
    sp-span of blocks, LSE-merge over sp.  ``paged=True`` (segment-aligned
    plans) uses the in-kernel DMA paged kernel per chip — exactly-once KV
    IO across the mesh; otherwise the chip gathers its local KV span via
    XLA and runs the gather-path partial kernel.  Matches
    attn_impls.flatten_attn_xla semantics exactly (tests/test_multichip.py).
    """
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention_partial
    from deft_tpu.ops.sharded_flatten import flatten_attention_partial

    dp, sp, tp = _axis(mesh, "dp"), _axis(mesh, "sp"), _axis(mesh, "tp")

    def attn(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
        del k_new, v_new  # already scattered into the pools
        R, Hq, D = q.shape
        Hkv = k_pool.data.shape[-1] // D
        qpk = Hq // Hkv
        T = batch.tok_lo.shape[0]
        B = batch.blk_lo.shape[0]
        block_len = T // B

        # Pad rows to a dp multiple and blocks to an sp multiple; pads carry
        # empty leaf intervals so the kernel masks them out.
        R_pad = -(-R // dp) * dp
        B_pad = -(-B // sp) * sp
        T_pad = B_pad * block_len
        qp = jnp.pad(q, ((0, R_pad - R), (0, 0), (0, 0))) if R_pad != R else q
        tok_lo = _pad_to(batch.tok_lo, T_pad, 2**30)
        tok_hi = _pad_to(batch.tok_hi, T_pad, 0)
        blk_lo = _pad_to(batch.blk_lo, B_pad, 2**30)
        blk_hi = _pad_to(batch.blk_hi, B_pad, 0)
        leaves_per_shard = R_pad // dp

        def shift_window(r0, blo, bhi):
            """Shift block/token leaf intervals into the dp shard's local
            leaf range, marking blocks outside the window empty so the
            kernel skips them BEFORE issuing any DMA."""
            blo = blo - r0
            bhi = bhi - r0
            live = (blo < leaves_per_shard) & (bhi > 0)
            return (jnp.where(live, blo, 2**30), jnp.where(live, bhi, 0))

        if paged:
            nseg = batch.seg_src.shape[0] // B
            seg_len = block_len // nseg
            seg_src = _pad_to(batch.seg_src, B_pad * nseg)
            quantized = k_pool.quantized

            def per_shard(q_l, kd_l, vd_l, li, seg_l, lo_l, hi_l,
                          blo_l, bhi_l, *scales):
                # q_l (R/dp, Hq/tp, D); pools (L, S, (Hkv/tp)*D); the seg
                # table and token/block metadata local to this sp span.
                Hkv_l = kd_l.shape[-1] // D
                r0 = jax.lax.axis_index("dp") * leaves_per_shard
                blo, bhi = shift_window(r0, blo_l, bhi_l)
                if quantized:
                    from deft_tpu.ops.paged_quant import (
                        paged_flatten_attention_q_partial)

                    acc, m, l = paged_flatten_attention_q_partial(
                        fold_q(q_l, Hkv_l), kd_l, vd_l, scales[0], scales[1],
                        li, seg_l, lo_l - r0, hi_l - r0, blo, bhi,
                        scale=scale, qpk=qpk, block_len=block_len,
                        seg_len=seg_len,
                    )
                else:
                    acc, m, l = paged_flatten_attention_partial(
                        fold_q(q_l, Hkv_l), kd_l, vd_l, li, seg_l,
                        lo_l - r0, hi_l - r0, blo, bhi,
                        scale=scale, qpk=qpk, block_len=block_len,
                        seg_len=seg_len,
                    )
                return _lse_merge(acc, m, l, q_l.dtype)

            in_specs = [
                P("dp", "tp", None),      # q
                P(None, None, "tp"),      # k pool data
                P(None, None, "tp"),      # v pool data
                P(),                      # layer index
                P("sp"),                  # seg_src (block-major)
                P("sp"), P("sp"),         # tok_lo, tok_hi
                P("sp"), P("sp"),         # blk_lo, blk_hi
            ]
            operands = [qp, k_pool.data, v_pool.data, li, seg_src,
                        tok_lo, tok_hi, blk_lo, blk_hi]
            if quantized:
                # head-major (L, Hkv, S) scale pools shard on their head axis
                in_specs += [P(None, "tp", None), P(None, "tp", None)]
                operands += [k_pool.scale, v_pool.scale]
            of = jax.shard_map(
                per_shard,
                mesh=mesh,
                check_vma=False,  # pallas outputs carry no vma annotation
                in_specs=tuple(in_specs),
                out_specs=P("tp", "dp", None),
            )(*operands)
            o = unfold_o(of, R_pad)
            return o[:R] if R_pad != R else o

        kv_idx = _pad_to(batch.kv_idx, T_pad)

        def per_shard(q_l, kd_l, vd_l, li, kv_idx_l, lo_l, hi_l, blo_l, bhi_l):
            # q_l (R/dp, Hq/tp, D); kd_l (L, S, (Hkv/tp)*D); token/block
            # metadata local to this sp span.
            Hkv_l = kd_l.shape[-1] // D
            r0 = jax.lax.axis_index("dp") * leaves_per_shard
            kt = jnp.moveaxis(
                kd_l[li][kv_idx_l].reshape(-1, Hkv_l, D), 1, 0
            ).astype(q_l.dtype)
            vt = jnp.moveaxis(
                vd_l[li][kv_idx_l].reshape(-1, Hkv_l, D), 1, 0
            ).astype(q_l.dtype)
            blo, bhi = shift_window(r0, blo_l, bhi_l)
            acc, m, l = flatten_attention_partial(
                fold_q(q_l, Hkv_l), kt, vt,
                lo_l - r0, hi_l - r0, blo, bhi,
                scale=scale, qpk=qpk, block_len=block_len,
            )
            return _lse_merge(acc, m, l, q_l.dtype)

        of = jax.shard_map(
            per_shard,
            mesh=mesh,
            check_vma=False,  # pallas_call outputs carry no vma annotation
            in_specs=(
                P("dp", "tp", None),      # q
                P(None, None, "tp"),      # k pool data
                P(None, None, "tp"),      # v pool data
                P(),                      # layer index
                P("sp"), P("sp"), P("sp"),  # kv_idx, tok_lo, tok_hi
                P("sp"), P("sp"),           # blk_lo, blk_hi
            ),
            out_specs=P("tp", "dp", None),
        )(qp, k_pool.data, v_pool.data, li, kv_idx, tok_lo, tok_hi,
          blk_lo, blk_hi)
        o = unfold_o(of, R_pad)
        return o[:R] if R_pad != R else o

    return attn


def make_sharded_prefill_attn(mesh: Mesh):
    """AttnFn for prefill: the causal Pallas FA kernel per chip over its tp
    head shard (no collectives — heads are independent)."""
    from deft_tpu.ops.prefill import prefill_attention

    def attn(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
        del k_pool, v_pool, li, batch
        N, Hq, D = q.shape
        Hkv = k_new.shape[1]
        qpk = Hq // Hkv
        qf = fold_q(q, Hkv)
        kt = jnp.swapaxes(k_new, 0, 1)
        vt = jnp.swapaxes(v_new, 0, 1)

        def per_shard(qf_l, kt_l, vt_l):
            return prefill_attention(qf_l, kt_l, vt_l, scale=scale, qpk=qpk)

        of = jax.shard_map(
            per_shard,
            mesh=mesh,
            check_vma=False,
            in_specs=(P("tp", None, None),) * 3,
            out_specs=P("tp", None, None),
        )(qf, kt, vt)
        return unfold_o(of, N)

    return attn


def replicate(mesh: Mesh, x):
    """Host/single-device array -> replicated on every mesh device (step
    inputs must live on the mesh or jit rejects the device mix)."""
    from jax.sharding import NamedSharding

    return jax.device_put(x, NamedSharding(mesh, P()))

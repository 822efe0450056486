"""Mesh-sharded sequential (per-leaf) baseline attention.

The fair flatten-vs-seq comparison must hold under a mesh too (VERDICT r2
item 6): each chip runs the in-kernel paged seq kernel
(ops/paged_seq_attn.paged_seq_attention_partial) over its OWN sp-span of
every leaf's path blocks — per-leaf DMA segment tables reshaped
(R, nb, spb) shard block-major over sp, leaves over dp, heads over tp —
and the global softmax is recovered with the same LSE merge the flatten
path uses.  No chip materializes a gathered KV copy, so the baseline's
defining per-leaf path re-read cost (reference token_attention.py:80-150)
is measured honestly per chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _axis(mesh: Mesh, name: str) -> int:
    return mesh.shape.get(name, 1)


def make_sharded_seq_attn(mesh: Mesh):
    """AttnFn for the paged seq baseline on a (dp, sp, tp) mesh.  The runner
    binds the plan's static tile sizes (block_len, seg_len) exactly as on
    the single-chip path."""
    from deft_tpu.ops.paged_seq_attn import paged_seq_attention_partial

    dp, sp = _axis(mesh, "dp"), _axis(mesh, "sp")

    def attn(q, k_new, v_new, k_pool, v_pool, li, batch, scale,
             *, block_len: int, seg_len: int):
        del k_new, v_new  # already scattered into the pools
        R, Hq, D = q.shape
        Hkv = k_pool.data.shape[-1] // D
        qpk = Hq // Hkv
        spb = block_len // seg_len
        nb = batch.blk_live.shape[0] // R

        # Pad leaves to a dp multiple and path blocks to an sp multiple;
        # pads carry blk_live=0 so no DMA is ever issued for them.
        R_pad = -(-R // dp) * dp
        nb_pad = -(-nb // sp) * sp
        qp = jnp.pad(q, ((0, R_pad - R), (0, 0), (0, 0))) if R_pad != R else q

        def pad2(x, width):
            x = x.reshape(R, nb, width)
            return jnp.pad(
                x, ((0, R_pad - R), (0, nb_pad - nb), (0, 0))
            )

        seg_src = pad2(batch.seg_src, spb)
        seg_off = pad2(batch.seg_off, spb)
        seg_live = pad2(batch.seg_live, spb)
        blk_live = pad2(batch.blk_live, 1)
        quantized = k_pool.quantized

        def per_shard(q_l, kd_l, vd_l, li, src_l, off_l, live_l, blk_l,
                      *scales):
            # q_l (R/dp, Hq/tp, D); tables (R/dp, nb/sp, spb) local.
            Hkv_l = kd_l.shape[-1] // D
            R_l = q_l.shape[0]
            if quantized:
                from deft_tpu.ops.paged_seq_attn import (
                    paged_seq_attention_q_partial)

                acc, m, l = paged_seq_attention_q_partial(
                    q_l.reshape(R_l, Hkv_l, qpk, D), kd_l, vd_l,
                    scales[0], scales[1], li,
                    src_l.reshape(-1), off_l.reshape(-1),
                    live_l.reshape(-1), blk_l.reshape(-1),
                    scale=scale, block_len=block_len, seg_len=seg_len,
                )
            else:
                acc, m, l = paged_seq_attention_partial(
                    q_l.reshape(R_l, Hkv_l, qpk, D), kd_l, vd_l, li,
                    src_l.reshape(-1), off_l.reshape(-1),
                    live_l.reshape(-1), blk_l.reshape(-1),
                    scale=scale, block_len=block_len, seg_len=seg_len,
                )
            m = m[..., :1]
            l = l[..., :1]
            m_g = jax.lax.pmax(m, "sp")
            corr = jnp.exp(m - m_g)
            l_g = jax.lax.psum(l * corr, "sp")
            acc_g = jax.lax.psum(acc * corr, "sp")
            o = acc_g / jnp.where(l_g == 0.0, 1.0, l_g)
            return o.astype(q_l.dtype).reshape(R_l, Hkv_l * qpk, D)

        in_specs = [
            P("dp", "tp", None),          # q
            P(None, None, "tp"),          # k pool data
            P(None, None, "tp"),          # v pool data
            P(),                          # layer index
            P("dp", "sp", None),          # seg_src
            P("dp", "sp", None),          # seg_off
            P("dp", "sp", None),          # seg_live
            P("dp", "sp", None),          # blk_live
        ]
        operands = [qp, k_pool.data, v_pool.data, li, seg_src, seg_off,
                    seg_live, blk_live]
        if quantized:
            in_specs += [P(None, "tp", None), P(None, "tp", None)]
            operands += [k_pool.scale, v_pool.scale]
        o = jax.shard_map(
            per_shard,
            mesh=mesh,
            check_vma=False,  # pallas outputs carry no vma annotation
            in_specs=tuple(in_specs),
            out_specs=P("dp", "tp", None),
        )(*operands)
        return o[:R] if R_pad != R else o

    return attn

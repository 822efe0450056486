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

The in-kernel DMA paged variant (ops/paged_flatten_attn.py) is single-chip
for now; under a mesh the per-chip kernels use the XLA gather + partial
kernel (ops/sharded_flatten.py).  KV IO is still read exactly once per token
across the sp axis.
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


def make_sharded_tree_attn(mesh: Mesh):
    """AttnFn for the flatten-family modes on a (dp, sp, tp) mesh.

    Per shard: gather the local KV span from the (tp-sharded) pool, run the
    Pallas flatten kernel's partial pass, LSE-merge over sp.  Matches
    attn_impls.flatten_attn_xla semantics exactly (tests/test_multichip.py).
    """
    from deft_tpu.ops.sharded_flatten import flatten_attention_partial

    dp, sp, tp = _axis(mesh, "dp"), _axis(mesh, "sp"), _axis(mesh, "tp")

    def attn(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
        del k_new, v_new  # already scattered into the pools
        R, Hq, D = q.shape
        Hkv = k_pool.data.shape[-1] // D
        qpk = Hq // Hkv
        T = batch.kv_idx.shape[0]
        B = batch.blk_lo.shape[0]
        block_len = T // B

        # Pad rows to a dp multiple and blocks to an sp multiple; pads carry
        # empty leaf intervals so the kernel masks them out.
        R_pad = -(-R // dp) * dp
        B_pad = -(-B // sp) * sp
        T_pad = B_pad * block_len
        qp = jnp.pad(q, ((0, R_pad - R), (0, 0), (0, 0))) if R_pad != R else q
        kv_idx = _pad_to(batch.kv_idx, T_pad)
        tok_lo = _pad_to(batch.tok_lo, T_pad, 2**30)
        tok_hi = _pad_to(batch.tok_hi, T_pad, 0)
        blk_lo = _pad_to(batch.blk_lo, B_pad, 2**30)
        blk_hi = _pad_to(batch.blk_hi, B_pad, 0)
        leaves_per_shard = R_pad // dp

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
            acc, m, l = flatten_attention_partial(
                fold_q(q_l, Hkv_l), kt, vt,
                lo_l - r0, hi_l - r0, blo_l - r0, bhi_l - r0,
                scale=scale, qpk=qpk, block_len=block_len,
            )
            m = m[..., :1]
            l = l[..., :1]
            m_g = jax.lax.pmax(m, "sp")
            corr = jnp.exp(m - m_g)
            l_g = jax.lax.psum(l * corr, "sp")
            acc_g = jax.lax.psum(acc * corr, "sp")
            o = acc_g / jnp.where(l_g == 0.0, 1.0, l_g)
            return o.astype(q_l.dtype)

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

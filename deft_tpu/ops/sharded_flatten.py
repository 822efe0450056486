"""Multi-chip DeFT-Flatten: the Pallas kernel under shard_map with a
cross-chip LSE combine.

Sharding contract (parallel/sharding.py):
- ``tp`` shards KV heads — attention is embarrassingly parallel there (the
  reference kernel's grid axis 0).
- ``sp`` shards the DFS-flattened tree-KV **token axis**: each chip owns a
  contiguous span of flattened KV blocks, runs the single-chip flatten
  kernel over its span to produce *partial* (acc, m, l), and the global
  softmax is recovered with the standard LSE merge over ICI:

      m* = pmax(m);  l* = psum(l * exp(m - m*));  o = psum(acc * exp(m - m*)) / l*

  This is exactly the reference's two-stage atomic reduction
  (/root/reference/DeFT/deft/layers/attention/tree_attention.py:296-548)
  generalized to cross-chip collectives — no atomics, XLA compiles the
  psum/pmax onto the interconnect.  (SURVEY.md §5 "long-context /
  sequence parallelism".)

Works on any mesh with ("sp", "tp") axes; per-shard kernels run in interpret
mode on CPU meshes, compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from deft_tpu.ops.flatten_attn import _NEG, _interpret


def _partial_kernel(
    blk_lo_ref, blk_hi_ref,
    q_ref, k_ref, v_ref, lo_ref, hi_ref,
    acc_out, m_out, l_out,
    acc_ref, m_ref, l_ref,
    *, scale, qpk, block_len, num_blocks,
):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Skip dead blocks (empty interval) and, under dp row sharding, blocks
    # whose (already offset-shifted) leaf interval misses this shard's local
    # leaf range [0, Rq/qpk).
    n_leaves = q_ref.shape[1] // qpk
    live = (
        (blk_lo_ref[0, b] < blk_hi_ref[0, b])
        & (blk_lo_ref[0, b] < n_leaves)
        & (blk_hi_ref[0, b] > 0)
    )

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        rq = q.shape[0]
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
            p, v_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(b == num_blocks - 1)
    def _finish():
        acc_out[0] = acc_ref[...]
        m_out[0] = m_ref[...]
        l_out[0] = l_ref[...]


@functools.partial(jax.jit, static_argnames=("scale", "qpk", "block_len"))
def flatten_attention_partial(
    qf, kt, vt, tok_lo, tok_hi, blk_lo, blk_hi,
    *, scale, qpk, block_len=128,
):
    """Single-shard pass returning unnormalized (acc, m, l) — f32,
    shapes ((Hkv, Rq, D), (Hkv, Rq, 128), (Hkv, Rq, 128))."""
    Hkv, Rq, D = qf.shape
    T = kt.shape[1]
    nb = T // block_len
    # a non-multiple local span would silently drop the tail KV tokens from
    # the softmax (exactness invariant) — fail loudly like flatten_attention
    assert nb * block_len == T, (T, block_len)
    kernel = functools.partial(
        _partial_kernel, scale=scale, qpk=qpk,
        block_len=block_len, num_blocks=nb,
    )
    return pl.pallas_call(
        kernel,
        grid=(Hkv, nb),
        in_specs=[
            pl.BlockSpec((1, nb), lambda h, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb), lambda h, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Rq, D), lambda h, b: (h, 0, 0)),
            pl.BlockSpec((1, block_len, D), lambda h, b: (h, b, 0)),
            pl.BlockSpec((1, block_len, D), lambda h, b: (h, b, 0)),
            pl.BlockSpec((1, block_len), lambda h, b: (0, b)),
            pl.BlockSpec((1, block_len), lambda h, b: (0, b)),
        ],
        out_specs=(
            pl.BlockSpec((1, Rq, D), lambda h, b: (h, 0, 0)),
            pl.BlockSpec((1, Rq, 128), lambda h, b: (h, 0, 0)),
            pl.BlockSpec((1, Rq, 128), lambda h, b: (h, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hkv, Rq, D), jnp.float32),
            jax.ShapeDtypeStruct((Hkv, Rq, 128), jnp.float32),
            jax.ShapeDtypeStruct((Hkv, Rq, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rq, D), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
            pltpu.VMEM((Rq, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        blk_lo.reshape(1, nb), blk_hi.reshape(1, nb),
        qf, kt, vt, tok_lo.reshape(1, T), tok_hi.reshape(1, T),
    )


def flatten_attention_sharded(
    mesh, qf, kt, vt, tok_lo, tok_hi, blk_lo, blk_hi,
    *, scale, qpk, block_len=128, out_dtype=jnp.bfloat16,
):
    """(sp, tp)-sharded exact tree attention.

    qf (Hkv, Rq, D) sharded on heads (tp); kt/vt (Hkv, T, D) sharded on
    (tp, sp); token metadata sharded on sp.  Output (Hkv, Rq, D) sharded tp.
    """

    def shard_fn(qf_l, kt_l, vt_l, lo_l, hi_l, blo_l, bhi_l):
        acc, m, l = flatten_attention_partial(
            qf_l, kt_l, vt_l, lo_l, hi_l, blo_l, bhi_l,
            scale=scale, qpk=qpk, block_len=block_len,
        )
        m = m[..., :1]
        l = l[..., :1]
        # cross-chip LSE merge over the sequence-parallel axis
        m_g = jax.lax.pmax(m, "sp")
        corr = jnp.exp(m - m_g)
        l_g = jax.lax.psum(l * corr, "sp")
        acc_g = jax.lax.psum(acc * corr, "sp")
        o = acc_g / jnp.where(l_g == 0.0, 1.0, l_g)
        return o.astype(out_dtype)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        check_vma=False,  # pallas_call outputs carry no vma annotation
        in_specs=(
            P("tp", None, None),
            P("tp", "sp", None),
            P("tp", "sp", None),
            P("sp"),
            P("sp"),
            P("sp"),
            P("sp"),
        ),
        out_specs=P("tp", None, None),
    )
    return fn(qf, kt, vt, tok_lo, tok_hi, blk_lo, blk_hi)

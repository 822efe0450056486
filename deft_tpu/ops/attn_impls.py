"""Attention implementations behind the model's AttnFn interface.

Each entry point matches llama.AttnFn:
    (q, k_new, v_new, k_pool, v_pool, layer_idx, batch, scale) -> (R, Hq, D)

XLA reference implementations live here (also used as CPU oracles); the
Pallas TPU kernels in ops/flatten_attn.py / ops/seq_attn.py / ops/prefill.py
are selected by the runner on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from deft_tpu.models.llama import kv_gather_heads
from deft_tpu.ops.dense_oracle import (
    dense_causal_attention,
    dense_ragged_causal_attention,
    dense_tree_attention,
    _NEG,
)


def flatten_attn_xla(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """Tree attention over the DFS-flattened plan, dense-masked XLA version
    (oracle for the Pallas flatten kernel; also the UNPAGED_MEDUSA dense
    baseline since the math materializes the full score matrix)."""
    D = q.shape[-1]
    kt = kv_gather_heads(k_pool, li, batch.kv_idx, D, q.dtype)  # (T, Hkv, D)
    vt = kv_gather_heads(v_pool, li, batch.kv_idx, D, q.dtype)
    return dense_tree_attention(q, kt, vt, batch.tok_lo, batch.tok_hi, scale)


def seq_attn_xla(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """Sequential per-leaf decode (Flash-Decoding baseline), XLA version:
    each leaf gathers and attends its own full path — the per-leaf KV
    re-reads are the point of this baseline."""
    D = q.shape[-1]
    kt = kv_gather_heads(k_pool, li, batch.paths, D, q.dtype)  # (R, C, Hkv, D)
    vt = kv_gather_heads(v_pool, li, batch.paths, D, q.dtype)
    R, C, Hkv, D = kt.shape
    Hq = q.shape[1]
    qpk = Hq // Hkv
    kx = jnp.repeat(kt, qpk, axis=2)  # (R, C, Hq, D)
    vx = jnp.repeat(vt, qpk, axis=2)
    s = jnp.einsum(
        "rhd,rthd->rht", q.astype(jnp.float32), kx.astype(jnp.float32)
    ) * scale
    t = jnp.arange(C, dtype=jnp.int32)
    mask = t[None, :] < batch.seq_lens[:, None]  # (R, C)
    s = jnp.where(mask[:, None, :], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("rht,rthd->rhd", p, vx.astype(jnp.float32)).astype(q.dtype)


def prefill_attn_xla(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """Causal prefill over the in-flight projections (small-prompt / CPU)."""
    return dense_causal_attention(q, k_new, v_new, scale)


def ragged_prefill_attn_xla(q, k_new, v_new, k_pool, v_pool, li, batch, scale):
    """Ragged-batch causal prefill (CPU / oracle path): batch.seg_ids maps
    each concatenated token to its prompt; cross-prompt attention masked."""
    return dense_ragged_causal_attention(q, k_new, v_new, batch.seg_ids, scale)

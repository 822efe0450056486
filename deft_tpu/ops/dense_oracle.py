"""Dense masked attention in plain XLA.

Two roles:
1. Numerical oracle for every kernel test (the reference's only real check:
   dense torch attention per leaf, tests/model/test_DeFT_kernel.py:212-305).
2. The "Tree Attention Medusa" baseline mode (reference UNPAGED_MEDUSA,
   unpaged/causal_masked.py:4-17): materializes the full (q, kv) scores +
   mask — the IO-heavy baseline DeFT's accounting penalizes.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG = -0.7 * jnp.finfo(jnp.float32).max


def dense_tree_attention(
    q: jnp.ndarray,       # (R, Hq, D) — R = padded leaves
    k: jnp.ndarray,       # (T, Hkv, D) tree KV in DFS order
    v: jnp.ndarray,       # (T, Hkv, D)
    tok_lo: jnp.ndarray,  # (T,) int32
    tok_hi: jnp.ndarray,  # (T,) int32
    scale: float,
) -> jnp.ndarray:
    """Exact tree attention: query row r (leaf r) attends token t iff
    tok_lo[t] <= r < tok_hi[t]."""
    R, Hq, D = q.shape
    T, Hkv, _ = k.shape
    qpk = Hq // Hkv
    kx = jnp.repeat(k, qpk, axis=1)  # (T, Hq, D)
    vx = jnp.repeat(v, qpk, axis=1)
    s = jnp.einsum(
        "rhd,thd->rht", q.astype(jnp.float32), kx.astype(jnp.float32)
    ) * scale
    leaf = jnp.arange(R, dtype=jnp.int32)
    mask = (tok_lo[None, :] <= leaf[:, None]) & (leaf[:, None] < tok_hi[None, :])
    m = jnp.max(jnp.where(mask[:, None, :], s, _NEG), axis=-1, keepdims=True)
    # zero masked entries AFTER the exp (not exp(_NEG - _NEG) == 1): a
    # fully-masked (padded-leaf) row then has l == 0 and yields 0, matching
    # the Pallas kernels' convention exactly
    p = jnp.where(mask[:, None, :], jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("rht,thd->rhd", p, vx.astype(jnp.float32)).astype(q.dtype)


def dense_causal_attention(
    q: jnp.ndarray,  # (N, Hq, D)
    k: jnp.ndarray,  # (N, Hkv, D)
    v: jnp.ndarray,  # (N, Hkv, D)
    scale: float,
) -> jnp.ndarray:
    """Dense causal self-attention (prefill oracle / small-prompt fallback)."""
    N, Hq, D = q.shape
    Hkv = k.shape[1]
    qpk = Hq // Hkv
    kx = jnp.repeat(k, qpk, axis=1)
    vx = jnp.repeat(v, qpk, axis=1)
    s = jnp.einsum(
        "nhd,thd->nht", q.astype(jnp.float32), kx.astype(jnp.float32)
    ) * scale
    i = jnp.arange(N, dtype=jnp.int32)
    causal = i[:, None] >= i[None, :]
    s = jnp.where(causal[:, None, :], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum("nht,thd->nhd", p, vx.astype(jnp.float32)).astype(q.dtype)


def dense_ragged_causal_attention(
    q: jnp.ndarray,    # (N, Hq, D) concatenated prompts
    k: jnp.ndarray,    # (N, Hkv, D)
    v: jnp.ndarray,    # (N, Hkv, D)
    seg: jnp.ndarray,  # (N,) int32 segment (prompt) id per token; pads < 0
    scale: float,
) -> jnp.ndarray:
    """Ragged-batch causal self-attention oracle: token i attends token j iff
    seg[i] == seg[j] >= 0 and i >= j (reference ragged prefill semantics,
    context_flashattention_nopad.py:132-195, expressed densely)."""
    N, Hq, D = q.shape
    Hkv = k.shape[1]
    qpk = Hq // Hkv
    kx = jnp.repeat(k, qpk, axis=1)
    vx = jnp.repeat(v, qpk, axis=1)
    s = jnp.einsum(
        "nhd,thd->nht", q.astype(jnp.float32), kx.astype(jnp.float32)
    ) * scale
    i = jnp.arange(N, dtype=jnp.int32)
    mask = (
        (i[:, None] >= i[None, :])
        & (seg[:, None] == seg[None, :])
        & (seg[:, None] >= 0)
    )
    m = jnp.max(jnp.where(mask[:, None, :], s, _NEG), axis=-1, keepdims=True)
    # fully-masked (pad) rows yield 0, matching the kernels (see
    # dense_tree_attention)
    p = jnp.where(mask[:, None, :], jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(l == 0.0, 1.0, l)
    return jnp.einsum("nht,thd->nhd", p, vx.astype(jnp.float32)).astype(q.dtype)

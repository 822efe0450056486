"""Rotary position embeddings, HF-Llama (rotate-half) convention, with
Llama-3 frequency scaling.

Parity surface: /root/reference/DeFT/deft/layers/rotary_embedding.py
(RotaryEmbedding :76-189, Llama3RotaryEmbedding :592-641, get_rope :647-788).
TPU-first: a precomputed fp32 cos/sin table gathered by position inside the
jitted step — no in-place CUDA rope; XLA fuses the gather+rotate into the
projection epilogue.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def _llama3_scale_freqs(inv_freq: np.ndarray, scaling: Dict[str, Any]) -> np.ndarray:
    factor = scaling["factor"]
    low = scaling.get("low_freq_factor", 1.0)
    high = scaling.get("high_freq_factor", 4.0)
    orig_ctx = scaling.get("original_max_position_embeddings", 8192)
    wavelen = 2 * math.pi / inv_freq
    # three bands: long wavelengths fully scaled, short untouched, smooth mid
    low_wl = orig_ctx / low
    high_wl = orig_ctx / high
    smooth = (orig_ctx / wavelen - low) / (high - low)
    scaled = np.where(
        wavelen > low_wl,
        inv_freq / factor,
        np.where(
            wavelen < high_wl,
            inv_freq,
            (1 - smooth) * inv_freq / factor + smooth * inv_freq,
        ),
    )
    return scaled


def rope_table(
    head_dim: int,
    max_pos: int,
    theta: float = 10000.0,
    scaling: Optional[Dict[str, Any]] = None,
) -> jnp.ndarray:
    """(max_pos, head_dim) fp32 table: [cos | sin] halves, HF layout
    (cos/sin each repeated over the two rotated halves)."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / head_dim))
    if scaling is not None:
        rtype = scaling.get("rope_type", scaling.get("type", ""))
        if rtype == "llama3":
            inv_freq = _llama3_scale_freqs(inv_freq, scaling)
        elif rtype == "linear":
            inv_freq = inv_freq / scaling["factor"]
        elif rtype in ("default", "", None):
            pass
        else:
            raise NotImplementedError(f"rope scaling {rtype!r}")
    pos = np.arange(max_pos, dtype=np.float64)
    freqs = np.outer(pos, inv_freq)  # (max_pos, half)
    table = np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)
    return jnp.asarray(table, dtype=jnp.float32)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x`` (..., n_tokens, heads, head_dim) by per-token positions.

    rotate_half convention: out = x*cos + rotate_half(x)*sin with
    rotate_half([a, b]) = [-b, a] on the two halves of head_dim.
    """
    half = x.shape[-1] // 2
    cs = table[positions]  # (n, head_dim)
    cos = cs[..., :half][..., None, :]  # (n, 1, half)
    sin = cs[..., half:][..., None, :]
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)

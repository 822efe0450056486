"""Engine-wide configuration.

Replaces the reference's mutable module globals BLOCK_CONFIG / TRAVERSAL_CONFIG
(/root/reference/DeFT/deft/tree_decoding/tree_cache.py:587-588) with a typed,
immutable config threaded through the stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """Static attention-plan / kernel parameters.

    block_len: tokens per flattened KV block (the reference default is 128,
        tree_cache.py:587; on TPU this is also the kernel's KV tile and must
        be a multiple of 128 lanes).  Default 256: the paged kernels'
        per-block fixed costs dominate at 128 (measured on v5e,
        experiments/kernel_lab.py — 128 -> 256 cut attention/step ~1.6x at
        the bench shape); 512 is faster still on dense-prefix trees (the
        bench uses it) but coarsens dead-block skipping on sparse trees and
        grows VMEM tiles, so 256 is the general default.
    max_q_tile: query *rows* per kernel tile (leaves x q_heads_per_kv_head,
        folded for the MXU).  The reference limits 32 queries per partial
        (tree_cache.py:661-723); here the limit is rows per MXU tile.
    node_chunk_len: when set, DeFT-Node plans chunk node KV runs to at most
        this many tokens (the reference's MAX_BLOCK_LEN node_chunk mode,
        examples/run_DeFT_llama_paged.py:145-150).
    """

    block_len: int = 256
    max_q_tile: int = 128
    node_chunk_len: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level engine knobs."""

    attention: AttentionConfig = dataclasses.field(default_factory=AttentionConfig)
    # KV pool sizing: number of token slots.  None -> derived from HBM budget.
    kv_pool_slots: Optional[int] = None
    max_requests: int = 1024
    max_context_len: int = 32768
    # Shape-bucketing for jit: pad token counts to these granularities.
    min_token_bucket: int = 1024
    max_leaves: int = 128
    dtype: str = "bfloat16"
    # KV cache element type: "inherit" (same as dtype) or "int8"
    # (per-(token, head) fp32 scales; halves KV HBM footprint and IO)
    kv_dtype: str = "inherit"
    # Weight element type: "inherit" (dtype) or "int8" (weight-only
    # quantization, per-output-channel fp32 scales; halves weight HBM so
    # 8B-class models fit one v5e chip — no reference counterpart)
    weight_dtype: str = "inherit"
    # Fraction of free HBM the KV pool may claim when kv_pool_slots is None.
    mem_fraction: float = 0.8

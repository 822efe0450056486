"""DeFT-Node and Tree-Index plan variants.

Node mode (reference TREE_DECODE_NODE, tree_attention.py:169-293) groups
attention work by whole KV tree node; node_chunk caps a node's run at
MAX_BLOCK_LEN for load balancing.  On TPU both reduce to the flatten plan
with node-aligned blocks: each 128-token kernel block holds tokens of exactly
one node (padded), so every block's query interval is uniform — the
node-granularity KV-guided grouping, with the padding waste being the honest
cost of node granularity on small nodes.

Tree-Index mode (reference TREE_DECODE_INDEX_NODE, tree_cache.py:883-1018)
avoids re-concatenating per-node KV index lists every step by keeping each
node's indices in a fixed TreeIndexPool row; the plan builder slices rows
instead of walking python lists.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from deft_tpu.core.kv_pool import DUMP_SLOT
from deft_tpu.core.tree import TreeCache
from deft_tpu.plan.flatten import FlattenPlan, _EMPTY_LO, _leaf_arrays, build_flatten_plan
from deft_tpu.plan.padding import pad_leaf_count, pad_token_count


def build_node_plan(
    tree: TreeCache,
    q_per_kv: int,
    block_len: int = 128,
    min_token_bucket: int = 1024,
    chunk_len: Optional[int] = None,
    seg_len=(128, 32),
    waste_limit: float = 1.5,
) -> FlattenPlan:
    return build_flatten_plan(
        tree,
        q_per_kv,
        block_len=block_len,
        min_token_bucket=min_token_bucket,
        node_aligned=True,
        chunk_len=chunk_len,
        seg_len=seg_len,
        waste_limit=waste_limit,
    )


def build_tree_index_plan(
    tree: TreeCache,
    q_per_kv: int,
    block_len: int = 128,
    min_token_bucket: int = 1024,
) -> FlattenPlan:
    """Node-aligned plan whose KV indices come from TreeIndexPool rows."""
    assert tree.tree_index_pool is not None, "tree_index mode needs a TreeIndexPool"
    pool = tree.tree_index_pool
    order, leaf_to_q, lo_arr, hi_arr = tree.dfs_plan_order()
    n_leaves = len(tree.leaves)
    l_pad = pad_leaf_count(n_leaves, q_per_kv)

    idx_parts: List[np.ndarray] = []
    lo_parts: List[np.ndarray] = []
    hi_parts: List[np.ndarray] = []
    for i, node in enumerate(order):
        n = node.kv_len
        if n == 0:
            continue
        assert node.node_index_row is not None
        idx_parts.append(pool.node_to_kv[node.node_index_row, :n])
        lo_parts.append(np.full(n, lo_arr[i], dtype=np.int32))
        hi_parts.append(np.full(n, hi_arr[i], dtype=np.int32))
        if n % block_len != 0:
            pad = block_len - (n % block_len)
            idx_parts.append(np.full(pad, DUMP_SLOT, dtype=np.int32))
            lo_parts.append(np.full(pad, _EMPTY_LO, dtype=np.int32))
            hi_parts.append(np.zeros(pad, dtype=np.int32))

    kv_idx = np.concatenate(idx_parts) if idx_parts else np.empty(0, dtype=np.int32)
    tok_lo = np.concatenate(lo_parts) if lo_parts else np.empty(0, dtype=np.int32)
    tok_hi = np.concatenate(hi_parts) if hi_parts else np.empty(0, dtype=np.int32)

    n_tokens = int(kv_idx.shape[0])
    # same pow2 bucket family as build_flatten_plan: dead blocks are skipped
    # by the kernel, so fewer jit buckets beat tighter padding
    t_pad = pad_token_count(n_tokens, block_len, min_token_bucket, pow2=True)
    pad = t_pad - n_tokens
    if pad:
        kv_idx = np.concatenate([kv_idx, np.full(pad, DUMP_SLOT, dtype=np.int32)])
        tok_lo = np.concatenate([tok_lo, np.full(pad, _EMPTY_LO, dtype=np.int32)])
        tok_hi = np.concatenate([tok_hi, np.zeros(pad, dtype=np.int32)])

    nb = t_pad // block_len
    q_tokens, q_pos, out_loc = _leaf_arrays(tree, order, leaf_to_q, l_pad)
    return FlattenPlan(
        kv_idx=kv_idx,
        tok_lo=tok_lo,
        tok_hi=tok_hi,
        blk_lo=tok_lo.reshape(nb, block_len).min(axis=1),
        blk_hi=tok_hi.reshape(nb, block_len).max(axis=1),
        q_tokens=q_tokens,
        q_pos=q_pos,
        out_loc=out_loc,
        n_tokens=sum(n.kv_len for n in order),
        n_leaves=n_leaves,
        block_len=block_len,
    )

"""Sequential (per-leaf) decode plan — the Flash-Decoding / Radix-Attention
baseline the reference compares against (token_attention.py, ForwardMode
DECODE): every leaf attends its own root-to-leaf KV path independently, so a
shared prefix is re-read once per leaf.  Paths come straight out of the
incremental ReqToTokenPool page table (no tree walk per step).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from deft_tpu.core.kv_pool import DUMP_SLOT
from deft_tpu.core.tree import TreeCache
from deft_tpu.plan.padding import pad_leaf_count, pad_token_count


@dataclasses.dataclass
class SeqPlan:
    paths: np.ndarray       # (L_pad, C_pad) int32 KV slots per leaf path
    seq_lens: np.ndarray    # (L_pad,) int32 true path lengths (pad -> 0)
    q_tokens: np.ndarray    # (L_pad,) int32
    q_pos: np.ndarray       # (L_pad,) int32
    out_loc: np.ndarray     # (L_pad,) int32
    n_leaves: int
    total_kv: int           # sum of true path lengths (the baseline's KV IO)

    @property
    def l_pad(self) -> int:
        return int(self.paths.shape[0])

    @property
    def c_pad(self) -> int:
        return int(self.paths.shape[1])


def build_seq_plan(
    tree: TreeCache,
    q_per_kv: int,
    block_len: int = 128,
    min_token_bucket: int = 1024,
) -> SeqPlan:
    """Call after TreeCache.alloc() (same contract as build_flatten_plan)."""
    assert tree.req_to_token_pool is not None
    leaves = sorted(tree.leaves.values(), key=lambda x: x.id)
    # q numbering matches the DFS convention used everywhere else.
    _, leaf_to_q, _, _ = tree.dfs_plan_order()
    n_leaves = len(leaves)
    l_pad = pad_leaf_count(n_leaves, q_per_kv)
    max_len = max((leaf.positions[-1] + 1) for leaf in leaves)
    c_pad = pad_token_count(max_len, block_len, min_token_bucket)

    paths = np.full((l_pad, c_pad), DUMP_SLOT, dtype=np.int32)
    seq_lens = np.zeros(l_pad, dtype=np.int32)
    q_tokens = np.zeros(l_pad, dtype=np.int32)
    q_pos = np.zeros(l_pad, dtype=np.int32)
    out_loc = np.full(l_pad, DUMP_SLOT, dtype=np.int32)
    total_kv = 0
    for leaf in leaves:
        q = leaf_to_q[leaf.id]
        path_len = leaf.positions[-1] + 1
        req = tree.leaf_to_req[leaf.id]
        paths[q, :path_len] = tree.req_to_token_pool.req_to_token[req, :path_len]
        seq_lens[q] = path_len
        q_tokens[q] = leaf.token_ids[-1]
        q_pos[q] = leaf.positions[-1]
        out_loc[q] = leaf.kv_indices[-1]
        total_kv += path_len
    return SeqPlan(
        paths=paths,
        seq_lens=seq_lens,
        q_tokens=q_tokens,
        q_pos=q_pos,
        out_loc=out_loc,
        n_leaves=n_leaves,
        total_kv=total_kv,
    )

"""Shape bucketing: the tree changes every step, but the jitted step needs
static shapes.  Pad counts to a small family of buckets so recompiles are
O(log(max size)) per run and the XLA compile cache absorbs them across runs.

This replaces the reference's luxury of fully dynamic Triton grids; it is the
central static-shape design noted in SURVEY.md §7 ("hard parts" #1).
"""

from __future__ import annotations


def next_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def pad_token_count(n: int, block_len: int = 128, min_bucket: int = 1024,
                    pow2: bool = False) -> int:
    """Bucket a KV token count: multiple of ``block_len``, then next power of
    two up to 8192, then multiples of 4096 — or pure powers of two when
    ``pow2`` (flatten plans: dead blocks are skipped by the kernel and the
    upload is small, so fewer jit buckets beat tighter padding; the seq
    baseline keeps tight buckets because its gather cost scales with the
    padded width)."""
    n = max(n, 1)
    n = ((n + block_len - 1) // block_len) * block_len
    if n <= min_bucket:
        return min_bucket
    if pow2 or n <= 8192:
        return next_pow2(n)
    return ((n + 4095) // 4096) * 4096


def pad_leaf_count(n_leaves: int, q_per_kv: int, min_rows: int = 16) -> int:
    """Pad the leaf count so folded query rows (leaves * q_per_kv) meet TPU
    sublane tiling (>=16 rows) and stay a power of two."""
    assert q_per_kv >= 1
    need = max(n_leaves, (min_rows + q_per_kv - 1) // q_per_kv, 1)
    return next_pow2(need)

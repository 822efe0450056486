"""Chunked TokenKVPool allocator unit tests."""

import numpy as np
import pytest

from deft_tpu.core.kv_pool import DUMP_SLOT, TokenKVPool


def test_batch_alloc_contiguous():
    p = TokenKVPool(1024)
    a = p.alloc(100)
    assert a[0] == p.chunk and np.all(np.diff(a) == 1)  # bump starts chunk-aligned
    assert p.used_size() == 100


def test_chunked_alloc_contiguous_per_owner():
    p = TokenKVPool(4096, chunk=64)
    a = [int(p.alloc_for(7)[0]) for _ in range(70)]
    b = [int(p.alloc_for(8)[0]) for _ in range(70)]
    # each owner's stream is contiguous except possibly at chunk boundaries
    # (sequentially-opened chunks may even be adjacent -> 0 jumps)
    for stream in (a, b):
        arr = np.array(stream)
        jumps = np.flatnonzero(np.diff(arr) != 1)
        assert len(jumps) <= 1
        assert np.all((np.diff(arr) == 1) | ((np.arange(69) % 64) == 63))
    assert not set(a) & set(b)
    assert p.used_size() == 140


def test_close_owner_recycles_tail():
    p = TokenKVPool(1024, chunk=64)
    locs = p.alloc_for(1, 10)
    free_before = p.available_size()
    p.close_owner(1)
    assert p.available_size() == free_before + 54
    # slots still referenced until freed
    assert p.used_size() == 10
    p.free(locs)
    assert p.used_size() == 0


def test_fallback_to_recycled_singles():
    p = TokenKVPool(256, chunk=128, cover_slack=0)  # [0,128) + one chunk
    a = p.alloc_for(1, 128)
    assert a is not None
    p.free(a[:50])
    # bump exhausted: new owner must fall back to recycled singles
    b = p.alloc_for(2, 20)
    assert b is not None
    assert set(int(x) for x in b) <= set(int(x) for x in a[:50])
    assert p.alloc_for(3, 100) is None  # over capacity


def test_refcount_sharing():
    p = TokenKVPool(256, cover_slack=0)
    a = p.alloc(10)
    p.add_refs(a)
    p.free(a)
    assert p.used_size() == 10  # still referenced once
    p.free(a)
    assert p.used_size() == 0


def test_exhaustion_returns_none():
    p = TokenKVPool(64, chunk=16, cover_slack=0)  # 48 allocatable
    assert p.alloc(100) is None
    got = p.alloc(48)
    assert got is not None
    assert p.alloc(1) is None
    assert p.alloc_for(1, 1) is None


def test_alloc_group_aligned_contiguous():
    """alloc_group returns a chunk-ALIGNED contiguous span (the flatten
    plan's seg-alignment check requires start % seg == 0)."""
    import numpy as np

    from deft_tpu.core.kv_pool import TokenKVPool

    pool = TokenKVPool(4096, chunk=128)
    pool.alloc(100)  # misalign the bump pointer
    g = pool.alloc_group(64)
    assert g is not None
    assert g[0] % 128 == 0
    np.testing.assert_array_equal(g, np.arange(g[0], g[0] + 64))
    # freed group slots recycle as singles
    pool.free(g)
    assert pool.used_size() == 100


def test_alloc_group_exhaustion_returns_none():
    from deft_tpu.core.kv_pool import TokenKVPool

    pool = TokenKVPool(512, chunk=128, cover_slack=0)
    pool.alloc(200)
    assert pool.alloc_group(256) is None  # bump region too small
    assert pool.alloc_group(64) is not None


def test_alloc_group_span_reuse():
    """The spec-decode steady state (free all group slots, realloc same
    size) must reuse the span in place — bump consumption stays bounded
    instead of growing by `width` slots per step."""
    from deft_tpu.core.kv_pool import TokenKVPool

    pool = TokenKVPool(4096, chunk=128)
    g1 = pool.alloc_group(64)
    bump_after_first = pool._bump
    for _ in range(50):
        pool.free(g1)
        g2 = pool.alloc_group(64)
        assert g2[0] == g1[0]  # same span, reused in place
        g1 = g2
    assert pool._bump == bump_after_first
    # accounting stays consistent: reuse never double-counts capacity
    assert pool.used_size() == 64
    pool.free(g1)
    assert pool.used_size() == 0


def test_alloc_group_partial_free_retires_span():
    """A partially-freed span can't be reused; a fresh group retires it,
    flushing held-back slots into the recycled pool (no capacity leak)."""
    from deft_tpu.core.kv_pool import TokenKVPool

    pool = TokenKVPool(4096, chunk=128)
    g1 = pool.alloc_group(64)
    pool.free(g1[:32])  # only half the span dies
    before = pool.available_size()
    g2 = pool.alloc_group(64)
    assert g2[0] != g1[0]
    # the 32 held-back slots were flushed to _recycled on retirement
    assert pool.available_size() == before + 32 - 64

"""Property tests for the host tree runtime: branch/cut/merge/refcount
invariants, page-table consistency, DFS leaf-interval correctness.

Modeled on the verification the reference lacks (SURVEY.md §4): the
reference's only real check is a kernel oracle; these pin the tree ops.
"""

import numpy as np
import pytest

from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache, TreeIndexPool


def make_cache(pool_size=4096, max_ctx=512, reqs=64, tree_index=False):
    kv = TokenKVPool(pool_size)
    req = ReqToTokenPool(reqs, max_ctx)
    ti = TreeIndexPool(reqs, max_ctx) if tree_index else None
    return TreeCache(kv, req, ti)


def check_ref_invariant(tree: TreeCache):
    """Every node's ref_count == number of leaves in its subtree; every live
    KV slot's pool refcount == number of nodes referencing it."""
    def count_leaves(node):
        if not node.children:
            return 1
        return sum(count_leaves(c) for c in node.children.values())

    for node in tree.nodes.values():
        assert node.ref_count == count_leaves(node), node

    slot_refs = {}
    for node in tree.nodes.values():
        for s in node.kv_indices:
            slot_refs[int(s)] = slot_refs.get(int(s), 0) + 1
    for s, n in slot_refs.items():
        assert tree.token_to_kv_pool.refs[s] == n, (s, n)


def test_init_prompt_contiguous_and_tracked():
    tree = make_cache()
    loc = tree.init_prompt(list(range(100)))
    assert len(loc) == 100
    # bump allocator => contiguous prompt slots
    assert np.array_equal(loc, np.arange(loc[0], loc[0] + 100))
    assert tree.root.kv_len == 100
    assert tree.root.positions[-1] == 99
    req = tree.leaf_to_req[tree.root.id]
    assert np.array_equal(
        tree.req_to_token_pool.req_to_token[req, :100], loc
    )
    check_ref_invariant(tree)


def test_branch_and_alloc():
    tree = make_cache()
    tree.init_prompt(list(range(10)))
    children = tree.branch(tree.root, 3)
    assert len(tree.leaves) == 3
    assert tree.root.ref_count == 3
    for i, c in enumerate(children):
        c.append_token(100 + i)
        assert c.positions[0] == 10
    loc = tree.alloc()
    assert len(loc) == 3
    check_ref_invariant(tree)
    # page tables: each child's row holds prompt prefix + its own slot
    for c in children:
        req = tree.leaf_to_req[c.id]
        row = tree.req_to_token_pool.req_to_token[req]
        assert np.array_equal(row[:10], tree.root.kv_indices)
        assert row[10] == c.kv_indices[0]


def test_cut_frees_chain():
    tree = make_cache()
    tree.init_prompt([1, 2, 3])
    a, b = tree.branch(tree.root, 2)
    for n in (a, b):
        n.append_token(7)
    tree.alloc()
    used_before = tree.token_to_kv_pool.used_size()
    # cut b: frees b's kv only (root still referenced by a)
    tree.cut(b)
    assert tree.token_to_kv_pool.used_size() == used_before - 1
    check_ref_invariant(tree)
    # cut a: frees a AND the root chain
    tree.cut(a)
    assert tree.token_to_kv_pool.used_size() == 0
    assert len(tree.nodes) == 0


def test_deep_chain_branch_prune():
    """Grow a depth-5 binary tree, prune alternating leaves, check invariants."""
    tree = make_cache()
    tree.init_prompt(list(range(16)))
    rng = np.random.RandomState(0)
    for it in range(5):
        leaves = list(tree.leaves.values())
        for leaf in leaves:
            if leaf.get_len() == 0:
                leaf.append_token(rng.randint(1000))
        tree.alloc()
        leaves = sorted(tree.leaves.values(), key=lambda x: x.id)
        for leaf in leaves:
            if rng.rand() < 0.4 and len(tree.leaves) > 1:
                tree.cut(leaf)
            elif rng.rand() < 0.5:
                for c in tree.branch(leaf, 2):
                    c.append_token(rng.randint(1000))
        check_ref_invariant(tree)
    # total kv slots == live tokens with kv
    live_kv = sum(n.kv_len for n in tree.nodes.values())
    assert tree.token_to_kv_pool.used_size() == live_kv


def test_merge_and_reset_speculative():
    """The speculative-decoding KV squeeze: merge leaves into root, reset."""
    tree = make_cache()
    tree.init_prompt(list(range(8)))
    leaves = tree.branch(tree.root, 4)
    for i, leaf in enumerate(leaves):
        leaf.append_token(50 + i)
    tree.alloc()
    kv_before = tree.root.kv_len
    # accept 2 tokens: merge leaves[0], leaves[1] into root without pruning
    tree.merge_nodes(tree.root, leaves[0], prune_b=False)
    tree.merge_nodes(tree.root, leaves[1], prune_b=False)
    kv_after = tree.root.kv_len
    assert kv_after == kv_before + 2
    diff = kv_after - kv_before
    for leaf in leaves:
        tree.reset_node_KV(leaf, diff)
    for leaf in leaves:
        assert leaf.kv_len == 0
        assert leaf.positions[0] == 8 + diff + 0
    check_ref_invariant(tree)


def test_dfs_leaf_intervals():
    """Every node's [lo, hi) must exactly cover its descendant leaves' q ids."""
    tree = make_cache()
    tree.init_prompt(list(range(4)))
    rng = np.random.RandomState(1)
    for _ in range(4):
        for leaf in list(tree.leaves.values()):
            if leaf.get_len() == 0:
                leaf.append_token(rng.randint(100))
        tree.alloc()
        for leaf in sorted(tree.leaves.values(), key=lambda x: x.id):
            if rng.rand() < 0.5:
                for c in tree.branch(leaf, rng.randint(2, 4)):
                    c.append_token(rng.randint(100))
    order, leaf_to_q, lo, hi = tree.dfs_plan_order()
    assert len(order) == len(tree.nodes)
    assert sorted(leaf_to_q.values()) == list(range(len(tree.leaves)))

    def leaves_under(node):
        if not node.children:
            return {leaf_to_q[node.id]}
        out = set()
        for c in node.children.values():
            out |= leaves_under(c)
        return out

    for i, node in enumerate(order):
        expect = leaves_under(node)
        assert expect == set(range(lo[i], hi[i])), (node, lo[i], hi[i])


def test_output_branch_ppl():
    tree = make_cache()
    tree.init_prompt([1, 2, 3])
    (a,) = tree.branch(tree.root, 1)
    a.append_token(10, logprob=-1.0)
    a.append_token(11, logprob=-2.0)
    seq = tree.output_branch(a)
    assert seq.token_ids == [10, 11]
    assert seq.PPL == pytest.approx(np.exp(1.5))


def test_pool_exhaustion_and_recycle():
    pool = TokenKVPool(24, chunk=8, cover_slack=0)  # 16 allocatable
    a = pool.alloc(10)
    assert a is not None
    assert pool.alloc(10) is None  # only 6 left
    pool.free(a[:5])
    b = pool.alloc(8)
    assert b is not None
    assert pool.available_size() == 3
    # no slot handed out twice while live
    assert len(np.intersect1d(a[5:], b)) == 0

"""Pallas kernel numerics vs the dense XLA oracles (interpret mode on CPU).

Mirrors the reference's only real kernel check — dense attention oracle with
a relative-error tolerance (/root/reference/DeFT/tests/model/
test_DeFT_kernel.py:212-305) — but as proper parametrized pytest units.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deft_tpu.ops.dense_oracle import dense_causal_attention, dense_tree_attention
from deft_tpu.ops.flatten_attn import flatten_attention, fold_q, unfold_o
from deft_tpu.ops.prefill import prefill_attention
from deft_tpu.ops.seq_attn import seq_attention


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)


def random_tree_intervals(rng, T, n_leaves, block_len):
    """Random DFS-consistent (tok_lo, tok_hi): a chain of segments each owned
    by a random interval, padding tail empty."""
    lo = np.full(T, 2**30, dtype=np.int32)
    hi = np.zeros(T, dtype=np.int32)
    t = 0
    n_live = rng.integers(T // 2, T - block_len + 1)
    while t < n_live:
        seg = int(rng.integers(1, 64))
        seg = min(seg, n_live - t)
        a = int(rng.integers(0, n_leaves))
        b = int(rng.integers(a + 1, n_leaves + 1))
        lo[t : t + seg] = a
        hi[t : t + seg] = b
        t += seg
    nb = T // block_len
    blk_lo = lo.reshape(nb, block_len).min(axis=1)
    blk_hi = hi.reshape(nb, block_len).max(axis=1)
    return lo, hi, blk_lo, blk_hi


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "R,Hq,Hkv,D,T",
    [
        (16, 8, 2, 64, 512),
        (32, 8, 8, 128, 384),  # MHA
        (8, 32, 8, 128, 256),  # Llama-8B heads
    ],
)
def test_flatten_kernel_vs_oracle(dtype, R, Hq, Hkv, D, T):
    rng = np.random.default_rng(R * 31 + Hq)
    block_len = 128
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((T, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((T, Hkv, D)), dtype)
    lo, hi, blk_lo, blk_hi = random_tree_intervals(rng, T, R, block_len)
    scale = D**-0.5

    want = dense_tree_attention(q, k, v, jnp.asarray(lo), jnp.asarray(hi), scale)
    qf = fold_q(q, Hkv)
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    got = unfold_o(
        flatten_attention(
            qf, kt, vt,
            jnp.asarray(lo), jnp.asarray(hi),
            jnp.asarray(blk_lo), jnp.asarray(blk_hi),
            scale=scale, qpk=Hq // Hkv, block_len=block_len,
        ),
        R,
    )
    # rows with no visible tokens differ by convention (oracle: uniform over
    # all, kernel: 0) — compare only rows that attend something.
    visible = (lo[None, :] <= np.arange(R)[:, None]) & (
        np.arange(R)[:, None] < hi[None, :]
    )
    live_rows = visible.any(axis=1)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(np.asarray(got)[live_rows], np.asarray(want)[live_rows]) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_seq_kernel_vs_oracle(dtype):
    rng = np.random.default_rng(7)
    R, Hq, Hkv, D, C = 16, 8, 2, 64, 384
    qpk = Hq // Hkv
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    kt = jnp.asarray(rng.standard_normal((R, C, Hkv, D)), dtype)
    vt = jnp.asarray(rng.standard_normal((R, C, Hkv, D)), dtype)
    seq_lens = jnp.asarray(
        rng.integers(1, C + 1, size=R).astype(np.int32)
    )
    scale = D**-0.5

    # oracle: per-leaf dense attention over its own prefix
    kx = jnp.repeat(kt, qpk, axis=2)
    vx = jnp.repeat(vt, qpk, axis=2)
    s = jnp.einsum(
        "rhd,rthd->rht", q.astype(jnp.float32), kx.astype(jnp.float32)
    ) * scale
    t = jnp.arange(C)[None, :] < seq_lens[:, None]
    s = jnp.where(t[:, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("rht,rthd->rhd", p, vx.astype(jnp.float32))

    got = seq_attention(
        q.reshape(R, Hkv, qpk, D),
        jnp.swapaxes(kt, 1, 2),
        jnp.swapaxes(vt, 1, 2),
        seq_lens,
        scale=scale,
    ).reshape(R, Hq, D)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(got, want) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "N,Hq,Hkv,D,bm,bn",
    [
        (256, 8, 2, 64, 0, 0),
        (128, 32, 8, 128, 0, 0),
        # big-tile default (BM=512) with mask-free interior blocks engaged
        (1024, 8, 2, 64, 0, 0),
        # explicit tile sweep (the kernel-lab tuning surface)
        (1024, 8, 2, 64, 128, 128),
        (1024, 8, 2, 64, 512, 256),
    ],
)
def test_prefill_kernel_vs_oracle(dtype, N, Hq, Hkv, D, bm, bn):
    rng = np.random.default_rng(N)
    q = jnp.asarray(rng.standard_normal((N, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((N, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((N, Hkv, D)), dtype)
    scale = D**-0.5
    want = dense_causal_attention(q, k, v, scale)
    got = unfold_o(
        prefill_attention(
            fold_q(q, Hkv),
            jnp.swapaxes(k, 0, 1),
            jnp.swapaxes(v, 0, 1),
            scale=scale,
            qpk=Hq // Hkv,
            bm=bm,
            bn=bn,
        ),
        N,
    )
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(got, want) < tol


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_paged_flatten_kernel_vs_oracle(dtype):
    """In-kernel DMA gather path vs the dense oracle, on a real tree with a
    chunked pool (interpret mode)."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention
    from deft_tpu.plan import build_flatten_plan

    rng = np.random.default_rng(3)
    Hq, Hkv, D = 8, 2, 64
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(100)))
    for i, c in enumerate(tree.branch(tree.root, 5)):
        c.append_token(50 + i)
    for _ in range(40):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    # prune one branch to fragment the pool a bit
    tree.cut(sorted(tree.leaves.values(), key=lambda x: x.id)[0])
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=Hq // Hkv, min_token_bucket=256)
    assert plan.paged, "plan should be seg-aligned on a chunked pool"

    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5

    kt = k_pool[0][plan.kv_idx].reshape(-1, Hkv, D)  # (T, Hkv, D)
    vt = v_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )

    got = unfold_o(
        paged_flatten_attention(
            fold_q(q, Hkv), k_pool, v_pool,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(plan.seg_src),
            jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
            jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_hi),
            scale=scale, qpk=Hq // Hkv,
            block_len=plan.block_len, seg_len=plan.seg_len,
        ),
        R,
    )
    live = np.arange(R) < plan.n_leaves
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < tol


def test_paged_flatten_q_split_exact(monkeypatch):
    """DEFT_MAX_RQ query-axis chunking (big-Rq compile workaround) must be
    bit-identical to the single-call kernel, including FULL-sentinel
    blocks (the leaf-interval shift is the dp-shard window's)."""
    from types import SimpleNamespace

    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attn_pallas
    from deft_tpu.plan import build_flatten_plan
    from deft_tpu.plan.flatten import FULL_BLOCK_LO

    rng = np.random.default_rng(0)
    Hq, Hkv, D = 8, 2, 64
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(1200)))
    for i, c in enumerate(tree.branch(tree.root, 16)):
        c.append_token(30 + i)
    for _ in range(6):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=Hq // Hkv, min_token_bucket=256)
    assert plan.paged
    S = tree.token_to_kv_pool.size
    kp = SimpleNamespace(quantized=False, data=jnp.asarray(
        rng.standard_normal((1, S, Hkv * D)), jnp.float32))
    vp = SimpleNamespace(quantized=False, data=jnp.asarray(
        rng.standard_normal((1, S, Hkv * D)), jnp.float32))
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    nb = plan.t_pad // plan.block_len
    tl = plan.tok_lo.reshape(nb, -1)
    th = plan.tok_hi.reshape(nb, -1)
    full = (tl == 0).all(1) & (th == plan.n_leaves).all(1)
    assert full.any(), "case must exercise the FULL sentinel"
    batch = SimpleNamespace(
        seg_src=jnp.asarray(plan.seg_src),
        tok_lo=jnp.asarray(plan.tok_lo), tok_hi=jnp.asarray(plan.tok_hi),
        blk_lo=jnp.asarray(np.where(full, FULL_BLOCK_LO, plan.blk_lo)),
        blk_hi=jnp.asarray(plan.blk_hi))
    li = jnp.asarray(0, jnp.int32)
    monkeypatch.setenv("DEFT_MAX_RQ", "0")
    ref = np.asarray(paged_flatten_attn_pallas(
        q, None, None, kp, vp, li, batch, D ** -0.5))
    monkeypatch.setenv("DEFT_MAX_RQ", "16")
    got = np.asarray(paged_flatten_attn_pallas(
        q, None, None, kp, vp, li, batch, D ** -0.5))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_paged_tree_index_kernel_vs_oracle():
    """tree_index plans (TreeIndexPool-row sourced, node-aligned) must ride
    the same in-kernel DMA path as node plans and match the dense oracle —
    the VERDICT r4 weak-2 fix (tree_index used to fall to the XLA gather)."""
    from deft_tpu.core import (ReqToTokenPool, TokenKVPool, TreeCache,
                               TreeIndexPool)
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention
    from deft_tpu.plan import build_tree_index_plan

    rng = np.random.default_rng(5)
    Hq, Hkv, D = 8, 2, 64
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048),
                     TreeIndexPool(64, 2048))
    tree.init_prompt(list(range(150)))
    for i, c in enumerate(tree.branch(tree.root, 4)):
        c.append_token(50 + i)
    for _ in range(30):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.cut(sorted(tree.leaves.values(), key=lambda x: x.id)[0])
    tree.alloc()
    plan = build_tree_index_plan(tree, q_per_kv=Hq // Hkv,
                                 min_token_bucket=256)
    assert plan.paged, "tree_index plan should be seg-aligned (paged)"

    S = tree.token_to_kv_pool.size
    dtype = jnp.float32
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5

    kt = k_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    vt = v_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )
    got = unfold_o(
        paged_flatten_attention(
            fold_q(q, Hkv), k_pool, v_pool,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(plan.seg_src),
            jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
            jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_hi),
            scale=scale, qpk=Hq // Hkv,
            block_len=plan.block_len, seg_len=plan.seg_len,
        ),
        R,
    )
    live = np.arange(R) < plan.n_leaves
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < 2e-5


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_paged_quant_kernel_vs_dequant_oracle(dtype):
    """int8 paged kernel must match the XLA dequant-gather oracle exactly
    (same quantized values in, same math)."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.models.llama import KVPool, kv_gather_heads
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_quant import paged_flatten_attention_q
    from deft_tpu.plan import build_flatten_plan

    rng = np.random.default_rng(5)
    Hq, Hkv, D = 8, 2, 64
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(150)))
    for i, c in enumerate(tree.branch(tree.root, 4)):
        c.append_token(50 + i)
    for _ in range(30):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=Hq // Hkv, min_token_bucket=256)
    assert plan.paged

    S = tree.token_to_kv_pool.size
    kd = rng.integers(-127, 128, (1, S, Hkv * D)).astype(np.int8)
    vd = rng.integers(-127, 128, (1, S, Hkv * D)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (1, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (1, Hkv, S)).astype(np.float32)
    k_pool = KVPool(jnp.asarray(kd), jnp.asarray(ks))
    v_pool = KVPool(jnp.asarray(vd), jnp.asarray(vs))
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5

    kt = kv_gather_heads(k_pool, 0, plan.kv_idx, D, jnp.float32)
    vt = kv_gather_heads(v_pool, 0, plan.kv_idx, D, jnp.float32)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )

    got = unfold_o(
        paged_flatten_attention_q(
            fold_q(q, Hkv), k_pool.data, v_pool.data,
            k_pool.scale, v_pool.scale,
            jnp.asarray(0, jnp.int32), jnp.asarray(plan.seg_src),
            jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
            jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_hi),
            scale=scale, qpk=Hq // Hkv,
            block_len=plan.block_len, seg_len=plan.seg_len,
        ),
        R,
    )
    live = np.arange(R) < plan.n_leaves
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < 2e-5


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_paged_seq_kernel_vs_oracle(dtype):
    """Fair seq baseline: in-kernel paged per-leaf path reads
    (ops/paged_seq_attn.py) vs the dense per-leaf oracle, on a real tree
    with a chunked pool (interpret mode)."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.paged_seq_attn import paged_seq_attention
    from deft_tpu.plan.seq import build_seq_plan

    rng = np.random.default_rng(11)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(150)))
    for i, c in enumerate(tree.branch(tree.root, 4)):
        c.append_token(50 + i)
    for _ in range(30):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    # one more generation iteration that branches one leaf, appends the
    # rest, and prunes another — fragmenting the pool runs.  Order matches
    # the decode loop: alloc (KV catches up), then structural edits.
    tree.alloc()
    deep = sorted(tree.leaves.values(), key=lambda x: x.id)[0]
    new_children = tree.branch(deep, 2)
    for i, c in enumerate(new_children):
        c.append_token(60 + i)
    new_ids = {c.id for c in new_children}
    for leaf in list(tree.leaves.values()):
        if leaf.id not in new_ids:
            leaf.append_token(int(rng.integers(1, 400)))
    tree.cut(sorted(tree.leaves.values(), key=lambda x: x.id)[-1])
    tree.alloc()
    plan = build_seq_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    assert plan.paged, "plan should be seg-aligned on a chunked pool"

    # plan property: seg tables reconstruct exactly the page-table paths
    seg = plan.seg_len
    nseg_tot = len(plan.seg_src) // plan.l_pad
    src = plan.seg_src.reshape(plan.l_pad, nseg_tot)
    offc = plan.seg_off.reshape(plan.l_pad, nseg_tot)
    livec = plan.seg_live.reshape(plan.l_pad, nseg_tot)
    assert not (src % seg).any(), "segment sources must be seg-aligned"
    for leaf in tree.leaves.values():
        q_i = tree.leaf_to_q[leaf.id]
        got_path = np.concatenate([
            np.arange(src[q_i, j] + offc[q_i, j],
                      src[q_i, j] + offc[q_i, j] + livec[q_i, j])
            for j in range(nseg_tot) if livec[q_i, j]
        ])
        req = tree.leaf_to_req[leaf.id]
        n = leaf.positions[-1] + 1
        want_path = tree.req_to_token_pool.req_to_token[req, :n]
        np.testing.assert_array_equal(got_path, want_path)

    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5

    got = paged_seq_attention(
        q.reshape(R, Hkv, qpk, D),
        k_pool, v_pool,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(plan.seg_src),
        jnp.asarray(plan.seg_off),
        jnp.asarray(plan.seg_live),
        jnp.asarray(plan.blk_live),
        scale=scale,
        block_len=plan.c_pad // (len(plan.blk_live) // R),
        seg_len=plan.seg_len,
    ).reshape(R, Hq, D)

    # oracle: per-leaf dense attention over its true path
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    qn = np.asarray(q, np.float64)
    kp = np.asarray(k_pool[0], np.float64).reshape(S, Hkv, D)
    vp = np.asarray(v_pool[0], np.float64).reshape(S, Hkv, D)
    for leaf in tree.leaves.values():
        q_i = tree.leaf_to_q[leaf.id]
        req = tree.leaf_to_req[leaf.id]
        n = leaf.positions[-1] + 1
        path = tree.req_to_token_pool.req_to_token[req, :n]
        for h in range(Hq):
            kh = kp[path, h // qpk]           # (n, D)
            vh = vp[path, h // qpk]
            s = (qn[q_i, h] @ kh.T) * scale
            p = np.exp(s - s.max())
            want = (p / p.sum()) @ vh
            err = np.abs(np.asarray(got[q_i, h], np.float64) - want).max()
            assert err / max(np.abs(want).max(), 1e-9) < tol, (q_i, h, err)


def test_paged_seq_quant_kernel_vs_dequant_oracle():
    """int8-KV paged seq kernel (dequant-in-kernel, lane-wise scales) must
    match the per-leaf dense oracle over the DEQUANTIZED pool values —
    the fair int8 baseline for int8-KV flatten-vs-seq comparisons."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.paged_seq_attn import paged_seq_attention_q
    from deft_tpu.plan.seq import build_seq_plan

    rng = np.random.default_rng(13)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(150)))
    for i, c in enumerate(tree.branch(tree.root, 4)):
        c.append_token(50 + i)
    for _ in range(10):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_seq_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    assert plan.paged

    S = tree.token_to_kv_pool.size
    kd = rng.integers(-127, 128, (1, S, Hkv * D)).astype(np.int8)
    vd = rng.integers(-127, 128, (1, S, Hkv * D)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (1, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (1, Hkv, S)).astype(np.float32)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    scale = D**-0.5

    got = paged_seq_attention_q(
        q.reshape(R, Hkv, qpk, D),
        jnp.asarray(kd), jnp.asarray(vd), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(plan.seg_src),
        jnp.asarray(plan.seg_off),
        jnp.asarray(plan.seg_live),
        jnp.asarray(plan.blk_live),
        scale=scale,
        block_len=plan.c_pad // (len(plan.blk_live) // R),
        seg_len=plan.seg_len,
    ).reshape(R, Hq, D)

    qn = np.asarray(q, np.float64)
    kp = (kd[0].astype(np.float64).reshape(S, Hkv, D)
          * ks[0].T[:, :, None])
    vp = (vd[0].astype(np.float64).reshape(S, Hkv, D)
          * vs[0].T[:, :, None])
    for leaf in tree.leaves.values():
        q_i = tree.leaf_to_q[leaf.id]
        req = tree.leaf_to_req[leaf.id]
        n = leaf.positions[-1] + 1
        path = tree.req_to_token_pool.req_to_token[req, :n]
        for h in range(Hq):
            s = (qn[q_i, h] @ kp[path, h // qpk].T) * scale
            p = np.exp(s - s.max())
            want = (p / p.sum()) @ vp[path, h // qpk]
            err = np.abs(np.asarray(got[q_i, h], np.float64) - want).max()
            assert err / max(np.abs(want).max(), 1e-9) < 2e-5, (q_i, h, err)


def test_paged_seq_kernel_unaligned_spec_decode_shape():
    """Speculative-decoding trees give every leaf 1-token KV runs at
    ARBITRARY (unaligned) pool offsets; the plan must still take the
    in-kernel paged path (fair baseline, VERDICT round 1 #2) by covering
    them with ALIGNED segments + in-segment live offsets (seg_off), and
    the kernel must mask the lead-in garbage correctly."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.paged_seq_attn import paged_seq_attention
    from deft_tpu.plan.seq import build_seq_plan

    rng = np.random.default_rng(5)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    width = 16
    tree = TreeCache(TokenKVPool(16384), ReqToTokenPool(64, 4096))
    tree.init_prompt(list(range(300)))
    for i, c in enumerate(tree.branch(tree.root, width)):
        c.append_token(50 + i)
    tree.alloc()
    # merge-accept cycles: root grows, leaves reset to 1-token runs at
    # arbitrary offsets (the reference mock, branch_func_example.py:374-442)
    for _ in range(3):
        leaves = list(tree.leaves.values())
        kv_before = tree.root.kv_len
        for i in range(2):
            tree.merge_nodes(tree.root, leaves[i], prune_b=False)
        diff = tree.root.kv_len - kv_before
        for leaf in leaves:
            tree.reset_node_KV(leaf, diff)
        tree.sync_page_table()
        tree.alloc()
    plan = build_seq_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    assert plan.paged, "spec-decode shape must stay on the paged baseline"
    # sources stay aligned; unaligned runs appear as nonzero live offsets
    assert not (plan.seg_src % plan.seg_len).any()
    assert (plan.seg_off[plan.seg_live > 0] > 0).any()

    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    scale = D**-0.5
    got = paged_seq_attention(
        q.reshape(R, Hkv, qpk, D), k_pool, v_pool,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(plan.seg_src), jnp.asarray(plan.seg_off),
        jnp.asarray(plan.seg_live), jnp.asarray(plan.blk_live),
        scale=scale,
        block_len=plan.c_pad // (len(plan.blk_live) // R),
        seg_len=plan.seg_len,
    ).reshape(R, Hq, D)

    qn = np.asarray(q, np.float64)
    kp = np.asarray(k_pool[0], np.float64).reshape(S, Hkv, D)
    vp = np.asarray(v_pool[0], np.float64).reshape(S, Hkv, D)
    for leaf in tree.leaves.values():
        q_i = tree.leaf_to_q[leaf.id]
        req = tree.leaf_to_req[leaf.id]
        n = leaf.positions[-1] + 1
        path = tree.req_to_token_pool.req_to_token[req, :n]
        for h in range(Hq):
            s = (qn[q_i, h] @ kp[path, h // qpk].T) * scale
            p = np.exp(s - s.max())
            want = (p / p.sum()) @ vp[path, h // qpk]
            err = np.abs(np.asarray(got[q_i, h], np.float64) - want).max()
            assert err / max(np.abs(want).max(), 1e-9) < 2e-5, (q_i, h, err)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "lens,Hq,Hkv,D",
    [
        ((60, 83, 100), 8, 2, 64),
        ((128, 72), 32, 8, 128),
        # long segments so same-segment interior (mask-free) blocks engage
        ((500, 300, 200), 8, 2, 64),
    ],
)
def test_ragged_prefill_kernel_vs_oracle(dtype, lens, Hq, Hkv, D):
    """Segment-masked ragged prefill == dense ragged oracle; padded tail rows
    are excluded (their outputs are garbage by contract)."""
    from deft_tpu.ops.dense_oracle import dense_ragged_causal_attention
    from deft_tpu.ops.prefill import ragged_prefill_attention

    N = max(256, -(-sum(lens) // 128) * 128)  # padded total (mult of 128)
    assert sum(lens) <= N
    rng = np.random.default_rng(sum(lens))
    q = jnp.asarray(rng.standard_normal((N, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((N, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((N, Hkv, D)), dtype)
    seg = np.full(N, -1, dtype=np.int32)
    o = 0
    for i, n in enumerate(lens):
        seg[o:o + n] = i
        o += n
    seg = jnp.asarray(seg)
    scale = D**-0.5
    want = dense_ragged_causal_attention(q, k, v, seg, scale)
    got = unfold_o(
        ragged_prefill_attention(
            fold_q(q, Hkv),
            jnp.swapaxes(k, 0, 1),
            jnp.swapaxes(v, 0, 1),
            seg,
            scale=scale,
            qpk=Hq // Hkv,
        ),
        N,
    )
    live = np.asarray(seg) >= 0
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < tol


@pytest.mark.parametrize("R,H,I", [(8, 128, 256), (64, 512, 1536), (16, 256, 513)])
def test_int8_matmul_kernel_vs_reference(R, H, I):
    """Weight-streaming int8 matmul (interpret mode) vs the XLA dequant
    expression; the (16, 256, 513) case exercises the ineligible fallback."""
    from deft_tpu.ops import int8_matmul as i8mm

    rng = np.random.default_rng(R + H + I)
    x = jnp.asarray(rng.standard_normal((R, H)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (H, I)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.01, 0.1, (I,)), jnp.float32)

    want = np.asarray(
        (x @ w.astype(jnp.float32)) * s, np.float64
    )
    if i8mm.eligible(x, w):
        got = np.asarray(i8mm.int8_matmul(x, w, s), np.float64)
    else:
        assert I == 513  # non-tileable out dim -> callers fall back
        return
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    assert err < 2e-6, err


def test_head_pack_divisor_and_odd_kv_heads_kernel():
    """head_pack must return a divisor of num_kv_heads (a non-divisor pack
    overruns the last lane group's slice); the paged flatten kernel must be
    numerically correct for an odd KV-head count with head_dim < 128."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.flatten_attn import fold_q, head_pack, unfold_o
    from deft_tpu.ops.paged_flatten_attn import paged_flatten_attention
    from deft_tpu.plan import build_flatten_plan

    assert head_pack(64, 3) == 1       # 128//64=2 does not divide 3
    assert head_pack(64, 2) == 2
    assert head_pack(32, 6) == 3       # 128//32=4 -> largest divisor is 3
    assert head_pack(128, 8) == 1
    assert head_pack(32, 8) == 4

    rng = np.random.default_rng(3)
    Hq, Hkv, D = 6, 3, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(200)))
    for i, c in enumerate(tree.branch(tree.root, 4)):
        c.append_token(50 + i)
    for _ in range(20):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    assert plan.paged
    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), jnp.float32)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    scale = D**-0.5
    got = np.asarray(unfold_o(paged_flatten_attention(
        fold_q(q, Hkv), k_pool, v_pool, jnp.asarray(0, jnp.int32),
        jnp.asarray(plan.seg_src), jnp.asarray(plan.tok_lo),
        jnp.asarray(plan.tok_hi), jnp.asarray(plan.blk_lo),
        jnp.asarray(plan.blk_hi), scale=scale, qpk=qpk,
        block_len=plan.block_len, seg_len=plan.seg_len), R))
    qn = np.asarray(q, np.float64)
    kp = np.asarray(k_pool[0], np.float64).reshape(S, Hkv, D)
    vp = np.asarray(v_pool[0], np.float64).reshape(S, Hkv, D)
    for leaf in tree.leaves.values():
        qi = tree.leaf_to_q[leaf.id]
        req = tree.leaf_to_req[leaf.id]
        n = leaf.positions[-1] + 1
        path = tree.req_to_token_pool.req_to_token[req, :n]
        for h in range(Hq):
            s = (qn[qi, h] @ kp[path, h // qpk].T) * scale
            p = np.exp(s - s.max())
            want = (p / p.sum()) @ vp[path, h // qpk]
            err = np.abs(got[qi, h] - want).max()
            assert err / max(np.abs(want).max(), 1e-9) < 2e-5, (qi, h, err)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("qwin", [-1, 8, 64])
def test_paged_flatten_narrow_q_window_vs_oracle(dtype, qwin):
    """The narrow-q fast path (blocks serving few leaves update only a
    qwin-row window — VERDICT r3 item 7) must be EXACT: a deep tree whose
    per-leaf suffix runs dominate produces many narrow blocks, and the
    kernel output must match the dense oracle for every window size,
    including the full-path-only baseline (qwin large ~ disabled)."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_flatten_attn import (
        paged_flatten_attention, paged_flatten_attention_partial)
    from deft_tpu.plan import build_flatten_plan

    rng = np.random.default_rng(11)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(16384), ReqToTokenPool(64, 4096))
    tree.init_prompt(list(range(120)))
    for i, c in enumerate(tree.branch(tree.root, 16)):
        c.append_token(50 + i)
    for _ in range(150):  # long per-leaf suffixes -> narrow blocks
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=qpk, block_len=128,
                              min_token_bucket=256)
    assert plan.paged
    R = plan.l_pad
    rq = R * qpk
    eff_qwin = min(rq, max(16, 8 * qpk) if qwin < 0 else qwin)
    r0 = np.clip((plan.blk_lo * qpk) // 8 * 8, 0, rq - eff_qwin)
    narrow = (plan.blk_hi * qpk - r0 <= eff_qwin) & (plan.blk_lo < plan.blk_hi)
    if eff_qwin < rq:
        assert narrow.sum() >= 5, "test tree must produce narrow blocks"

    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5
    kt = k_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    vt = v_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )
    args = (fold_q(q, Hkv), k_pool, v_pool, jnp.asarray(0, jnp.int32),
            jnp.asarray(plan.seg_src), jnp.asarray(plan.tok_lo),
            jnp.asarray(plan.tok_hi), jnp.asarray(plan.blk_lo),
            jnp.asarray(plan.blk_hi))
    kw = dict(scale=scale, qpk=qpk, block_len=plan.block_len,
              seg_len=plan.seg_len, qwin=qwin)
    got = unfold_o(paged_flatten_attention(*args, **kw), R)
    live = np.arange(R) < plan.n_leaves
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < tol

    # the partial (mesh) variant takes the same fast path
    acc, m, l = paged_flatten_attention_partial(*args, **kw)
    o = np.asarray(acc) / np.where(np.asarray(l) == 0.0, 1.0,
                                   np.asarray(l))
    got_p = unfold_o(jnp.asarray(o, jnp.float32), R)
    assert rel_err(np.asarray(got_p)[live], np.asarray(want)[live]) < tol


@pytest.mark.parametrize("qwin", [-1, 8])
def test_paged_quant_narrow_q_window_vs_oracle(qwin):
    """int8 variant of the narrow-q window path (separate kernel code in
    ops/paged_quant.py): deep per-leaf suffixes, kernel vs the XLA
    dequant-gather oracle."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.models.llama import KVPool, kv_gather_heads
    from deft_tpu.ops.paged_quant import paged_flatten_attention_q
    from deft_tpu.plan import build_flatten_plan

    rng = np.random.default_rng(13)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(16384), ReqToTokenPool(64, 4096))
    tree.init_prompt(list(range(130)))
    for i, c in enumerate(tree.branch(tree.root, 16)):
        c.append_token(50 + i)
    for _ in range(140):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=qpk, block_len=128,
                              min_token_bucket=256, seg_len=(128,),
                              waste_limit=3.0)
    assert plan.paged and plan.seg_len == 128
    R = plan.l_pad
    assert R * qpk > 32  # narrow path enabled under the auto policy

    S = tree.token_to_kv_pool.size
    kq = rng.integers(-127, 128, size=(1, S, Hkv * D)).astype(np.int8)
    vq = rng.integers(-127, 128, size=(1, S, Hkv * D)).astype(np.int8)
    ks = (rng.random((1, Hkv, S)) * 0.02 + 0.001).astype(np.float32)
    vs = (rng.random((1, Hkv, S)) * 0.02 + 0.001).astype(np.float32)
    k_pool = KVPool(jnp.asarray(kq), jnp.asarray(ks))
    v_pool = KVPool(jnp.asarray(vq), jnp.asarray(vs))
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    scale = D**-0.5
    kt = kv_gather_heads(k_pool, 0, jnp.asarray(plan.kv_idx), D, jnp.float32)
    vt = kv_gather_heads(v_pool, 0, jnp.asarray(plan.kv_idx), D, jnp.float32)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )
    got = unfold_o(
        paged_flatten_attention_q(
            fold_q(q, Hkv), k_pool.data, v_pool.data,
            k_pool.scale, v_pool.scale,
            jnp.asarray(0, jnp.int32), jnp.asarray(plan.seg_src),
            jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
            jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_hi),
            scale=scale, qpk=qpk,
            block_len=plan.block_len, seg_len=plan.seg_len, qwin=qwin,
        ),
        R,
    )
    live = np.arange(R) < plan.n_leaves
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < 2e-4


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_paged_flatten_full_block_sentinel_vs_oracle(dtype):
    """Mask-free FULL-block fast path (blk_lo = FULL_BLOCK_LO plan sentinel,
    threshold-tested): a long
    shared prompt yields whole blocks where every token is live with
    interval [0, n_leaves); the plan must mark them and the kernels (bf16,
    int8, and the mesh partial variant) must stay exact — including the
    padded q rows beyond n_leaves, whose unmasked garbage must not leak
    into live rows."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache
    from deft_tpu.models.llama import KVPool, kv_gather_heads
    from deft_tpu.ops.flatten_attn import fold_q, unfold_o
    from deft_tpu.ops.paged_flatten_attn import (
        paged_flatten_attention, paged_flatten_attention_partial)
    from deft_tpu.ops.paged_quant import paged_flatten_attention_q
    from deft_tpu.plan import build_flatten_plan

    rng = np.random.default_rng(17)
    Hq, Hkv, D = 8, 2, 64
    qpk = Hq // Hkv
    tree = TreeCache(TokenKVPool(8192), ReqToTokenPool(64, 2048))
    tree.init_prompt(list(range(450)))  # >= 3 full 128-token blocks
    for i, c in enumerate(tree.branch(tree.root, 5)):
        c.append_token(50 + i)
    for _ in range(10):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 400)))
    tree.alloc()
    plan = build_flatten_plan(tree, q_per_kv=qpk, min_token_bucket=256)
    assert plan.paged
    assert (plan.blk_lo < -(1 << 20)).sum() >= 3, \
        "prompt must yield full blocks"
    assert plan.l_pad > plan.n_leaves, "padded q rows must exist"

    S = tree.token_to_kv_pool.size
    k_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((1, S, Hkv * D)), dtype)
    R = plan.l_pad
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), dtype)
    scale = D**-0.5
    kt = k_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    vt = v_pool[0][plan.kv_idx].reshape(-1, Hkv, D)
    want = dense_tree_attention(
        q, kt, vt, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi), scale
    )
    args = (fold_q(q, Hkv), k_pool, v_pool, jnp.asarray(0, jnp.int32),
            jnp.asarray(plan.seg_src), jnp.asarray(plan.tok_lo),
            jnp.asarray(plan.tok_hi), jnp.asarray(plan.blk_lo),
            jnp.asarray(plan.blk_hi))
    kw = dict(scale=scale, qpk=qpk, block_len=plan.block_len,
              seg_len=plan.seg_len)
    live = np.arange(R) < plan.n_leaves
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    got = unfold_o(paged_flatten_attention(*args, **kw), R)
    assert rel_err(np.asarray(got)[live], np.asarray(want)[live]) < tol

    acc, m, l = paged_flatten_attention_partial(*args, **kw)
    o = np.asarray(acc) / np.where(np.asarray(l) == 0.0, 1.0, np.asarray(l))
    got_p = unfold_o(jnp.asarray(o, jnp.float32), R)
    assert rel_err(np.asarray(got_p)[live], np.asarray(want)[live]) < tol

    if dtype == jnp.float32:
        kq = rng.integers(-127, 128, size=(1, S, Hkv * D)).astype(np.int8)
        vq = rng.integers(-127, 128, size=(1, S, Hkv * D)).astype(np.int8)
        ks = (rng.random((1, Hkv, S)) * 0.02 + 0.001).astype(np.float32)
        vs = (rng.random((1, Hkv, S)) * 0.02 + 0.001).astype(np.float32)
        kp = KVPool(jnp.asarray(kq), jnp.asarray(ks))
        vp = KVPool(jnp.asarray(vq), jnp.asarray(vs))
        ktd = kv_gather_heads(kp, 0, jnp.asarray(plan.kv_idx), D, jnp.float32)
        vtd = kv_gather_heads(vp, 0, jnp.asarray(plan.kv_idx), D, jnp.float32)
        want_q = dense_tree_attention(
            q, ktd, vtd, jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
            scale)
        got_q = unfold_o(
            paged_flatten_attention_q(
                fold_q(q, Hkv), kp.data, vp.data, kp.scale, vp.scale,
                jnp.asarray(0, jnp.int32), jnp.asarray(plan.seg_src),
                jnp.asarray(plan.tok_lo), jnp.asarray(plan.tok_hi),
                jnp.asarray(plan.blk_lo), jnp.asarray(plan.blk_hi), **kw),
            R)
        assert rel_err(np.asarray(got_q)[live],
                       np.asarray(want_q)[live]) < 2e-4

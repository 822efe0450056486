"""End-to-end generation on a tiny random-weight model (CPU, XLA attention):
the permanent correctness harness.

- decode-step logits must match a fresh full-sequence prefill of the same
  root-to-leaf path (validates pools, rope positions, GQA, masking);
- all forward modes must generate identical tokens (attention is exact);
- the four workloads must run the full protocol.
"""

import numpy as np
import pytest

from deft_tpu.config import AttentionConfig, EngineConfig
from deft_tpu.control import Branch_Controller, workloads
from deft_tpu.data.loader import ExecuteTree, ExecuteTreeNode
from deft_tpu.models import PRESETS
from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

ECFG = EngineConfig(
    kv_pool_slots=4096,
    max_requests=64,
    max_context_len=512,
    min_token_bucket=128,
    dtype="float32",  # tight tolerances for numerics tests
)


def make_runner(**kw):
    kw.setdefault("engine_config", ECFG)
    kw.setdefault("kernels", "xla")
    kw.setdefault("retain_full_logits", True)
    return ModelRunner(PRESETS["tiny"], **kw)


PROMPT = list(range(7, 19))  # 12 tokens


def test_decode_matches_full_prefill():
    """Each leaf's decode logits == prefill logits of its full path."""
    runner = make_runner()
    view = runner.forward_prefill(PROMPT)
    tree = runner.tree
    # branch into 3, give each a distinct token
    _, ids0 = view.topk(0, 3)
    children = tree.branch(tree.root, 3)
    for c, child in enumerate(children):
        child.append_token(int(ids0[c]))
    # two greedy steps
    per_leaf_logits = None
    for _ in range(2):
        tree.alloc()
        plan = runner.build_plan(ForwardMode.TREE_DECODE_FLATTEN)
        lv, _ = runner.forward_tree_decode(ForwardMode.TREE_DECODE_FLATTEN, plan)
        ids, _ = lv.argmax()
        per_leaf_logits = lv
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(ids[tree.leaf_to_q[leaf.id]]))

    # oracle: prefill each full path (minus last unexecuted token) fresh
    oracle = make_runner()
    for leaf in tree.leaves.values():
        q = tree.leaf_to_q[leaf.id]
        path = []
        node = leaf
        chain = []
        while node is not None:
            chain.append(node)
            node = node.parent
        for node in reversed(chain):
            path.extend(node.token_ids)
        # decode step consumed path[:-1] (last token appended after decode)
        oracle.reset_state()
        oview = oracle.forward_prefill(path[:-1])
        assert per_leaf_logits.topk(q, 1)[1][0] == oview.topk(0, 1)[1][0]
        got = per_leaf_logits.full_probs()[q]
        want = oview.full_probs()[0]
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)


MODES = [
    ForwardMode.TREE_DECODE_FLATTEN,
    ForwardMode.DECODE,
    ForwardMode.TREE_DECODE_NODE,
    ForwardMode.TREE_DECODE_INDEX_NODE,
    ForwardMode.UNPAGED_MEDUSA,
    ForwardMode.UNPAGED_DEFT_FLATTEN,
    ForwardMode.UNPAGED_FD,
]


def run_simple(mode, **kw):
    runner = make_runner(use_tree_index=True, **kw)
    bc = Branch_Controller(workloads.simple_tree)
    pm = tree_generate(
        runner, mode, None, PROMPT, max_seq_len=24, width=3, depth=0,
        branch_controller=bc,
    )
    return [tuple(s.token_ids) for s in runner.tree.all_finished_seqs], pm


def test_cross_mode_equivalence():
    """All modes are the same exact attention => identical generations."""
    # max_gen_len=12: one token at prefill branching + 10 greedy appends
    # (the final iteration outputs without appending, like the reference).
    ref, _ = run_simple(ForwardMode.TREE_DECODE_FLATTEN)
    assert len(ref) == 3 and all(len(t) == 11 for t in ref)
    for mode in MODES[1:]:
        got, _ = run_simple(mode)
        assert got == ref, f"{mode} diverged from flatten"


def test_workload_practical_tree():
    # depth-2 template: root branches into 2 at iter 0; node 1 branches into
    # 2 at iter 3; everything prunes at iter 6.
    root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
    n1 = ExecuteTreeNode(1, value=3, start_offset=0, end_offset=3)
    n2 = ExecuteTreeNode(2, value=6, start_offset=0, end_offset=6)
    n3 = ExecuteTreeNode(3, value=3, start_offset=3, end_offset=6)
    n4 = ExecuteTreeNode(4, value=3, start_offset=3, end_offset=6)
    root.children = [n1, n2]
    n1.children = [n3, n4]
    tpl = ExecuteTree(root, [root, n1, n2, n3, n4])
    assert tpl.branch_record[0] == {0: [1, 2]}
    assert tpl.branch_record[3] == {1: [3, 4]}
    assert 0 in tpl.prune_record[6]

    runner = make_runner()
    bc = Branch_Controller(workloads.practical_tree)
    pm = tree_generate(
        runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
        max_seq_len=12 + 8, width=2, depth=2, branch_controller=bc,
        tree_template=tpl,
    )
    seqs = runner.tree.all_finished_seqs
    assert len(seqs) == 3  # leaves: n2, n3, n4 paths
    assert pm.generated_len > 0


def test_workload_speculative_decoding():
    tpl = ExecuteTree(ExecuteTreeNode(0), [ExecuteTreeNode(i) for i in range(8)])
    tpl.accepted_len_list = [2, 1, 3]
    runner = make_runner(topk_k=16)
    bc = Branch_Controller(workloads.speculative_decoding)
    tree_generate(
        runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
        max_seq_len=12 + 32, width=8, depth=0, branch_controller=bc,
        tree_template=tpl,
    )
    assert len(runner.tree.all_finished_seqs) == 8


def test_speculative_skip_logits_matches_retained():
    """Spec-decode replay steps skip the lm_head entirely
    (logits_kind='skip') when full logits aren't retained; the replayed
    tree must be identical to the retained run, where retention overrides
    the skip (runner downgrades to 'topk')."""
    def run(retain):
        tpl = ExecuteTree(ExecuteTreeNode(0),
                          [ExecuteTreeNode(i) for i in range(8)])
        tpl.accepted_len_list = [2, 1, 3]
        runner = make_runner(topk_k=16, retain_full_logits=retain)
        bc = Branch_Controller(workloads.speculative_decoding)
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            max_seq_len=12 + 32, width=8, depth=0, branch_controller=bc,
            tree_template=tpl,
        )
        return sorted(tuple(s.token_ids)
                      for s in runner.tree.all_finished_seqs)

    assert run(False) == run(True)


def test_workload_beam_search():
    runner = make_runner()
    bc = Branch_Controller(workloads.beam_search)
    tree_generate(
        runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
        max_seq_len=24, width=4, depth=0, branch_controller=bc,
    )
    seqs = runner.tree.all_finished_seqs
    assert len(seqs) == 4
    assert all(len(s.token_ids) == 11 for s in seqs)


def test_pallas_interpret_e2e_matches_xla():
    """Full generation with the Pallas kernel path (interpret mode on CPU)
    must produce the same tokens as the XLA path — covers the runner's
    paged/gather kernel selection end-to-end."""
    results = {}
    for kernels in ("xla", "pallas"):
        runner = make_runner(kernels=kernels)
        from deft_tpu.control import Branch_Controller, workloads
        from deft_tpu.runtime import tree_generate

        tree_generate(
            model=runner,
            mode=ForwardMode.TREE_DECODE_FLATTEN,
            tokenizer=None,
            prompt_ids=PROMPT,
            max_seq_len=len(PROMPT) + 12,
            width=3,
            depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        # tree was freed by tree_generate; collect from finished seqs
        results[kernels] = sorted(
            tuple(b.token_ids) for b in runner.tree.all_finished_seqs
        )
    assert results["xla"] == results["pallas"]


def test_compact_plan_expansion():
    """Compact (run-table) plan uploads: the jitted unpack's on-device
    expansion must reproduce the host plan's tok_lo/tok_hi/seg_src and
    block metadata EXACTLY, for flatten, node and tree_index plans on a
    branched + pruned tree."""
    import jax
    import jax.numpy as jnp

    runner = make_runner(kernels="pallas", use_tree_index=True)
    assert runner._compact_plan
    rng = np.random.default_rng(0)
    # big enough that seg alignment passes the waste limit (tiny trees
    # legitimately fall back to the gather path)
    runner.forward_prefill([int(t) for t in rng.integers(4, 200, 300)])
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, 3)):
        c.append_token(20 + i)
    for step in range(6):
        tree.alloc()
        for leaf in list(tree.leaves.values()):
            leaf.append_token(int(rng.integers(1, 100)))
        if step == 3:
            tree.cut(sorted(tree.leaves.values(), key=lambda x: x.id)[0])
    tree.alloc()
    for mode in (ForwardMode.TREE_DECODE_FLATTEN, ForwardMode.TREE_DECODE_NODE,
                 ForwardMode.TREE_DECODE_INDEX_NODE):
        plan = runner.build_plan(mode)
        assert plan.paged and plan.run_table is not None, mode
        buf, sizes, paged = runner._pack_plan(mode, plan)
        assert paged and len(sizes) == 5, (mode, sizes)
        unpack = runner._make_unpack(mode.plan_kind, sizes, True, "none")
        batch = jax.jit(lambda b: unpack(b, None))(jnp.asarray(buf))
        np.testing.assert_array_equal(np.asarray(batch.tok_lo), plan.tok_lo)
        np.testing.assert_array_equal(np.asarray(batch.tok_hi), plan.tok_hi)
        np.testing.assert_array_equal(np.asarray(batch.seg_src), plan.seg_src)
        np.testing.assert_array_equal(np.asarray(batch.blk_lo), plan.blk_lo)
        np.testing.assert_array_equal(np.asarray(batch.blk_hi), plan.blk_hi)
        np.testing.assert_array_equal(np.asarray(batch.q_pos), plan.q_pos)
        np.testing.assert_array_equal(np.asarray(batch.out_loc), plan.out_loc)
        # the compact buffer beats the per-token packing even at toy scale
        # (at production scale it's ~100x: ~450 ints vs ~50k at p4000)
        full_len = (3 * plan.l_pad + 2 * plan.t_pad + 2 * plan.num_blocks
                    + len(plan.seg_src))
        assert len(buf) < full_len


def test_compact_plan_expansion_spec_shape():
    """Compact expansion on the speculative-decoding pool shape: merged
    accepts + group-span leaf realloc (TokenKVPool.alloc_group) produce
    coalesced multi-node runs and reset leaves — the trickiest layout the
    run table must reproduce exactly."""
    import jax
    import jax.numpy as jnp

    runner = make_runner(kernels="pallas")
    rng = np.random.default_rng(1)
    runner.forward_prefill([int(t) for t in rng.integers(4, 200, 300)])
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, 8)):
        c.append_token(20 + i)
    tree.alloc()
    for _ in range(2):
        leaves = list(tree.leaves.values())
        kv0 = tree.root.kv_len
        for i in range(2):
            tree.merge_nodes(tree.root, leaves[i], prune_b=False)
        diff = tree.root.kv_len - kv0
        for leaf in leaves:
            tree.reset_node_KV(leaf, diff)
        tree.sync_page_table()
        tree.alloc()
    runner.apply_kv_copies()
    mode = ForwardMode.TREE_DECODE_FLATTEN
    plan = runner.build_plan(mode)
    assert plan.paged and plan.run_table is not None
    buf, sizes, paged = runner._pack_plan(mode, plan)
    assert paged and len(sizes) == 5
    unpack = runner._make_unpack(mode.plan_kind, sizes, True, "none")
    batch = jax.jit(lambda b: unpack(b, None))(jnp.asarray(buf))
    np.testing.assert_array_equal(np.asarray(batch.tok_lo), plan.tok_lo)
    np.testing.assert_array_equal(np.asarray(batch.tok_hi), plan.tok_hi)
    np.testing.assert_array_equal(np.asarray(batch.seg_src), plan.seg_src)
    np.testing.assert_array_equal(np.asarray(batch.blk_lo), plan.blk_lo)
    np.testing.assert_array_equal(np.asarray(batch.blk_hi), plan.blk_hi)


def test_replay_exec_matches_per_step(monkeypatch):
    """Replay execution (record the host-deterministic span, execute from
    device-resident slabs — runtime/generate.py record path +
    runner.execute_recorded) must generate exactly the per-step pipeline's
    tokens for every replay-shaped workload: greedy few-shot, deferred-
    select ToT replay, and the speculative accept schedule (kv-copy
    slabs)."""
    from deft_tpu.data.loader import ExecuteTree, ExecuteTreeNode
    from deft_tpu.runtime.runner import ModelRunner as MR

    def run(workload, template, kernels="pallas", **gkw):
        r = make_runner(kernels=kernels, retain_full_logits=False)
        tree_generate(
            r, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            branch_controller=Branch_Controller(workload),
            tree_template=template, **gkw,
        )
        return ([tuple(s.token_ids) for s in r.tree.all_finished_seqs],
                r.plan_upload_bytes)

    def practical_template():
        root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
        n1 = ExecuteTreeNode(1, value=14, start_offset=0, end_offset=14)
        n2 = ExecuteTreeNode(2, value=20, start_offset=0, end_offset=20)
        root.children = [n1, n2]
        return ExecuteTree(root, [root, n1, n2])

    def spec_template():
        t = ExecuteTree(ExecuteTreeNode(0, value=1, start_offset=0,
                                        end_offset=0), [])
        t.node_num = 4
        t.accepted_len_list = [2, 1] * 7  # 14 accept steps: full 8-window
        return t

    cases = [
        # 40 greedy iters: a 32-scan-window + an 8-window (incl. a padded
        # short tail on other widths) must engage
        ("simple", workloads.simple_tree, None,
         dict(max_seq_len=len(PROMPT) + 40, width=3, depth=0)),
        ("practical", workloads.practical_tree, practical_template,
         dict(max_seq_len=36, width=2, depth=2)),
        # 14 skip iters: an 8-window with kv-copy rows + DUMP pads
        ("spec", workloads.speculative_decoding, spec_template,
         dict(max_seq_len=len(PROMPT) + 60, width=4, depth=0)),
    ]
    calls = {"exec": 0, "win": 0}
    orig = MR.execute_recorded
    orig_win = MR._slab_window

    def spy(self, *a, **k):
        calls["exec"] += 1
        return orig(self, *a, **k)

    def spy_win(self, *a, **k):
        calls["win"] += 1
        return orig_win(self, *a, **k)

    monkeypatch.setattr(MR, "execute_recorded", spy)
    monkeypatch.setattr(MR, "_slab_window", spy_win)
    for name, wl, tpl, gkw in cases:
        monkeypatch.setenv("DEFT_REPLAY_EXEC", "0")
        want, _ = run(wl, tpl() if tpl else None, **gkw)
        monkeypatch.setenv("DEFT_REPLAY_EXEC", "1")
        before = calls["exec"]
        before_win = calls["win"]
        got, up_bytes = run(wl, tpl() if tpl else None, **gkw)
        assert got == want, name
        assert calls["exec"] > before, f"{name}: replay exec must engage"
        if name in ("simple", "spec", "practical"):
            # practical: uniform-select recording turns the whole replay
            # into one scannable topk run (DEFT_REPLAY_UNIFORM default)
            assert calls["win"] > before_win, \
                f"{name}: scan windows must engage"


def test_fused_params_match_unfused():
    """fuse_params (wqkv/wgu single-chip fusion) must be numerically
    equivalent to the separate projections (fp32: exact up to accumulation
    order) and roundtrip exactly through unfuse_params."""
    import jax
    import jax.numpy as jnp

    from deft_tpu.models.llama import decode_forward
    from deft_tpu.models.loader import fuse_params, unfuse_params

    runner = make_runner()  # fp32, mesh None -> params arrive fused
    runner.forward_prefill(PROMPT)
    tree = runner.tree
    for i, c in enumerate(tree.branch(tree.root, 2)):
        c.append_token(30 + i)
    tree.alloc()
    plan = runner.build_plan(ForwardMode.TREE_DECODE_FLATTEN)
    paged = runner._use_paged(ForwardMode.TREE_DECODE_FLATTEN, plan)
    batch = runner.build_decode_batch(ForwardMode.TREE_DECODE_FLATTEN, plan)
    attn = runner._attn_fn(ForwardMode.TREE_DECODE_FLATTEN, paged)
    rope = runner._rope_apply

    def logits_of(params):
        l, _, _ = decode_forward(runner.cfg, params, rope, runner.k_pool,
                                 runner.v_pool, batch, attn)
        return np.asarray(l, np.float64)

    fused = runner.params
    assert "wqkv" in fused and "wgu" in fused
    unfused = unfuse_params(fused)
    assert "wq" in unfused and "wqkv" not in unfused
    np.testing.assert_allclose(logits_of(fused), logits_of(unfused),
                               rtol=1e-5, atol=1e-5)
    # roundtrip is exact
    refused = fuse_params(unfused)
    for k in fused:
        np.testing.assert_array_equal(np.asarray(fused[k]),
                                      np.asarray(refused[k]))


def test_host_fuse_path_matches_device_fuse():
    """random_params(fuse=True) (host/_finalize-time fusion — avoids the
    transient original+fused HBM copy at init) must produce bit-identical
    params to post-hoc fuse_params on the unfused pytree, for bf16 and for
    int8 weights (per-output-column scales concatenate exactly)."""
    import dataclasses

    from deft_tpu.models import PRESETS
    from deft_tpu.models.loader import fuse_params, random_params

    for cfg, wdt in (
        (PRESETS["tiny"], "inherit"),
        (PRESETS["tiny"], "int8"),
        (dataclasses.replace(PRESETS["tiny"], qkv_bias=True), "inherit"),
    ):
        a = random_params(cfg, seed=3, weight_dtype=wdt, fuse=True)
        b = fuse_params(random_params(cfg, seed=3, weight_dtype=wdt))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{k} ({wdt})"
            )


def test_id_tokenizer_handles_text_and_odd_digits():
    """The CLI fallback tokenizer must (a) map plain numeric tokens to
    themselves, (b) hash text (real dataset prompts under random-init
    models) stably into the vocab, and (c) not crash on tokens where
    str.isdigit() holds but int() fails (unicode digits, '--5')."""
    from deft_tpu.cli.run import _IdTokenizer

    tok = _IdTokenizer(512)
    assert tok.encode("7 42 -3") == [7, 42, -3 % 512]
    ids = tok.encode("sort these numbers: 12 ² --5 7,8")
    assert ids == tok.encode("sort these numbers: 12 ² --5 7,8")
    assert all(0 <= i < 512 for i in ids)
    assert ids[4] != ids[5]  # distinct odd tokens hash apart
    assert tok.decode([1, 2]) == "1 2"


def test_greedy_chain_matches_sync():
    """Device-chained greedy decode (async token backfill) must produce
    exactly the tokens of the fully-synchronous path."""
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.runtime import tree_generate

    def run(chained: bool):
        runner = make_runner()
        fn = workloads.simple_tree
        if not chained:
            # strip the structural_iters declaration -> sync every iter
            def sync_fn(*a, **k):
                return workloads.simple_tree(*a, **k)
            fn = sync_fn
        tree_generate(
            model=runner,
            mode=ForwardMode.TREE_DECODE_FLATTEN,
            tokenizer=None,
            prompt_ids=PROMPT,
            max_seq_len=len(PROMPT) + 14,
            width=3,
            depth=1,
            branch_controller=Branch_Controller(fn),
        )
        return sorted(tuple(b.token_ids) for b in runner.tree.all_finished_seqs)

    a, b = run(True), run(False)
    assert a == b and len(a) == 3


def test_practical_tree_deferred_matches_sync():
    """The deferred-select pipeline (branch tokens picked on device, no host
    logits fetch) must replay a ToT template to exactly the tokens of the
    fully-synchronous path — including across branch AND prune events, where
    row order changes and branch children gather top-k columns > 0."""

    def make_template():
        # root branches 3-way at iter 0; node 1 branches 2-way at iter 2;
        # node 2 prunes at iter 4; root prunes (stop+output) at iter 9
        root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
        n1 = ExecuteTreeNode(1, value=2, start_offset=0, end_offset=2)
        n2 = ExecuteTreeNode(2, value=4, start_offset=0, end_offset=4)
        n5 = ExecuteTreeNode(5, value=9, start_offset=0, end_offset=9)
        n3 = ExecuteTreeNode(3, value=9, start_offset=2, end_offset=9)
        n4 = ExecuteTreeNode(4, value=9, start_offset=2, end_offset=9)
        root.children = [n1, n2, n5]
        n1.children = [n3, n4]
        tpl = ExecuteTree(root, [root, n1, n2, n5, n3, n4])
        assert tpl.branch_record[0] == {0: [1, 2, 5]}
        assert tpl.branch_record[2] == {1: [3, 4]}
        assert 2 in tpl.prune_record[4]
        assert 0 in tpl.prune_record[9]
        return tpl

    def run(deferred: bool):
        runner = make_runner()
        fn = workloads.practical_tree
        if not deferred:
            # strip the deferral declarations -> sync every iteration
            def sync_fn(*a, **k):
                k.pop("deferred", None)
                return workloads.practical_tree(*a, **k)
            fn = sync_fn
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            max_seq_len=len(PROMPT) + 12, width=3, depth=2,
            branch_controller=Branch_Controller(fn),
            tree_template=make_template(),
        )
        return sorted(
            (tuple(b.token_ids), round(b.cumulative_logprob, 4))
            for b in runner.tree.all_finished_seqs
        )

    a, b = run(True), run(False)
    assert a == b and len(a) == 3  # surviving leaves: n5, n3, n4


def test_random_tree_deferred_matches_sync():
    """random_tree's rng-driven branch/prune schedule is host-known, so its
    deferred run must equal the sync run token-for-token."""

    def run(deferred: bool):
        runner = make_runner()
        fn = workloads.random_tree
        if not deferred:
            def sync_fn(*a, **k):
                k.pop("deferred", None)
                return workloads.random_tree(*a, **k)
            fn = sync_fn
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            max_seq_len=len(PROMPT) + 16, width=3, depth=1,
            branch_controller=Branch_Controller(fn),
        )
        return sorted(
            (tuple(b.token_ids), round(b.cumulative_logprob, 4))
            for b in runner.tree.all_finished_seqs
        )

    a, b = run(True), run(False)
    assert a == b and len(a) >= 3


def test_int8_kv_cache_close_to_fp32():
    """int8 KV (per-token-head scales) must track the fp32-KV distributions
    closely and run the full generation loop."""
    import dataclasses

    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.runtime import tree_generate

    def next_probs(kv_dtype):
        ecfg = dataclasses.replace(ECFG, kv_dtype=kv_dtype)
        runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="xla")
        runner.forward_prefill(PROMPT)
        tree = runner.tree
        for c, child in enumerate(tree.branch(tree.root, 3)):
            child.append_token(11 + c)
        tree.alloc()
        plan = runner.build_plan(ForwardMode.TREE_DECODE_FLATTEN)
        lv, _ = runner.forward_tree_decode(ForwardMode.TREE_DECODE_FLATTEN, plan)
        return lv.vals[:3]

    a = next_probs("inherit")
    b = next_probs("int8")
    assert np.abs(a - b).max() < 5e-3  # probabilities, near-uniform model

    # full loop smoke with int8
    ecfg = dataclasses.replace(ECFG, kv_dtype="int8")
    runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="xla")
    tree_generate(
        model=runner,
        mode=ForwardMode.TREE_DECODE_FLATTEN,
        tokenizer=None,
        prompt_ids=PROMPT,
        max_seq_len=len(PROMPT) + 10,
        width=3,
        depth=1,
        branch_controller=Branch_Controller(workloads.simple_tree),
    )
    assert len(runner.tree.all_finished_seqs) == 3


def test_paged_seq_e2e_matches_xla():
    """Seq-mode generation through the in-kernel paged-read baseline
    (ops/paged_seq_attn.py, interpret on CPU) must produce the same tokens
    as the XLA gather path — and the plan must actually take the paged
    route (plan.paged), not silently fall back."""
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.runtime import tree_generate

    # long enough prompt that the seg-alignment waste limit admits the
    # paged layout (tiny trees correctly fall back to the gather kernel)
    prompt = list(range(5, 205))
    results = {}
    for kernels in ("xla", "pallas"):
        runner = make_runner(kernels=kernels)
        if kernels == "pallas":
            # pre-flight: the tree this workload builds must be seg-aligned
            t = runner.tree
            t.init_prompt(prompt)
            for i, c in enumerate(t.branch(t.root, 3)):
                c.append_token(20 + i)
            t.alloc()
            plan = runner.build_plan(ForwardMode.DECODE)
            assert plan.paged, "chunked pool should admit the paged seq plan"
            runner.reset_state()
        tree_generate(
            model=runner,
            mode=ForwardMode.DECODE,
            tokenizer=None,
            prompt_ids=prompt,
            max_seq_len=len(prompt) + 12,
            width=3,
            depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        results[kernels] = sorted(
            tuple(b.token_ids) for b in runner.tree.all_finished_seqs
        )
    assert results["xla"] == results["pallas"]


def test_int8_weights_match_bf16_generation():
    """Weight-only int8 quantization must preserve the generation protocol
    and stay close to the full-precision logits (random-init weights are
    well-conditioned for per-channel symmetric int8)."""
    import dataclasses

    runs = {}
    for wdt in ("inherit", "int8"):
        runner = ModelRunner(
            PRESETS["tiny"],
            dataclasses.replace(ECFG, weight_dtype=wdt),
            kernels="xla",
        )
        if wdt == "int8":
            # single-chip runners fuse q/k/v -> wqkv (loader.fuse_params)
            assert runner.params["wqkv"].dtype.name == "int8"
            assert "wqkv_s" in runner.params
        tree_generate(
            model=runner, mode=ForwardMode.TREE_DECODE_FLATTEN,
            tokenizer=None, prompt_ids=PROMPT,
            max_seq_len=len(PROMPT) + 8, width=2, depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        runs[wdt] = sorted(
            tuple(b.token_ids) for b in runner.tree.all_finished_seqs
        )
        assert len(runs[wdt]) == 2
    # int8 is lossy: the protocol must complete; token-level agreement is
    # expected but not guaranteed on random weights -> compare lengths only
    assert [len(t) for t in runs["int8"]] == [len(t) for t in runs["inherit"]]


def test_int8_pallas_matmul_matches_xla_generation():
    """The explicit dequant-in-matmul Pallas kernel (weight_dtype
    'int8-pallas') must generate the same tokens as the XLA int8 path —
    identical quantized weights, only the matmul implementation differs."""
    import dataclasses

    runs = {}
    for wdt in ("int8", "int8-pallas"):
        runner = ModelRunner(
            PRESETS["tiny"],
            dataclasses.replace(ECFG, weight_dtype=wdt),
            kernels="xla",
        )
        key = "wqkv_sp" if wdt == "int8-pallas" else "wqkv_s"
        assert key in runner.params
        assert runner.params["wqkv"].dtype.name == "int8"
        tree_generate(
            model=runner, mode=ForwardMode.TREE_DECODE_FLATTEN,
            tokenizer=None, prompt_ids=PROMPT,
            max_seq_len=len(PROMPT) + 10, width=2, depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        runs[wdt] = sorted(
            tuple(b.token_ids) for b in runner.tree.all_finished_seqs
        )
    assert runs["int8"] == runs["int8-pallas"]


def test_moe_generation_cross_mode_and_int8():
    """Mixtral-family sparse MoE through the full engine: flatten and seq
    modes must generate identical tokens (routing is part of the forward,
    attention exactness is unchanged), and int8 expert weights must complete
    the protocol."""
    import dataclasses

    moe_cfg = dataclasses.replace(PRESETS["tiny"], num_experts=4,
                                  experts_per_tok=2)

    def run(mode, wdt="inherit"):
        runner = ModelRunner(
            moe_cfg, dataclasses.replace(ECFG, weight_dtype=wdt),
            kernels="xla", retain_full_logits=True,
        )
        if wdt == "int8":
            assert runner.params["wg"].dtype.name == "int8"
            assert runner.params["wg_s"].shape == (
                moe_cfg.num_layers, 4, moe_cfg.intermediate_size)
        tree_generate(
            model=runner, mode=mode, tokenizer=None, prompt_ids=PROMPT,
            max_seq_len=len(PROMPT) + 10, width=2, depth=1,
            branch_controller=Branch_Controller(workloads.simple_tree),
        )
        return sorted(tuple(b.token_ids) for b in runner.tree.all_finished_seqs)

    flat = run(ForwardMode.TREE_DECODE_FLATTEN)
    assert len(flat) == 2 and all(len(t) > 5 for t in flat)
    assert flat == run(ForwardMode.DECODE)
    i8 = run(ForwardMode.TREE_DECODE_FLATTEN, "int8")
    assert [len(t) for t in i8] == [len(t) for t in flat]


def test_plan_patch_upload_matches_full_upload(monkeypatch):
    """Device-resident plan patching (runner._upload_plan: per-step diffed
    chunk scatter instead of a full packed-plan upload) must be invisible:
    identical generations, for both flatten and the practical-tree replay
    (branch/prune events force full re-uploads mid-generation)."""
    ref, _ = run_simple(ForwardMode.TREE_DECODE_FLATTEN)
    monkeypatch.setenv("DEFT_PLAN_PATCH", "1")
    got, _ = run_simple(ForwardMode.TREE_DECODE_FLATTEN)
    assert got == ref

    # replay with structural events + a second generation on the SAME
    # runner (reset_state must not leak stale device buffers)
    def practical(runner):
        root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
        n1 = ExecuteTreeNode(1, value=3, start_offset=0, end_offset=3)
        n2 = ExecuteTreeNode(2, value=6, start_offset=0, end_offset=6)
        n3 = ExecuteTreeNode(3, value=3, start_offset=3, end_offset=6)
        n4 = ExecuteTreeNode(4, value=3, start_offset=3, end_offset=6)
        root.children = [n1, n2]
        n1.children = [n3, n4]
        tpl = ExecuteTree(root, [root, n1, n2, n3, n4])
        tree_generate(
            runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            max_seq_len=20, width=2, depth=2,
            branch_controller=Branch_Controller(workloads.practical_tree),
            tree_template=tpl,
        )
        return [tuple(s.token_ids) for s in runner.tree.all_finished_seqs]

    monkeypatch.delenv("DEFT_PLAN_PATCH")
    r = make_runner()
    want = practical(r)
    r.reset_state()
    assert practical(r) == want
    monkeypatch.setenv("DEFT_PLAN_PATCH", "1")
    rp = make_runner()
    assert rp._plan_patch
    assert practical(rp) == want
    rp.reset_state()
    assert practical(rp) == want
    # the patch path must have actually engaged (device cache populated)
    assert rp._plan_dev_cache


def test_window_decode_matches_per_step(monkeypatch):
    """K-step greedy decode windows (runner.forward_tree_decode_window: one
    jitted lax.scan dispatch per 8 steps, fused plan-patch upload) must
    generate exactly the per-step pipeline's tokens — including across
    bucket-growth window splits and structural (branch) iterations, for
    both the simple greedy workload and the practical-tree replay."""
    # replay-record mode supersedes windows when enabled; this test pins
    # the WINDOW path specifically
    monkeypatch.setenv("DEFT_REPLAY_EXEC", "0")
    monkeypatch.setenv("DEFT_PLAN_PATCH", "0")  # per-step full-upload ref
    ref, _ = run_simple(ForwardMode.TREE_DECODE_FLATTEN)
    monkeypatch.setenv("DEFT_PLAN_PATCH", "1")
    runner = make_runner(use_tree_index=True)
    assert runner._plan_patch
    from deft_tpu.runtime.runner import ModelRunner, WindowLogits

    calls = {"window": 0}
    orig = ModelRunner.forward_tree_decode_window

    def spy(self, *a, **k):
        calls["window"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(ModelRunner, "forward_tree_decode_window", spy)
    bc = Branch_Controller(workloads.simple_tree)
    tree_generate(
        runner, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
        max_seq_len=24, width=3, depth=0, branch_controller=bc,
    )
    got = [tuple(s.token_ids) for s in runner.tree.all_finished_seqs]
    assert got == ref
    assert calls["window"] >= 1, "window path must engage on greedy runs"

    # practical-tree replay: windows between branch/prune events; small
    # min_token_bucket forces bucket growth mid-run (window splits)
    root = ExecuteTreeNode(0, value=1, start_offset=0, end_offset=0)
    n1 = ExecuteTreeNode(1, value=14, start_offset=0, end_offset=14)
    n2 = ExecuteTreeNode(2, value=20, start_offset=0, end_offset=20)
    root.children = [n1, n2]

    def run_practical():
        tpl = ExecuteTree(root, [root, n1, n2])
        r = make_runner()
        tree_generate(
            r, ForwardMode.TREE_DECODE_FLATTEN, None, PROMPT,
            max_seq_len=36, width=2, depth=2,
            branch_controller=Branch_Controller(workloads.practical_tree),
            tree_template=tpl,
        )
        return [tuple(s.token_ids) for s in r.tree.all_finished_seqs]

    monkeypatch.setenv("DEFT_PLAN_PATCH", "0")
    want = run_practical()
    monkeypatch.setenv("DEFT_PLAN_PATCH", "1")
    assert run_practical() == want
    # deep pipelining (multiple windows in flight) + wide sync stride must
    # not change tokens either — the degraded-transport configuration the
    # r5 session scripts run with
    monkeypatch.setenv("DEFT_PIPE_WINDOWS", "4")
    monkeypatch.setenv("DEFT_SYNC_PERIOD", "32")
    assert run_practical() == want

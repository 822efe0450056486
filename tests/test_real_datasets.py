"""Regression tests against the REAL reference dataset files (read-only at
/root/reference/dataset/generation/) — schema drift in data/loader.py would
otherwise go unnoticed (VERDICT round 1, missing #5).

Parity surface: /root/reference/DeFT/deft/data_loader.py:131-134 (load_trees)
and :181-235 (load_prompts / generate_accepted_len_list).
"""

import os

import pytest

from deft_tpu.data.loader import load_prompts, load_trees

REASONING_DIR = "/root/reference/dataset/generation/Reasoning"
SPEC_DIR = "/root/reference/dataset/generation/Speculative_Decoding"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REASONING_DIR), reason="reference datasets not present"
)


def _engine(slots, max_requests=64):
    from deft_tpu.config import EngineConfig
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ModelRunner

    ecfg = EngineConfig(
        kv_pool_slots=slots, max_requests=max_requests, max_context_len=256,
        min_token_bucket=128, dtype="float32",
    )
    return ModelRunner(PRESETS["tiny"], ecfg, kernels="xla")


# -- schema pins --------------------------------------------------------------

def test_sorting128tot_schema():
    trees = load_trees(os.path.join(REASONING_DIR, "sorting128ToT.json"))
    assert len(trees) == 77
    t = trees[0]
    assert t.node_num == 101 and t.max_depth == 10 and t.max_width == 10
    # every branch event names children that exist, in creation order (the
    # replay contract: TreeCache assigns sequential ids in branch order)
    ids = {n.id for n in t.nodes}
    for it, pairs in t.branch_record.items():
        for parent, children in pairs.items():
            assert parent in ids and all(c in ids for c in children)
            assert children == sorted(children)
    # prune iters never precede the node's branch-in iteration
    assert min(t.prune_record) >= 0 and max(t.prune_record) <= 3708


@pytest.mark.parametrize("name,n_trees", [
    ("docmergeToT.json", 50), ("set128ToT.json", 100), ("keywordToT.json", 98),
])
def test_other_tot_files_load(name, n_trees):
    trees = load_trees(os.path.join(REASONING_DIR, name))
    assert len(trees) == n_trees
    for t in trees[:3]:
        assert t.node_num >= 1 and t.branch_record


def test_tree_size64_schema():
    recs = load_prompts(os.path.join(SPEC_DIR, "tree_size64.json"))
    assert len(recs) == 80
    r = recs[0]
    assert r.node_num == 64
    assert len(r.accepted_len_list) == 700
    # accept counts are bounded by the token-tree width (Medusa invariant)
    assert all(0 <= a <= 64 for a in r.accepted_len_list)


def test_apps_tree_size32_schema():
    recs = load_prompts(os.path.join(SPEC_DIR, "APPS_tree_size32.json"))
    assert recs and recs[0].node_num == 32
    assert all(0 <= a <= 32 for a in recs[0].accepted_len_list)


# -- truncated e2e replays through the real engine ----------------------------

def test_sorting128tot_replays_e2e_cross_mode():
    """Replay the first real ToT template (truncated to 80 decode iters)
    through flatten AND seq; generations must be token-identical (the
    attention is exact — reference cross-mode invariant, SURVEY §4)."""
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.runtime import ForwardMode, tree_generate

    def run(mode, deferred=True):
        t = load_trees(os.path.join(REASONING_DIR, "sorting128ToT.json"))[0]
        runner = _engine(32768)
        fn = workloads.practical_tree
        if not deferred:
            def fn(*a, **k):  # strip declarations -> sync every iteration
                k.pop("deferred", None)
                return workloads.practical_tree(*a, **k)
        tree_generate(
            model=runner, mode=mode, tokenizer=None,
            prompt_ids=list(range(7, 23)), max_seq_len=16 + 80,
            width=t.max_width, depth=t.max_depth,
            branch_controller=Branch_Controller(fn),
            tree_template=t,
        )
        return sorted(tuple(s.token_ids) for s in runner.tree.all_finished_seqs)

    got_f = run(ForwardMode.TREE_DECODE_FLATTEN)
    got_s = run(ForwardMode.DECODE)
    assert got_f and got_f == got_s
    # the deferred device-side token selection must match a fully-sync
    # replay on the REAL recorded branch/prune schedule
    assert got_f == run(ForwardMode.TREE_DECODE_FLATTEN, deferred=False)


def test_tree_size64_replays_e2e():
    """Replay a real Medusa accept-length record (truncated to 8 steps):
    the KV merge/reset path must track the recorded accepts exactly."""
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.runtime import ForwardMode, tree_generate

    rec = load_prompts(os.path.join(SPEC_DIR, "tree_size64.json"))[0]
    accepts = rec.accepted_len_list[:8]
    rec.accepted_len_list = accepts
    runner = _engine(65536, max_requests=160)
    pm = tree_generate(
        model=runner, mode=ForwardMode.TREE_DECODE_FLATTEN, tokenizer=None,
        prompt_ids=list(range(7, 23)), max_seq_len=16 + 40,
        width=rec.node_num, depth=1,
        branch_controller=Branch_Controller(workloads.speculative_decoding),
        tree_template=rec,
    )
    seqs = runner.tree.all_finished_seqs
    assert len(seqs) == rec.node_num
    # accepted tokens are squeezed into the ROOT by merge_nodes and COUNT
    # as generated output (output_branch includes
    # root.token_ids[prompt_len:]); each leaf additionally holds exactly
    # its own single speculative token.  The mock replays accepts from the
    # leaf list in id order and leaves keep their iter-0 tokens, so every
    # branch sees the same accepted prefix.
    # accepts[0] is never consumed (iter 0 is the prefill branch; the loop
    # replays accepts[1:] and outputs at iter == len(accepts))
    accepted_total = sum(min(a, rec.node_num) for a in accepts[1:])
    assert all(len(s.token_ids) == accepted_total + 1 for s in seqs)
    assert pm.generated_len > 0

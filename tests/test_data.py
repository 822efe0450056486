"""Synthetic template generation + reference-schema round-trip + replay."""

import numpy as np

from deft_tpu.data.loader import load_prompts, load_trees
from deft_tpu.data.synthetic import (
    save_spec_json,
    save_tot_json,
    synth_spec_tree,
    synth_tot_tree,
)


def test_tot_roundtrip(tmp_path):
    trees = [synth_tot_tree(seed=s, width=3, total_iters=40) for s in range(3)]
    p = str(tmp_path / "tot.json")
    save_tot_json(trees, p)
    loaded = load_trees(p)
    assert len(loaded) == 3
    for a, b in zip(trees, loaded):
        assert a.branch_record == b.branch_record
        assert a.prune_record == b.prune_record
        assert a.node_num == b.node_num


def test_spec_roundtrip(tmp_path):
    trees = [synth_spec_tree(token_tree_size=16, gen_len=64, seed=s)
             for s in range(2)]
    p = str(tmp_path / "spec.json")
    save_spec_json(trees, p)
    loaded = load_prompts(p)
    assert len(loaded) == 2
    for a, b in zip(trees, loaded):
        assert a.node_num == b.node_num
        assert a.accepted_len_list == b.accepted_len_list


def test_synthetic_tot_replays_e2e():
    """A synthetic ToT schedule must replay through the real engine: node ids
    created by TreeCache during Practical_Tree replay must line up with the
    template's ids (one structural event per iteration guarantees order)."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    ecfg = EngineConfig(
        kv_pool_slots=4096, max_requests=64, max_context_len=512,
        min_token_bucket=128, dtype="float32",
    )
    runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="xla")
    template = synth_tot_tree(seed=1, width=3, max_leaves=6, total_iters=30)
    pm = tree_generate(
        model=runner,
        mode=ForwardMode.TREE_DECODE_FLATTEN,
        tokenizer=None,
        prompt_ids=list(range(7, 23)),
        max_seq_len=16 + 31,
        width=6,
        depth=4,
        branch_controller=Branch_Controller(workloads.practical_tree),
        tree_template=template,
    )
    assert pm.generated_len > 0
    assert len(runner.tree.all_finished_seqs) >= 1

"""Generation-state checkpoint / resume.

The reference has no runtime checkpointing (SURVEY.md §5: "None for runtime
state").  Here the insight is that for an inference tree the **tokens are the
checkpoint**: the decoding tree's structure + token ids fully determine the
KV cache, so a resume is (1) restore the tree skeleton, (2) re-prefill each
root-to-leaf path to repopulate KV.  This makes recovery from preemption
(spot TPUs) a first-class operation with a tiny on-disk footprint.
"""

from __future__ import annotations

import json
from typing import Dict

from deft_tpu.core.tree import TreeCache


def tree_snapshot(tree: TreeCache) -> Dict:
    """Serializable skeleton: per node (id, parent, token_ids, position
    offset) + finished branches.  KV indices are deliberately NOT saved —
    they are derivable by re-prefill."""
    nodes = []
    for n in tree.nodes.values():
        nodes.append({
            "id": n.id,
            "parent": n.parent.id if n.parent is not None else None,
            "token_ids": list(n.token_ids),
            "position_offset": n.position_offset,
            "cumulative_logprob": n.cumulative_logprob,
            # a leaf's newest token has no KV slot until the next alloc()
            "kv_len": n.kv_len,
            # root only: prompt/merged-token boundary (output accounting)
            "prompt_len": n.prompt_len,
        })
    return {
        "nodes": nodes,
        "node_cnt": tree.node_cnt,
        "deleted_token_num": tree.deleted_token_num,
        "finished": [
            {
                "id": s.id,
                "token_ids": list(s.token_ids),
                "cumulative_logprob": s.cumulative_logprob,
                "PPL": s.PPL,
            }
            for s in tree.all_finished_seqs
        ],
    }


def save_checkpoint(tree: TreeCache, path: str) -> None:
    with open(path, "w") as f:
        json.dump(tree_snapshot(tree), f)


def restore(runner, path: str) -> None:
    """Rebuild the tree + KV pools from a snapshot by re-prefilling.

    Strategy: restore the root (prompt) via forward_prefill, then rebuild the
    branch structure host-side and re-run tree-decode steps per appended
    token layer?  No — simpler and exact: re-prefill each root-to-leaf path
    as one causal sequence into freshly allocated KV (prefix nodes re-use
    their already-restored KV thanks to the node cache)."""
    import numpy as np

    from deft_tpu.models.llama import PrefillBatch
    from deft_tpu.core.kv_pool import DUMP_SLOT
    from deft_tpu.plan.padding import pad_token_count

    from deft_tpu.core.tree import TreeNode

    with open(path) as f:
        snap = json.load(f)
    runner.reset_state()
    tree = runner.tree

    # 1. restore the skeleton with the SNAPSHOT'S node ids and position
    #    offsets (creation-order renumbering would desynchronize ExecuteTree
    #    template replays and finished-seq cross-references whenever the
    #    saved tree had pruned nodes, and recomputed offsets are wrong after
    #    reset_node_KV shifts in speculative decoding)
    order = sorted(snap["nodes"], key=lambda n: n["id"])
    root_rec = order[0]
    assert root_rec["parent"] is None
    # root KV only for the kv_len executed tokens: a pending newest token
    # (no KV until the next alloc) must stay pending across restore, or the
    # next alloc() would give it a second slot and the flatten plan would
    # double-count it
    root_kv = int(root_rec["kv_len"])
    tree.init_prompt(root_rec["token_ids"][:root_kv])
    for t in root_rec["token_ids"][root_kv:]:
        tree.root.append_token(int(t))
    tree.root.position_offset = root_rec["position_offset"]
    tree.root.cumulative_logprob = root_rec["cumulative_logprob"]
    # init_prompt set prompt_len to the restored token count, which may
    # include merged (accepted) tokens — restore the true boundary
    tree.root.prompt_len = int(root_rec.get("prompt_len", root_kv))
    id_map = {root_rec["id"]: tree.root}
    for rec in order[1:]:
        parent = id_map[rec["parent"]]
        if parent.id in tree.leaves:
            # convert parent to internal node on first child
            tree.leaves.pop(parent.id)
            req = tree.leaf_to_req.pop(parent.id, None)
            if req is not None:
                tree.req_to_token_pool.free(req)
            tree.remove_ref(parent)
            tree.token_to_kv_pool.close_owner((tree._owner_tag, parent.id))
        node = TreeNode(int(rec["id"]))
        node.parent = parent
        node.position_offset = int(rec["position_offset"])
        parent.children[node.id] = node
        tree.nodes[node.id] = node
        if tree.tree_index_pool is not None:
            row = tree.tree_index_pool.alloc(1)
            assert row is not None
            node.node_index_row = int(row[0])
        id_map[rec["id"]] = node
        tree.leaves[node.id] = node
        tree.add_ref(node)
        for t in rec["token_ids"]:
            node.append_token(int(t))
        node.cumulative_logprob = rec["cumulative_logprob"]
        # KV slots for this node's *executed* tokens (kv_len <= token count)
        if rec["kv_len"]:
            locs = tree.token_to_kv_pool.alloc_for(
                (tree._owner_tag, node.id), rec["kv_len"]
            )
            assert locs is not None, "KV pool exhausted during restore"
            node.extend_indices(locs, tree.tree_index_pool)
        tree.token_to_kv_pool.close_owner((tree._owner_tag, node.id))
        if tree.req_to_token_pool is not None:
            req = tree.req_to_token_pool.alloc(1)
            assert req is not None
            tree.leaf_to_req[node.id] = int(req[0])

    # (pool slot refcounts are per-node, matching cut()'s one-free-per-node;
    #  shared prefixes share the node, not extra refs)

    # page-table rows: full root-to-leaf KV path per leaf
    if tree.req_to_token_pool is not None:
        for leaf in tree.leaves.values():
            chain = []
            cur = leaf
            while cur is not None:
                chain.append(cur)
                cur = cur.parent
            chain.reverse()
            kv = np.concatenate([c.kv_indices for c in chain if c.kv_len])
            req = tree.leaf_to_req[leaf.id]
            tree.req_to_token_pool.req_to_token[req, : len(kv)] = kv

    # 2. re-prefill each root-to-leaf path; scatter K/V into the restored
    #    slots (shared prefixes are recomputed identically, so overwrites
    #    are idempotent)
    for leaf in sorted(tree.leaves.values(), key=lambda x: x.id):
        chain = []
        cur = leaf
        while cur is not None:
            chain.append(cur)
            cur = cur.parent
        chain.reverse()
        tokens = [t for c in chain for t in c.token_ids[: c.kv_len]]
        positions = [p for c in chain for p in c.positions[: c.kv_len]]
        locs = np.concatenate([c.kv_indices for c in chain if c.kv_len])
        P = len(tokens)
        assert len(locs) == P, (len(locs), P)
        P_pad = pad_token_count(P, runner.ecfg.attention.block_len,
                                runner.ecfg.min_token_bucket)
        tok = np.zeros(P_pad, dtype=np.int32)
        tok[:P] = tokens
        pos = np.zeros(P_pad, dtype=np.int32)
        pos[:P] = positions
        out = np.full(P_pad, DUMP_SLOT, dtype=np.int32)
        out[:P] = locs
        # _upload replicates across the mesh when the runner is sharded —
        # bare jnp.asarray would mix single-device and mesh-sharded jit
        # inputs and fail at dispatch
        batch = PrefillBatch(
            tokens=runner._upload(tok),
            positions=runner._upload(pos),
            out_loc=runner._upload(out),
            length=runner._upload(np.asarray(P, dtype=np.int32)),
        )
        _, _, _, _, runner.k_pool, runner.v_pool = runner._prefill_step()(
            runner.params, runner.k_pool, runner.v_pool, batch
        )

    # 3. finished branches
    from deft_tpu.core.tree import BranchSequence

    for rec in snap["finished"]:
        seq = BranchSequence(rec["id"])
        seq.token_ids = list(rec["token_ids"])
        seq.cumulative_logprob = rec["cumulative_logprob"]
        seq.PPL = rec["PPL"]
        tree.all_finished_seqs.append(seq)
    tree.node_cnt = snap["node_cnt"]
    tree.deleted_token_num = snap["deleted_token_num"]

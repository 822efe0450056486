"""Batched multi-tree decoding (data-parallel / continuous batching).

The reference is single-tree (batching is on its roadmap,
/root/reference/DeFT/README.md:248-258).  Here N independent decoding trees
(one per request) share the KV pool and the jitted decode step: the
multi-tree flatten plan numbers leaves globally (plan/multi.py) so ONE
kernel invocation serves every tree, and each tree's branch controller sees
its own row-window of the logits.  Requests join (prefill) and finish
(retire) between steps; leaf-count bucket changes retrace, absorbed by the
jit cache.
"""

from __future__ import annotations

from typing import List, Optional

from deft_tpu.core.tree import TreeCache
from deft_tpu.plan.multi import build_multi_flatten_plan
from deft_tpu.runtime.modes import ForwardMode
from deft_tpu.runtime.runner import LogitsView, ModelRunner


class _RowWindowView:
    """LogitsView proxy exposing rows [off, off+n) of a global view."""

    def __init__(self, base: LogitsView, off: int, n: int):
        self._base = base
        self._off = off
        self._n = n

    @property
    def k(self) -> int:
        return self._base.k

    @property
    def vals(self):
        return self._base.vals[self._off : self._off + self._n]

    @property
    def ids(self):
        return self._base.ids[self._off : self._off + self._n]

    def topk(self, row: int, k: int):
        return self._base.topk(self._off + row, k)

    def argmax(self):
        return (
            self._base.ids[self._off : self._off + self._n, 0],
            self._base.vals[self._off : self._off + self._n, 0],
        )

    def fetch_async(self) -> None:
        """Async device->host copy of the shared base view (idempotent
        across the row windows of one step)."""
        self._base.fetch_async()

    @property
    def greedy_ids_device(self):
        """Device-resident greedy ids for this window — keeps the batched
        path eligible for the async greedy-chain fast path."""
        return self._base.greedy_ids_device[self._off : self._off + self._n]


class Request:
    """One in-flight generation: a tree + its policy."""

    def __init__(self, prompt_ids, branch_controller, max_seq_len: int,
                 width: int = 4, depth: int = 10, template=None):
        self.prompt_ids = [int(t) for t in prompt_ids]
        self.controller = branch_controller
        self.controller.set_execution_graph(template)
        self.max_seq_len = max_seq_len
        self.width = width
        self.depth = depth
        self.tree: Optional[TreeCache] = None
        self.iter = 0
        self.done = False
        self.finished_seqs: list = []  # BranchSequence outputs, kept past free


class BatchedEngine:
    """Drives several Requests through shared pools + one jitted step."""

    def __init__(self, runner: ModelRunner,
                 mode: ForwardMode = ForwardMode.TREE_DECODE_FLATTEN):
        assert mode.plan_kind in ("flatten", "node"), \
            "batched decoding uses the flatten-family plans"
        self.runner = runner
        self.mode = mode
        self.active: List[Request] = []

    def add_request(self, req: Request) -> None:
        """Admit one request (see add_requests for the batched path)."""
        self.add_requests([req])

    def add_requests(self, reqs: List[Request]) -> None:
        """Admit B requests with ONE ragged prefill forward: every prompt's
        KV lands in the shared pools in a single jitted step
        (runner.forward_prefill_batch), then each request's controller sees
        its own row of the batched logits."""
        if not reqs:
            return
        r = self.runner
        for req in reqs:
            req.tree = TreeCache(
                r.token_to_kv_pool, r.req_to_token_pool, r.tree_index_pool
            )
        view = r.forward_prefill_batch(
            [req.prompt_ids for req in reqs], [req.tree for req in reqs]
        )
        view.fetch_async()
        for i, req in enumerate(reqs):
            sub = _RowWindowView(view, i, 1)
            max_gen = req.max_seq_len - len(req.prompt_ids)
            req.done = req.controller.apply_branching(
                model=_TreeFacade(r, req.tree), iter=0, max_gen_len=max_gen,
                width=req.width, depth=req.depth, logits=sub,
                execution_graph=req.controller.tree_templates,
            )
            req.iter = 1
            if req.done:
                req.finished_seqs = list(req.tree.all_finished_seqs)
                req.tree.free()
            else:
                self.active.append(req)

    def step(self) -> None:
        """One global decode step across every active tree."""
        assert self.active
        r = self.runner
        trees = [req.tree for req in self.active]
        for t in trees:
            r.apply_kv_copies(t)  # per-tree merge compactions (spec decode)
            t.alloc()
        a = r.ecfg.attention
        plan = build_multi_flatten_plan(
            trees, q_per_kv=r.cfg.q_per_kv, block_len=a.block_len,
            min_token_bucket=r.ecfg.min_token_bucket,
        )
        view, _ = r.forward_tree_decode(self.mode, plan)
        offsets = plan.leaf_offsets
        still = []
        for req, off in zip(self.active, offsets):
            n = len(req.tree.leaves)
            sub = _RowWindowView(view, off, n)
            max_gen = req.max_seq_len - len(req.prompt_ids)
            req.done = req.controller.apply_branching(
                model=_TreeFacade(r, req.tree), iter=req.iter,
                max_gen_len=max_gen, width=req.width, depth=req.depth,
                logits=sub, execution_graph=req.controller.tree_templates,
            ) or req.iter + 1 >= max_gen
            req.iter += 1
            if req.done:
                req.finished_seqs = list(req.tree.all_finished_seqs)
                req.tree.free()
            else:
                still.append(req)
        self.active = still

    def run(self, max_steps: int = 10_000) -> None:
        steps = 0
        while self.active and steps < max_steps:
            self.step()
            steps += 1


class _TreeFacade:
    """Minimal 'model' facade the branch workloads expect (they use
    model.tree only)."""

    def __init__(self, runner: ModelRunner, tree: TreeCache):
        self.runner = runner
        self.tree = tree

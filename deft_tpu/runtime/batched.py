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
from deft_tpu.plan.multi import build_multi_flatten_plan, build_multi_seq_plan
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
        # iterations where this request's policy makes structural decisions
        # (None -> every iteration); greedy iterations between them chain on
        # device with no host sync
        fn = getattr(branch_controller, "branching_function", None)
        s = getattr(fn, "structural_iters", None)
        self.structural = (
            s(branch_controller.tree_templates,
              max_seq_len - len(self.prompt_ids))
            if s is not None else None
        )

    def is_structural(self, it: int) -> bool:
        max_gen = self.max_seq_len - len(self.prompt_ids)
        return (self.structural is None or it in self.structural
                or it + 1 >= max_gen)


class BatchedEngine:
    """Drives several Requests through shared pools + one jitted step."""

    def __init__(self, runner: ModelRunner,
                 mode: ForwardMode = ForwardMode.TREE_DECODE_FLATTEN):
        assert mode.plan_kind in ("flatten", "node", "seq"), \
            "batched decoding uses the flatten-family or seq plans"
        self.runner = runner
        self.mode = mode
        self.active: List[Request] = []
        self.waiting: List[Request] = []  # feed() queue, admitted between steps
        # async greedy-chain state (mirrors tree_generate's fast path):
        # when EVERY active request's current iteration is non-structural the
        # step only enqueues — placeholder tokens now, values backfilled from
        # the async fetch at the next structural/admission boundary
        self._pending: list = []   # (view, [(node, ti, global_q, col)])
        self._chain = None         # previous all-greedy step's LogitsView
        self._steps_since_sync = 0

    def add_request(self, req: Request) -> None:
        """Admit one request (see add_requests for the batched path)."""
        self.add_requests([req])

    def feed(self, reqs: List[Request]) -> None:
        """Queue requests for admission at the next step boundary
        (continuous batching: callers feed work while decode runs; step()
        admits the whole queue with one ragged prefill)."""
        self.waiting.extend(reqs)

    def _resolve_pending(self) -> None:
        from deft_tpu.runtime.generate import resolve_backfills

        resolve_backfills(self._pending)

    def add_requests(self, reqs: List[Request]) -> None:
        """Admit B requests with ONE ragged prefill forward: every prompt's
        KV lands in the shared pools in a single jitted step
        (runner.forward_prefill_batch), then each request's controller sees
        its own row of the batched logits."""
        if not reqs:
            return
        # outstanding placeholder tokens must land before the chain resets:
        # the next step would otherwise pack placeholder zeros from the host
        # tree as q_tokens (step()'s own admission path resolves first too)
        self._resolve_pending()
        self._chain = None  # admission changes the global row layout
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
            # mirror tree_generate's loop bound (range(1, max_gen)): a
            # request with max_gen <= 1 is finished after iter 0
            if req.done or req.iter >= max_gen:
                req.done = True
                req.finished_seqs = list(req.tree.all_finished_seqs)
                req.tree.free()
            else:
                self.active.append(req)

    def step(self) -> None:
        """One global decode step across every active tree.

        Fast path: when no active request's current iteration is structural,
        the step only ENQUEUES — q_tokens chain from the previous step's
        device-resident greedy ids, each leaf appends a placeholder token,
        and values land via async fetches at the next structural step or
        admission boundary.  The batched loop then pipelines on device like
        tree_generate's greedy chain (no per-step host sync)."""
        if self.waiting:
            self._resolve_pending()
            reqs, self.waiting = self.waiting, []
            self.add_requests(reqs)
            if not self.active:
                return
        assert self.active
        r = self.runner
        all_greedy = all(not req.is_structural(req.iter)
                         for req in self.active)
        trees = [req.tree for req in self.active]
        for t in trees:
            r.apply_kv_copies(t)  # per-tree merge compactions (spec decode)
            t.alloc()
        a = r.ecfg.attention
        # int8 pools: scale-row DMA needs 128-aligned segments + relaxed
        # waste limit (runner build_plan has the same gates)
        seg_kw = (dict(seg_len=(128,), waste_limit=3.0)
                  if r.kv_quantized else {})
        if self.mode.plan_kind == "seq":
            # the seq baseline batches by pure row concatenation (per-leaf
            # independence) — enables batched flatten-vs-seq comparisons
            want_paged = (
                r.kernels != "xla" and 128 % r.cfg.head_dim == 0
            )
            plan = build_multi_seq_plan(
                trees, q_per_kv=r.cfg.q_per_kv, block_len=a.block_len,
                min_token_bucket=r.ecfg.min_token_bucket,
                want_paged=want_paged, **seg_kw,
            )
        else:
            plan = build_multi_flatten_plan(
                trees, q_per_kv=r.cfg.q_per_kv, block_len=a.block_len,
                min_token_bucket=r.ecfg.min_token_bucket, **seg_kw,
            )
        override = (
            self._chain.greedy_ids_device if self._chain is not None else None
        )
        view, _ = r.forward_tree_decode(
            self.mode, plan, q_tokens_override=override,
            block=not all_greedy,
            # all-greedy steps consume only column 0 (placeholder backfill
            # + greedy chain): top-1 argmax skips the full-vocab sort
            logits_kind="greedy" if all_greedy else "topk",
        )
        offsets = plan.leaf_offsets

        if all_greedy:
            backfills = []
            for tree, off in zip(trees, offsets):
                for leaf in tree.leaves.values():
                    q = off + tree.leaf_to_q[leaf.id]
                    leaf.append_token(0)
                    backfills.append((leaf, len(leaf.token_ids) - 1, q, 0))
            view.fetch_async()
            self._pending.append((view, backfills))
            self._chain = view
            for req in self.active:
                req.iter += 1
            # bound the async queue (see tree_generate): sync every 8 steps
            self._steps_since_sync += 1
            if self._steps_since_sync >= 8:
                import jax

                jax.block_until_ready(view._vals)
                self._steps_since_sync = 0
            return

        # structural step: backfills must land before controllers read
        # logits windows or mutate trees
        self._resolve_pending()
        self._chain = None
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
        while (self.active or self.waiting) and steps < max_steps:
            self.step()
            steps += 1
        self._resolve_pending()


class _TreeFacade:
    """Minimal 'model' facade the branch workloads expect (they use
    model.tree only)."""

    def __init__(self, runner: ModelRunner, tree: TreeCache):
        self.runner = runner
        self.tree = tree

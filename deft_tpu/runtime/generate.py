"""The tree-decoding generation loop.

Parity surface: /root/reference/DeFT/deft/tree_decoding/generation/
tree_generate.py:20-284 — prefill, then per iteration: alloc one KV slot per
leaf, build the attention plan, forward, softmax(+1e-6), apply the branch
controller, record PerfMetrics; stop on controller signal or max_gen_len.
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from deft_tpu.obs import GlobalTimer, PerfMetrics
from deft_tpu.obs.tracing import Tracer
from deft_tpu.runtime.modes import ForwardMode
from deft_tpu.runtime.runner import ModelRunner


class DeferredSelect:
    """Collects a structural step's token selections WITHOUT reading logits
    values: each appended token is recorded as (prev_q row, top-K column) of
    the step's LogitsView.  The generation loop turns the records into
      * the next step's on-device q_tokens gather (runner q_select), and
      * host backfills resolved from the async logits fetch later,
    so branch/prune replay workloads (e.g. ToT templates, where WHICH leaf
    branches is predetermined but the branch TOKENS are the model's top-k)
    pipeline on device exactly like greedy chains — no blocking logits fetch.

    Workloads that opt in (``supports_deferred = True``) must not copy token
    values during their structural mutations (branch/cut are fine;
    merge_nodes and output_branch copy — those iterations must be declared
    NON-logits-free so they run synchronously)."""

    def __init__(self, k: int):
        self.k = k
        self.backfills = []  # (node, token_index, prev_q, col) records
        self.qsrc = {}       # leaf_id -> (prev_q, col)

    def append(self, leaf, prev_q: int, col: int) -> None:
        """leaf.append_token(ids[prev_q, col]) — deferred."""
        assert col < self.k, f"column {col} >= step top-K {self.k}"
        leaf.append_token(0)
        self.backfills.append((leaf, len(leaf.token_ids) - 1, prev_q, col))
        self.qsrc[leaf.id] = (prev_q, col)


def resolve_backfills(pending) -> None:
    """Write async-fetched token ids/logprobs into their placeholder slots.
    ``pending`` is a list of (LogitsView, [(node, token_index, q, col)])
    — records, not a (q, col)-keyed dict: two leaves may legitimately select
    the same (row, column) of one view (e.g. a deferred branch whose
    children share the parent's top-1).  Shared by tree_generate and
    BatchedEngine."""
    import numpy as _np

    for view, fills in pending:
        ids, vals = view.ids, view.vals
        for node, ti, q, col in fills:
            node.token_ids[ti] = int(ids[q, col])
            node.cumulative_logprob += float(_np.log(vals[q, col]))
    pending.clear()


def tree_generate(
    model: ModelRunner,
    mode: ForwardMode,
    tokenizer,
    prompt_ids,
    max_seq_len: int,
    width: int,
    depth: int,
    branch_controller,
    tree_template=None,
    output_file: Optional[str] = None,
    perf_metrics: Optional[PerfMetrics] = None,
    print_branches: bool = False,
    tracer: Optional[Tracer] = None,
) -> PerfMetrics:
    """``tracer``: optional obs.tracing.Tracer whose span() brackets the
    prefill / per-step plan-build / forward / branch phases with
    jax.profiler TraceAnnotations (the reference's NVTX analog); run inside
    tracer.session() to capture a TensorBoard trace (CLI --trace-dir)."""
    if tracer is None:
        tracer = Tracer(None)
    if perf_metrics is None:
        perf_metrics = PerfMetrics(output_file)
    prompt_ids = [int(t) for t in prompt_ids]
    prompt_len = len(prompt_ids)
    max_gen_len = max_seq_len - prompt_len
    assert max_gen_len > 0, "max_seq_len must exceed prompt length"

    branch_controller.set_execution_graph(tree_template)

    kv_elem = 2.0  # bf16
    if getattr(model, "kv_quantized", False):
        kv_elem = 1.0 + 4.0 / model.cfg.head_dim  # int8 + fp32 row scale
    kv_bytes_per_tok = int(
        model.cfg.num_kv_heads * model.cfg.head_dim * 2 * kv_elem
    ) * model.cfg.num_layers

    start_time = time.perf_counter()
    with tracer.span("prefill"):
        logits = model.forward_prefill(prompt_ids)
    stop = branch_controller.apply_branching(
        model=model,
        iter=0,
        max_gen_len=max_gen_len,
        width=width,
        depth=depth,
        logits=logits,
        execution_graph=branch_controller.tree_templates,
    )
    ttft = (time.perf_counter() - start_time) * 1000
    perf_metrics.TTFT = ttft

    # Greedy-chain machinery: workloads declare which iterations make
    # structural decisions (branch/prune) and therefore need host logits.
    # All other iterations are greedy appends: the step's argmax ids chain
    # into the next step's q_tokens ON DEVICE, tokens stream back via async
    # copies, and the host backfills them into the tree lazily — no
    # device->host sync on the decode fast path (SURVEY.md §7 hard part #5).
    structural_fn = getattr(
        branch_controller.branching_function, "structural_iters", None
    )
    structural = (
        structural_fn(branch_controller.tree_templates, max_gen_len)
        if structural_fn is not None
        else None
    )
    # Structural iterations that read no logits VALUES (e.g. speculative
    # decoding replays a predetermined accept schedule): the tree is mutated
    # on host, but the decode step needs no fetch — it enqueues async just
    # like a greedy chain step.
    logits_free_fn = getattr(
        branch_controller.branching_function, "logits_free_iters", None
    )
    logits_free = (
        logits_free_fn(branch_controller.tree_templates, max_gen_len)
        if logits_free_fn is not None
        else frozenset()
    )
    pending = []  # (LogitsView, [(node, token_index, q, col)])
    # chain: where the NEXT step's q_tokens come from —
    #   None                      host plan buffer (tree token values)
    #   ("ids", view)             view's greedy ids, identical row order
    #   ("sel", view, qsrc)       view's top-K ids gathered by the fresh
    #                             leaf_to_q -> (prev_q, col) map (row order
    #                             changed: branch/prune happened)
    chain = None

    def resolve_pending():
        resolve_backfills(pending)

    # K-step greedy decode windows (runner.forward_tree_decode_window): a
    # maximal run of non-structural iterations executes as ONE dispatch of
    # a jitted lax.scan — one fused plan-patch upload + one RPC per W
    # steps instead of several per step.  Decisive over the remote-TPU
    # tunnel (whose per-RPC latency intermittently degrades to 100s of ms)
    # and a strict improvement on healthy links too (the per-step enqueue
    # overhead amortizes by W).  Requires the workload to declare its
    # structural iterations and the single-device plan-patch path.
    WINDOW = 8
    use_windows = (
        structural is not None
        and getattr(model, "_plan_patch", False)
        and getattr(model, "mesh", None) is None
    )

    pre_plan = None  # plan built (and alloc'd) by a window bucket-split
    # Decode windows stay IN FLIGHT: a window dispatch returns without a
    # host sync, later windows' host-side plan builds overlap the device
    # compute, and the oldest window is waited out (charged to forward)
    # only when the in-flight queue exceeds DEFT_PIPE_WINDOWS (ADVICE r4).
    # Depth 1 = the conservative bounded queue.  Deeper queues amortize the
    # transport's PER-SYNC round-trip, which on this environment's remote
    # tunnel intermittently degrades to SECONDS while bandwidth stays fine
    # (measured: a constant 2.47 s stall on every 8th iteration across a
    # whole 3708-iter run, results_r4 reasoning dump — 99% of wall time).
    import os as _os

    pipe_depth = max(1, int(_os.environ.get("DEFT_PIPE_WINDOWS", "1")))
    sync_period = max(1, int(_os.environ.get("DEFT_SYNC_PERIOD", "8")))
    win_inflight = []  # un-synced WindowLogits, oldest first

    # Replay execution (DEFT_REPLAY_EXEC=0 disables): iterations that read
    # no logits VALUES on host — greedy appends, deferred-select replay
    # branchings, logits-free accept schedules — are fully host-
    # deterministic, so instead of dispatching them one by one the loop
    # RECORDS their packed plan buffers and executes the whole span from
    # device-resident slabs (runner.execute_recorded): a handful of
    # host<->device transfers per THOUSANDS of steps.  Decisive on
    # degraded links (each small transfer then costs a large fixed
    # setup, results_r5 transport analysis) and strictly fewer transfers
    # always.  Token values backfill from stacked chunk fetches at flush.
    replay_exec = (
        _os.environ.get("DEFT_REPLAY_EXEC", "1") == "1"
        and getattr(model, "mesh", None) is None
        and not getattr(model, "retain_full_logits", False)
    )
    # Uniform-select recording (deferred workloads): greedy append steps
    # are recorded as top-K/select steps (rows = identity, col 0), so the
    # WHOLE replay — greedy runs AND deferred branch/prune steps — becomes
    # one uniform scannable run (runner._slab_window 'topk'): ~K fewer
    # dispatches per K steps.  Costs the full-vocab top-K sort on steps
    # that only need argmax (~+1.5 ms/step at 8B); decisively cheaper
    # whenever per-op dispatch overhead exceeds that (any degraded link).
    # DEFT_REPLAY_UNIFORM=0 restores the mixed greedy/topk recording.
    replay_uniform = _os.environ.get("DEFT_REPLAY_UNIFORM", "1") == "1"
    supports_deferred = getattr(
        branch_controller.branching_function, "supports_deferred", False)
    rec: list = []            # recorded step dicts (runner.execute_recorded)
    rec_backfills: list = []  # (record_idx, [(node, ti, q, col)])
    rec_chain = None          # mirrors `chain` inside the recorded stream
    rec_prev_view = None      # view the first record chains from
    rec_pm_start = 0          # perf_metrics row index of the first record

    class _RecordView:
        """Stand-in logits view during recording: workloads on the
        recorded path never read values, only the top-K width."""

        def __init__(self, k):
            self.k = k

    def _flush_records():
        """Execute the recorded span, backfill tokens, restore chain."""
        nonlocal rec_chain, rec_prev_view, chain, logits
        if not rec:
            return
        views, last_view, exec_s = model.execute_recorded(
            mode, rec, prev_view=rec_prev_view)
        for i, subs in rec_backfills:
            pending.append((views[i], subs))
        resolve_pending()
        n = len(rec)
        per = exec_s * 1000 / n
        for j in range(rec_pm_start, rec_pm_start + n):
            perf_metrics.forward_per_iter[j] += per
            perf_metrics.iter_time[j] += per
        if rec_chain is None:
            chain = None
        elif rec_chain == "ids":
            chain = ("ids", last_view)
        else:  # ("sel", qsrc)
            chain = ("sel", last_view, rec_chain[1])
        logits = last_view
        rec.clear()
        rec_backfills.clear()
        rec_chain = None
        rec_prev_view = None

    def _drain_window(keep: int = 0):
        """Block on in-flight windows until at most ``keep`` remain; the
        wait is previous-window device time, charged to forward."""
        if len(win_inflight) <= keep:
            return
        import jax

        t_sync = time.perf_counter()
        while len(win_inflight) > keep:
            jax.block_until_ready(win_inflight.pop(0)._vals)
        if perf_metrics.forward_per_iter:
            perf_metrics.forward_per_iter[-1] += (
                time.perf_counter() - t_sync) * 1000

    # liveness heartbeat: the remote-device transport can WEDGE a process
    # outright (all threads futex-waiting — observed repeatedly on this
    # environment); a periodic flushed line lets harnesses (experiments/
    # tpu_session_r4c.sh run_wd) distinguish a wedge from a long compile
    # and kill/retry the phase instead of burning its whole timeout.
    # The same beat writes a .partial PerfMetrics dump so a killed or
    # wedged run still leaves a timestamped partial measurement on disk
    # instead of an empty results directory (VERDICT r4 missing 1-3).
    _hb_last = time.perf_counter()

    if not stop:
        it = 0
        while it + 1 < max_gen_len:
            it += 1
            now = time.perf_counter()
            if now - _hb_last > 60.0:
                _hb_last = now
                print(f"[tree_generate] iter {it}/{max_gen_len} "
                      f"tokens={model.tree.get_tree_token_number()}",
                      file=sys.stderr, flush=True)
                if output_file is not None or perf_metrics.output_file:
                    perf_metrics.generated_len = (
                        model.tree.get_tree_token_number() - prompt_len)
                    perf_metrics.update_decode_latency()
                    perf_metrics.update_attention_latency()
                    perf_metrics.compute_tpot()
                    perf_metrics.dump_partial()
            for name in ("prepare", "branch", "attn_mem", "attn_comp",
                         "traversal", "alloc", "tree_metadata"):
                GlobalTimer.reset(name)
            step_start = time.perf_counter()

            # ---- replay-record fast path ------------------------------
            is_struct_now = structural is None or it in structural
            needs_logits_now = is_struct_now and it not in logits_free
            if replay_exec and pre_plan is None and not needs_logits_now:
                if not rec:
                    if chain is None:
                        rec_chain, rec_prev_view = None, None
                    elif chain[0] == "ids":
                        rec_chain, rec_prev_view = "ids", chain[1]
                    else:
                        rec_chain = ("sel", chain[2])
                        rec_prev_view = chain[1]
                    rec_pm_start = len(perf_metrics.iter_time)
                if (isinstance(rec_chain, tuple) and any(
                        leaf_id not in rec_chain[1]
                        for leaf_id in model.tree.leaves)):
                    # a live leaf made no deferred selection last step:
                    # values must land before the plan packs host tokens
                    _flush_records()
                    resolve_pending()
                    chain = None
                    rec_chain, rec_prev_view = None, None
                    rec_pm_start = len(perf_metrics.iter_time)
                GlobalTimer.start("prepare")
                GlobalTimer.start("alloc")
                model.tree.alloc()
                GlobalTimer.stop("alloc")
                GlobalTimer.start("tree_metadata")
                plan = model.build_plan(mode)
                GlobalTimer.stop("tree_metadata")
                buf, sizes, paged = model._pack_plan(mode, plan)
                buf = np.asarray(buf, np.int32)
                pairs = model.tree.drain_kv_copies()
                if pairs is not None:
                    from deft_tpu.core.kv_pool import DUMP_SLOT
                    from deft_tpu.plan.padding import next_pow2

                    src, dst = pairs
                    n_pad = max(8, next_pow2(len(src)))
                    s = np.full(n_pad, DUMP_SLOT, np.int32)
                    d = np.full(n_pad, DUMP_SLOT, np.int32)
                    s[: len(src)] = src
                    d[: len(dst)] = dst
                    pairs = (s, d)
                if rec_chain is None:
                    ovr = "none"
                elif rec_chain == "ids":
                    ovr = "ids"
                else:
                    qsrc = rec_chain[1]
                    rows = np.zeros(plan.l_pad, np.int32)
                    cols = np.zeros(plan.l_pad, np.int32)
                    for leaf_id, q in model.tree.leaf_to_q.items():
                        rows[q], cols[q] = qsrc[leaf_id]
                    buf = np.concatenate([buf, rows, cols])
                    ovr = "select"
                GlobalTimer.stop("prepare")
                if model.measure_attention:
                    model.last_attn_estimate = (
                        model._measure_attention_bucket(
                            mode, plan, sizes, paged))

                GlobalTimer.start("branch")
                stop = False
                if is_struct_now:
                    deferred = (DeferredSelect(model.topk_k)
                                if supports_deferred else None)
                    stop = branch_controller.apply_branching(
                        model=model,
                        iter=it,
                        max_gen_len=max_gen_len,
                        width=width,
                        depth=depth,
                        logits=_RecordView(model.topk_k),
                        execution_graph=branch_controller.tree_templates,
                        deferred=deferred,
                    )
                    if deferred is not None and deferred.qsrc:
                        kind, fetch = "topk", True
                        rec_backfills.append((len(rec), deferred.backfills))
                        rec_chain = ("sel", deferred.qsrc)
                        wtop = max(c for _, c in deferred.qsrc.values()) + 1
                    else:
                        kind, fetch = "skip", False
                        rec_chain = None
                        wtop = 1
                else:
                    tree = model.tree
                    subs = []
                    qsrc0 = {}
                    for leaf in tree.leaves.values():
                        q = tree.leaf_to_q[leaf.id]
                        leaf.append_token(0)
                        subs.append((leaf, len(leaf.token_ids) - 1, q, 0))
                        qsrc0[leaf.id] = (q, 0)
                    if supports_deferred and replay_uniform:
                        kind, fetch = "topk", True
                        rec_chain = ("sel", qsrc0)
                    else:
                        kind, fetch = "greedy", True
                        rec_chain = "ids"
                    rec_backfills.append((len(rec), subs))
                    wtop = 1
                GlobalTimer.stop("branch")

                if mode.is_sequential:
                    perf_metrics.KV_IO += plan.total_kv * kv_bytes_per_tok
                else:
                    perf_metrics.KV_IO += plan.n_tokens * kv_bytes_per_tok
                    perf_metrics.Mask_IO += (
                        plan.n_tokens * 8 * model.cfg.num_layers)
                rec.append(dict(buf=buf, sizes=sizes, paged=paged,
                                override_kind=ovr, logits_kind=kind,
                                kv_pairs=pairs, fetch=fetch, wtop=wtop))
                attn_est = getattr(model, "last_attn_estimate", None)
                if attn_est:
                    perf_metrics.attn_is_estimate = True
                perf_metrics.update(
                    iter_time=(time.perf_counter() - step_start) * 1000,
                    prepare=GlobalTimer.get("prepare"),
                    forward=0.0,
                    branch=GlobalTimer.get("branch"),
                    attn_mem=attn_est[0] * 1000 if attn_est else 0.0,
                    attn_comp=attn_est[1] * 1000 if attn_est else 0.0,
                    alloc=GlobalTimer.get("alloc"),
                    tree_metadata=GlobalTimer.get("tree_metadata"),
                )
                if stop:
                    _flush_records()
                    break
                continue
            if rec:
                # a logits-reading iteration follows: execute the span now
                _flush_records()

            # ---- window fast path -------------------------------------
            if (use_windows and pre_plan is None
                    and (chain is None or chain[0] == "ids")):
                W = 0
                while (it + W < max_gen_len and W < WINDOW
                       and (it + W) not in structural
                       and (it + W) not in logits_free):
                    W += 1
                if W >= 2:
                    import jax

                    tree = model.tree
                    plans, subs_per = [], []
                    sig0 = None
                    GlobalTimer.start("prepare")
                    with tracer.span("plan_build_window"):
                        for j in range(W):
                            GlobalTimer.start("alloc")
                            tree.alloc()
                            GlobalTimer.stop("alloc")
                            GlobalTimer.start("tree_metadata")
                            plan = model.build_plan(mode)
                            GlobalTimer.stop("tree_metadata")
                            _, sizes, paged = model._pack_plan(mode, plan)
                            if sig0 is None:
                                sig0 = (sizes, paged)
                            elif (sizes, paged) != sig0:
                                # bucket grew mid-window: this sub-step
                                # (already alloc'd) runs per-step below
                                pre_plan = plan
                                break
                            plans.append(plan)
                            subs = []
                            for leaf in tree.leaves.values():
                                q = tree.leaf_to_q[leaf.id]
                                leaf.append_token(0)
                                subs.append(
                                    (leaf, len(leaf.token_ids) - 1, q, 0))
                            subs_per.append(subs)
                    GlobalTimer.stop("prepare")
                    Wd = len(plans)
                    if Wd == 0:
                        pass  # first plan already broke the bucket: step it
                    else:
                        # older windows' device waits happen HERE — after
                        # this window's plans were built (overlap), before
                        # its dispatch (queue bounded at pipe_depth)
                        _drain_window(keep=pipe_depth - 1)
                        q0 = chain[1].greedy_ids_device if chain else None
                        with tracer.span("decode_window"):
                            view, fwd_t = model.forward_tree_decode_window(
                                mode, plans, q0)
                            view.fetch_async()
                        win_inflight.append(view)
                        for j, subs in enumerate(subs_per):
                            pending.append((view.step_view(j), subs))
                        chain = ("ids", view)
                        logits = view
                        stop = False
                        for plan in plans:
                            if mode.is_sequential:
                                perf_metrics.KV_IO += (
                                    plan.total_kv * kv_bytes_per_tok)
                            else:
                                perf_metrics.KV_IO += (
                                    plan.n_tokens * kv_bytes_per_tok)
                                perf_metrics.Mask_IO += (
                                    plan.n_tokens * 8 * model.cfg.num_layers)
                        iter_cost = (time.perf_counter() - step_start) * 1000
                        attn_est = getattr(model, "last_attn_estimate", None)
                        attn_mem_ms, attn_comp_ms = (
                            (attn_est[0] * 1000, attn_est[1] * 1000)
                            if attn_est else (0.0, 0.0))
                        if attn_est:
                            perf_metrics.attn_is_estimate = True
                        for _ in range(Wd):
                            perf_metrics.update(
                                iter_time=iter_cost / Wd,
                                prepare=GlobalTimer.get("prepare") / Wd,
                                forward=fwd_t * 1000 / Wd,
                                branch=0.0,
                                attn_mem=attn_mem_ms,
                                attn_comp=attn_comp_ms,
                                traversal=0.0,
                                alloc=GlobalTimer.get("alloc") / Wd,
                                tree_metadata=(
                                    GlobalTimer.get("tree_metadata") / Wd),
                            )
                        it += Wd - 1
                        continue
            # ---- per-step path ----------------------------------------
            if chain is None and pending:
                # the step will pack host token values (no device chain) but
                # placeholders are outstanding — resolve before plan build
                resolve_pending()
            if chain is not None and chain[0] == "sel" and any(
                leaf_id not in chain[2] for leaf_id in model.tree.leaves
            ):
                # a live leaf made no deferred selection last step (workload
                # bug or exotic schedule): fall back to host token values
                resolve_pending()
                chain = None

            GlobalTimer.start("prepare")
            with tracer.span("plan_build"):
                if pre_plan is not None:
                    # alloc + plan already done by the window bucket-split
                    plan, pre_plan = pre_plan, None
                else:
                    GlobalTimer.start("alloc")
                    model.tree.alloc()
                    GlobalTimer.stop("alloc")
                    GlobalTimer.start("tree_metadata")
                    plan = model.build_plan(mode)
                    GlobalTimer.stop("tree_metadata")
            GlobalTimer.stop("prepare")
            # in-flight windows beyond the queue bound must land before this
            # step's dispatch (their wait is previous-window device time:
            # charge it to forward); structural steps that do need logits
            # values sync inherently in resolve_pending below
            _drain_window(keep=pipe_depth - 1)

            is_struct = structural is None or it in structural
            needs_logits = is_struct and it not in logits_free
            supports_deferred = getattr(
                branch_controller.branching_function,
                "supports_deferred", False)
            # How much of the logits head this step must compute:
            #   non-structural greedy appends consume only column 0 ->
            #   argmax instead of the full-vocab top-K sort ("greedy");
            #   logits-free structural steps WITHOUT deferred selection
            #   (pure replay: tokens predetermined by the template) never
            #   read the view at all -> skip the lm_head matmul ("skip")
            if not is_struct:
                logits_kind = "greedy"
            elif not needs_logits and not supports_deferred:
                logits_kind = "skip"
            else:
                logits_kind = "topk"
            override = select = None
            if chain is not None and chain[0] == "ids":
                override = chain[1].greedy_ids_device
            elif chain is not None:
                _, view_prev, qsrc = chain
                import numpy as _np

                rows = _np.zeros(plan.l_pad, _np.int32)
                cols = _np.zeros(plan.l_pad, _np.int32)
                for leaf_id, q in model.tree.leaf_to_q.items():
                    rows[q], cols[q] = qsrc[leaf_id]
                select = (view_prev.ids_device, rows, cols)
            with tracer.span("decode_step"):
                logits, fwd_t = model.forward_tree_decode(
                    mode, plan, q_tokens_override=override,
                    q_select=select, block=needs_logits,
                    logits_kind=logits_kind,
                )

            # analytic KV/mask IO accounting (per layer x layers)
            if mode.is_sequential:
                perf_metrics.KV_IO += plan.total_kv * kv_bytes_per_tok
            elif mode is ForwardMode.UNPAGED_MEDUSA:
                # dense masked baseline: the per-layer IO model covers KV,
                # materialized scores, mask and softmax intermediates
                for _ in range(model.cfg.num_layers):
                    perf_metrics.update_dense_tree_attn_IO(
                        plan.n_leaves, plan.n_tokens,
                        model.cfg.num_kv_heads * model.cfg.head_dim,
                        model.cfg.num_q_heads,
                    )
            else:
                perf_metrics.KV_IO += plan.n_tokens * kv_bytes_per_tok
                perf_metrics.Mask_IO += plan.n_tokens * 8 * model.cfg.num_layers

            GlobalTimer.start("branch")
            tracer_branch = tracer.span("branch")
            tracer_branch.__enter__()
            if is_struct:
                deferred = (
                    DeferredSelect(logits.k)
                    if not needs_logits and supports_deferred
                    else None
                )
                if needs_logits or (pending and deferred is None):
                    # backfills must land before the tree mutates (pending
                    # is empty on pure-replay workloads like spec decoding,
                    # so their logits-free pipeline never blocks here)
                    resolve_pending()
                stop = branch_controller.apply_branching(
                    model=model,
                    iter=it,
                    max_gen_len=max_gen_len,
                    width=width,
                    depth=depth,
                    logits=logits,
                    execution_graph=branch_controller.tree_templates,
                    deferred=deferred,
                )
                if deferred is not None and deferred.qsrc:
                    logits.fetch_async()
                    pending.append((logits, deferred.backfills))
                    chain = ("sel", logits, deferred.qsrc)
                else:
                    chain = None
                # logits-free structural steps pipeline like greedy steps;
                # bound the async queue the same way (see comment below)
                if not needs_logits and it % sync_period == 0:
                    import jax

                    t_sync = time.perf_counter()
                    jax.block_until_ready(logits._vals)
                    fwd_t += time.perf_counter() - t_sync
            else:
                # greedy append: placeholder tokens now, values backfilled
                # from the async fetch at the next structural iteration
                tree = model.tree
                backfills = []
                for leaf in tree.leaves.values():
                    q = tree.leaf_to_q[leaf.id]
                    leaf.append_token(0)
                    backfills.append((leaf, len(leaf.token_ids) - 1, q, 0))
                logits.fetch_async()
                pending.append((logits, backfills))
                chain = ("ids", logits)
                stop = False
                # bound the async queue: an unbounded enqueue storm (hundreds
                # of steps x MB-scale plan uploads) can wedge slow transports;
                # syncing every few steps amortizes the fetch RTT without
                # limiting device pipelining.  The wait is device decode time
                # for the whole window, so charge it to this step's forward.
                # DEFT_SYNC_PERIOD widens the stride when the transport's
                # per-sync round-trip degrades to seconds (see pipe notes).
                if it % sync_period == 0:
                    import jax

                    t_sync = time.perf_counter()
                    jax.block_until_ready(logits._vals)
                    fwd_t += time.perf_counter() - t_sync
            tracer_branch.__exit__(None, None, None)
            GlobalTimer.stop("branch")

            iter_cost = (time.perf_counter() - step_start) * 1000
            # attention attribution: per-bucket microbench estimate
            # (runner._measure_attention_bucket); 0 when measurement is off
            attn_est = getattr(model, "last_attn_estimate", None)
            attn_mem_ms, attn_comp_ms = (
                (attn_est[0] * 1000, attn_est[1] * 1000) if attn_est else
                (GlobalTimer.get("attn_mem"), GlobalTimer.get("attn_comp"))
            )
            if attn_est:
                perf_metrics.attn_is_estimate = True
            perf_metrics.update(
                iter_time=iter_cost,
                prepare=GlobalTimer.get("prepare"),
                forward=fwd_t * 1000,
                branch=GlobalTimer.get("branch"),
                attn_mem=attn_mem_ms,
                attn_comp=attn_comp_ms,
                traversal=GlobalTimer.get("traversal"),
                alloc=GlobalTimer.get("alloc"),
                tree_metadata=GlobalTimer.get("tree_metadata"),
            )
            if stop:
                break
        # drain the device pipeline: async steps only enqueue, so the last
        # window's device time must be waited out and charged to decode
        # latency (decode_latency = sum(forward_per_iter)) before the e2e
        # clock stops
        import jax

        _flush_records()
        _drain_window(keep=0)
        t_sync = time.perf_counter()
        try:
            jax.block_until_ready(logits._vals)
        except Exception:
            pass
        if perf_metrics.forward_per_iter:
            perf_metrics.forward_per_iter[-1] += (
                time.perf_counter() - t_sync
            ) * 1000
        resolve_pending()

    e2e = (time.perf_counter() - start_time) * 1000
    perf_metrics.update_e2e_latency(e2e)
    perf_metrics.prompt_len = prompt_len
    perf_metrics.generated_len = model.tree.get_tree_token_number() - prompt_len
    perf_metrics.update_decode_latency()
    perf_metrics.update_attention_latency()
    perf_metrics.compute_tpot()
    perf_metrics.dump()
    if print_branches:
        model.tree.print_finished_branches(tokenizer)
    model.tree.free()
    model.token_to_kv_pool.clear()
    model.req_to_token_pool.clear()
    return perf_metrics

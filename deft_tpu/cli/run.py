"""Experiment driver CLI.

Flag parity with the reference driver
(/root/reference/DeFT/examples/run_DeFT_llama_paged.py:269-316): --model,
--mode, --mem, --Branch_controller, --dataset, --traversal, --max_depth,
--max_width, --prompt_len, --max_seq_len, --tree_idx, --output_file.

TPU/no-egress additions: --random-model tiny|1b|8b runs random-init weights
with matching architecture shapes (HF downloads are impossible here; --model
accepts a *local* HF checkpoint directory), --kernels pallas|xla, --platform
cpu|tpu, --block_len, --print-branches.

Usage:
    python -m deft_tpu.cli.run --random-model tiny --mode flatten \
        --Branch_controller Simple_Tree --max_width 4 --max_seq_len 64
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="deft_tpu tree-decoding driver")
    p.add_argument("--model", type=str, default=None,
                   help="local HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--random-model", type=str, default=None,
                   choices=["tiny", "1b", "3b", "7b", "8b", "8b-8l",
                            "mixtral-6l"],
                   help="random-init preset (no weights needed)")
    p.add_argument("--mode",
                   choices=["node", "seq", "flatten", "tree", "node_chunk",
                            "tree_index"],
                   default="flatten")
    p.add_argument("--mem", choices=["paged", "unpaged"], default="paged")
    p.add_argument("--Branch_controller",
                   choices=["Simple_Tree", "Beam_Search", "Random_Tree",
                            "Practical_Tree", "Speculative_Decoding"],
                   default="Simple_Tree")
    p.add_argument("--dataset", type=str, default=None,
                   help="tree-template JSON (Practical_Tree /"
                        " Speculative_Decoding)")
    p.add_argument("--traversal", choices=["dfs", "bfs_token", "bfs_node"],
                   default="dfs",
                   help="accepted for parity; plans always use DFS (the"
                        " reference's non-dfs options are dead code,"
                        " tree_cache.py:588,725)")
    p.add_argument("--max_depth", type=int, default=10)
    p.add_argument("--max_width", type=int, default=50)
    p.add_argument("--prompt_len", type=int, default=None)
    p.add_argument("--max_seq_len", type=int, default=500)
    p.add_argument("--tree_idx", type=int, default=0)
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--kernels", choices=["auto", "pallas", "xla"],
                   default="auto")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--block_len", type=int, default=256)
    p.add_argument("--node_chunk_len", type=int, default=None,
                   help="node_chunk mode: max tokens of one node per kernel"
                        " block (default --block_len; reference MAX_BLOCK_LEN,"
                        " run_DeFT_llama_paged.py:146-150)")
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--kv-dtype", choices=["inherit", "int8"],
                   default="inherit",
                   help="int8: quantized KV cache (per-token-head scales)")
    p.add_argument("--weight-dtype",
                   choices=["inherit", "int8", "int8-pallas"],
                   default="inherit",
                   help="int8: weight-only quantized matmuls (per-out-channel"
                        " scales; fits 8B-class models on one v5e chip);"
                        " int8-pallas routes decode matmuls through the"
                        " explicit dequant-in-matmul kernel"
                        " (ops/int8_matmul.py)")
    p.add_argument("--kv_pool_slots", type=int, default=None)
    p.add_argument("--print-branches", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--trace-dir", type=str, default=None,
                   help="write a jax.profiler trace of the run here"
                        " (TensorBoard-loadable; the reference's NVTX analog)")
    p.add_argument("--mesh", type=str, default=None, metavar="DPxSPxTP",
                   help="run the sharded engine on a (dp, sp, tp) device"
                        " mesh, e.g. 1x1x4 (default: single device; 'auto'"
                        " spans all visible devices)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize first (pod / multi-host"
                        " launch; run one process per host)")
    p.add_argument("--batch", type=int, default=1,
                   help="N>1: drive N requests of this workload through the"
                        " continuous-batching engine (shared pools, one"
                        " jitted step per global decode iteration; no"
                        " reference counterpart)")
    return p


class _IdTokenizer:
    """Fallback tokenizer for random-init models: ids <-> 'ids'."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def encode(self, text: str):
        # numeric tokens map directly; anything else (real dataset prompts
        # under a random-init model) hashes stably into the vocab.
        # isdecimal (not isdigit) so unicode digits like "²" fall through to
        # the hash instead of crashing int()
        def tok(t: str) -> int:
            body = t[1:] if t.startswith("-") else t
            if body.isdecimal():
                return int(t) % self.vocab_size
            return (zlib.crc32(t.encode()) % (self.vocab_size - 4)) + 4

        return [tok(t) for t in text.split()]

    def decode(self, ids, **kw):
        return " ".join(str(int(t)) for t in ids)


def _load_model_and_tokenizer(args):
    from deft_tpu.config import AttentionConfig, EngineConfig
    from deft_tpu.models import PRESETS, LlamaConfig
    from deft_tpu.runtime import ModelRunner

    ecfg = EngineConfig(
        attention=AttentionConfig(
            block_len=args.block_len,
            node_chunk_len=(args.node_chunk_len or args.block_len)
            if args.mode == "node_chunk" else None,
        ),
        kv_pool_slots=args.kv_pool_slots,
        dtype=args.dtype,
        kv_dtype=args.kv_dtype,
        weight_dtype=args.weight_dtype,
    )
    topk_k = max(64, args.max_width)
    use_tree_index = args.mode == "tree_index"

    mesh = None
    if args.mesh:
        from deft_tpu.parallel import make_mesh

        def _mesh_for(cfg):
            if args.mesh == "auto":
                return make_mesh(num_kv_heads=cfg.num_kv_heads)
            dp, sp, tp = (int(x) for x in args.mesh.lower().split("x"))
            return make_mesh(dp * sp * tp, num_kv_heads=cfg.num_kv_heads,
                             shape=(dp, sp, tp))
    if args.random_model:
        cfg = PRESETS[args.random_model]
        mesh = _mesh_for(cfg) if args.mesh else None
        runner = ModelRunner(cfg, ecfg, kernels=args.kernels, seed=args.seed,
                             topk_k=topk_k, use_tree_index=use_tree_index,
                             mesh=mesh)
        tokenizer = _IdTokenizer(cfg.vocab_size)
    elif args.model:
        cfg_path = os.path.join(args.model, "config.json")
        import json

        with open(cfg_path) as f:
            cfg = LlamaConfig.from_hf_config(json.load(f))
        mesh = _mesh_for(cfg) if args.mesh else None
        runner = ModelRunner(cfg, ecfg, model_path=args.model,
                             kernels=args.kernels, topk_k=topk_k,
                             use_tree_index=use_tree_index, mesh=mesh)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            tokenizer = _IdTokenizer(cfg.vocab_size)
    else:
        raise SystemExit("need --model <local hf dir> or --random-model")
    return runner, tokenizer


def _make_prompt(args, tokenizer, template) -> list:
    """Prompt ids: template text if available, padded/trimmed to
    --prompt_len (the reference pads likewise, run_DeFT_llama_paged.py:176)."""
    ids = []
    if template is not None and getattr(template, "prompt", None):
        ids = list(tokenizer.encode(template.prompt))
    if args.prompt_len:
        if len(ids) >= args.prompt_len:
            ids = ids[: args.prompt_len]
        else:
            vocab = getattr(tokenizer, "vocab_size", 32000)
            import random

            rnd = random.Random(args.seed)
            ids = ids + [rnd.randrange(4, max(8, vocab - 1))
                         for _ in range(args.prompt_len - len(ids))]
    if not ids:
        ids = list(range(7, 7 + min(16, max(2, args.max_seq_len // 2))))
    return ids


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.prompt_len is not None and args.prompt_len <= 0:
        args.prompt_len = None
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from deft_tpu.parallel.multihost import init_runtime

        init_runtime()
    print("Generation starts with arguments:",
          ", ".join(f"{k}={v}" for k, v in vars(args).items()))

    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.data.loader import (
        generate_accepted_len_list,
        load_prompts,
        load_trees,
    )
    from deft_tpu.runtime import mode_from_cli, tree_generate

    mode = mode_from_cli(args.mode, args.mem)

    template = None
    if args.Branch_controller == "Practical_Tree":
        if args.dataset in (None, "synthetic"):
            from deft_tpu.data.synthetic import synth_tot_tree

            template = synth_tot_tree(
                seed=args.seed + args.tree_idx,
                width=min(args.max_width, 4),
                max_leaves=args.max_width,
                total_iters=max(8, args.max_seq_len
                                - (args.prompt_len or 16) - 1),
            )
        else:
            template = load_trees(args.dataset)[args.tree_idx]
    elif args.Branch_controller == "Speculative_Decoding":
        if args.dataset in (None, "synthetic"):
            from deft_tpu.data.synthetic import synth_spec_tree

            template = synth_spec_tree(
                token_tree_size=args.max_width,
                gen_len=max(8, args.max_seq_len - (args.prompt_len or 16) - 1),
                seed=args.seed + args.tree_idx,
            )
        else:
            template = load_prompts(args.dataset)[args.tree_idx]

    controller = Branch_Controller({
        "Simple_Tree": workloads.simple_tree,
        "Beam_Search": workloads.beam_search,
        "Random_Tree": workloads.random_tree,
        "Practical_Tree": workloads.practical_tree,
        "Speculative_Decoding": workloads.speculative_decoding,
    }[args.Branch_controller])

    runner, tokenizer = _load_model_and_tokenizer(args)
    prompt_ids = _make_prompt(args, tokenizer, template)
    if template is not None and template.accepted_len_list is not None:
        generate_accepted_len_list(args.max_seq_len - len(prompt_ids),
                                   template, seed=args.seed)

    if args.batch > 1:
        import time as _time

        from deft_tpu.runtime.batched import BatchedEngine, Request

        eng = BatchedEngine(runner, mode=mode)
        reqs = []
        for i in range(args.batch):
            ctl = Branch_Controller(controller.branching_function)
            reqs.append(Request(
                prompt_ids, ctl, args.max_seq_len,
                width=args.max_width, depth=args.max_depth,
                template=template,
            ))
        t0 = _time.perf_counter()
        eng.add_requests(reqs)
        eng.run()
        wall = _time.perf_counter() - t0
        tok = sum(len(s.token_ids) for r in reqs for s in r.finished_seqs)
        print(f"batched: {args.batch} requests, {tok} generated tokens, "
              f"{wall * 1000:.1f} ms wall, "
              f"{wall * 1000 / max(tok, 1):.4f} ms/token aggregate")
        if args.print_branches:
            for i, r in enumerate(reqs):
                for s in r.finished_seqs:
                    print(f"req {i} branch {s.id}: "
                          f"{tokenizer.decode(s.token_ids)}")
        return 0

    from deft_tpu.obs.tracing import Tracer

    tracer = Tracer(args.trace_dir)
    with tracer.session():
        pm = tree_generate(
            model=runner,
            mode=mode,
            tokenizer=tokenizer,
            prompt_ids=prompt_ids,
            max_seq_len=args.max_seq_len,
            width=args.max_width,
            depth=args.max_depth,
            branch_controller=controller,
            tree_template=template,
            output_file=args.output_file,
            print_branches=args.print_branches,
            tracer=tracer,
        )
    pm.print_latency()
    return 0


if __name__ == "__main__":
    sys.exit(main())

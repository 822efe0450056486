"""deft_tpu — a TPU-native tree-attention inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
LINs-lab/DeFT (ICLR'25): exact, IO-aware attention for tree-structured LLM
decoding (few-shot prompting, multi-step ToT reasoning, beam search,
speculative decoding) where many decoding branches share token prefixes.

Architecture (TPU-first, not a port — reference is single-GPU Triton/torch):

- ``core``     host-side decoding-tree runtime: TreeCache (branch/cut/merge
               with KV refcounts), paged token-KV pool, per-leaf page table.
- ``plan``     per-step attention-plan builders that map the ragged tree to
               static-shape, padded device arrays.  The flagship plan orders
               tree KV in DFS order and numbers leaves in DFS order so every
               tree node's descendant leaves form a *contiguous interval* —
               the reference's per-token query bitmasks + atomic LSE
               reduction (tree_attention.py:296-548) collapse into a
               [lo, hi) leaf-range mask inside one flash-attention kernel.
- ``ops``      Pallas TPU kernels: prefill flash attention, DeFT-Flatten
               tree attention, DeFT-Node variants, sequential flash-decoding
               baseline, plus a dense XLA oracle.
- ``models``   Llama-family model executor (pytree params, HF safetensors
               loading, RoPE incl. Llama-3 scaling).
- ``runtime``  jitted prefill / tree-decode steps with shape bucketing, the
               tree_generate loop, sampling.
- ``control``  branch controllers: the four reference workloads.
- ``parallel`` mesh / sharding: TP-sharded heads, DP over trees, and
               sequence-parallel KV blocks with cross-chip LSE combine.
- ``obs``      timers, PerfMetrics (JSON-compatible with the reference
               dumps), logging.
- ``data``     tree-template / speculative-decoding dataset loaders.
"""

__version__ = "0.1.0"

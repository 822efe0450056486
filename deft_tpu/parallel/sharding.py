"""NamedSharding specs for params, KV pools, and decode batches.

Layouts (stacked-layer param tree from models/loader.py):

- ``wq/wk/wv/wg/wu`` column-parallel on the output axis (tp); ``wo/wdown``
  row-parallel on the input axis (tp) — the partial sums after o_proj /
  down_proj are combined by the psum XLA inserts (Megatron pattern over ICI).
- ``lm_head`` vocab-sharded (tp); embed replicated (cheap token gathers).
- KV pools (layers, slots, kv_heads, head_dim) sharded on kv_heads (tp) —
  every chip holds the full token range of its own heads, so the flatten
  kernel needs no cross-chip traffic for the KV gather.
- Decode batch: query rows (leaves) on dp; the flattened tree-KV token axis
  on sp (cross-chip partial-LSE combine, DeFT's stage-2 generalized).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    return {
        "embed": s(),
        "ln1": s(),
        "wq": s(None, None, "tp"),
        "wk": s(None, None, "tp"),
        "wv": s(None, None, "tp"),
        "wo": s(None, "tp", None),
        "ln2": s(),
        "wg": s(None, None, "tp"),
        "wu": s(None, None, "tp"),
        "wdown": s(None, "tp", None),
        "ln_f": s(),
        "lm_head": s(None, "tp"),
        # Weight-only int8 per-output-channel scales follow their weight's
        # output axis: (L, out) for stacked layers, (V,) for lm_head.
        # Row-parallel weights (wo/wdown) have an unsharded output axis.
        "wq_s": s(None, "tp"),
        "wk_s": s(None, "tp"),
        "wv_s": s(None, "tp"),
        "wo_s": s(),
        "wg_s": s(None, "tp"),
        "wu_s": s(None, "tp"),
        "wdown_s": s(),
        "lm_head_s": s("tp"),
        # explicit Pallas-int8 scales (_sp) shard like the XLA-fused ones
        "wq_sp": s(None, "tp"),
        "wk_sp": s(None, "tp"),
        "wv_sp": s(None, "tp"),
        "wo_sp": s(),
        "wg_sp": s(None, "tp"),
        "wu_sp": s(None, "tp"),
        "wdown_sp": s(),
        "lm_head_sp": s("tp"),
        # Qwen2-family qkv biases follow their weight's output (head) axis;
        # Qwen3 per-head q/k norm weights are (L, head_dim) — replicated
        "bq": s(None, "tp"),
        "bk": s(None, "tp"),
        "bv": s(None, "tp"),
        "ln_q": s(),
        "ln_k": s(),
        # Mixtral router (L, E, NE): tiny, replicated
        "wrt": s(),
    }


# Names whose tensors gain a leading (num_experts) axis under MoE configs.
_EXPERT_NAMES = frozenset(
    w + suf for w in ("wg", "wu", "wdown") for suf in ("", "_s", "_sp")
)


def _widen_for_experts(mesh: Mesh, name: str, spec: P, shape) -> P:
    """MoE expert tensors carry an extra (num_experts) axis (after the
    stacked-layer axis) on top of the dense-MLP layout the table above
    describes.  That axis shards over **sp** — expert parallelism: sp is
    idle during MLP compute, each chip then holds num_experts/sp experts
    (the memory cut that fits Mixtral-scale expert stacks), and the dense
    decode einsum's contraction over the expert axis makes GSPMD insert
    the top-k combine psum over sp automatically (routing weights are
    replicated).  Falls back to replicating the axis when sp does not
    divide the expert count.  tp keeps the Megatron column/row cut of
    every expert's inner matmul dims."""
    if name in _EXPERT_NAMES and len(shape) == len(spec) + 1 and len(spec):
        sp = mesh.shape.get("sp", 1)
        ep = "sp" if sp > 1 and shape[1] % sp == 0 else None
        return P(spec[0], ep, *spec[1:])
    return spec


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place a param pytree (bf16 or weight-only-int8) onto the mesh.
    Fused single-chip tensors (loader.fuse_params) are split back first —
    TP head-sharding needs per-projection boundaries."""
    from deft_tpu.models.loader import unfuse_params

    params = unfuse_params(params)
    ps = param_shardings(mesh)
    return {
        k: jax.device_put(
            v,
            NamedSharding(mesh, _widen_for_experts(mesh, k, ps[k].spec,
                                                   v.shape)),
        )
        for k, v in params.items()
    }


def pool_sharding(mesh: Mesh) -> NamedSharding:
    """(layers, slots, kv_heads*head_dim): the flattened head axis is
    head-contiguous, so sharding it across tp splits whole heads."""
    return NamedSharding(mesh, P(None, None, "tp"))


def batch_shardings(mesh: Mesh, batch) -> Any:
    """Shardings matching the batch namedtuple type (DecodeBatch / SeqBatch /
    PrefillBatch)."""
    def s(*spec):
        return NamedSharding(mesh, P(*spec))

    name = type(batch).__name__
    if name == "DecodeBatch":
        return type(batch)(
            q_tokens=s("dp"),
            q_pos=s("dp"),
            out_loc=s("dp"),
            kv_idx=s("sp"),
            tok_lo=s("sp"),
            tok_hi=s("sp"),
            blk_lo=s(),
            blk_hi=s(),
            # paged DMA segment table: replicated (the Pallas shard_map path
            # re-derives per-shard tables; the GSPMD path ignores it)
            seg_src=s() if batch.seg_src is not None else None,
        )
    if name == "SeqBatch":
        return type(batch)(
            q_tokens=s("dp"),
            q_pos=s("dp"),
            out_loc=s("dp"),
            paths=s("dp", "sp"),
            seq_lens=s("dp"),
            # paged in-kernel read tables: replicated when present
            seg_src=s() if batch.seg_src is not None else None,
            seg_off=s() if batch.seg_off is not None else None,
            seg_live=s() if batch.seg_live is not None else None,
            blk_live=s() if batch.blk_live is not None else None,
        )
    if name == "PrefillBatch":
        return type(batch)(
            tokens=s("sp"),
            positions=s("sp"),
            out_loc=s("sp"),
            length=s(),
        )
    raise TypeError(name)


def shard_pool(mesh, pool):
    data = jax.device_put(pool.data, pool_sharding(mesh))
    scale = (
        jax.device_put(pool.scale, NamedSharding(mesh, P(None, "tp", None)))
        if pool.scale is not None
        else None
    )
    return type(pool)(data, scale)


def shard_decode_args(mesh: Mesh, params, k_pool, v_pool, batch):
    """Place (params, pools, batch) onto the mesh with the specs above."""
    params = shard_params(mesh, params)
    k_pool = shard_pool(mesh, k_pool)
    v_pool = shard_pool(mesh, v_pool)
    bs = batch_shardings(mesh, batch)
    batch = type(batch)(*(jax.device_put(x, s) for x, s in zip(batch, bs)))
    return params, k_pool, v_pool, batch

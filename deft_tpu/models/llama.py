"""Llama-family model executor (pure-function forward over a pytree).
Covers Llama/TinyLlama/Mistral-shaped checkpoints, Qwen2-family (qkv-bias),
Qwen3-family (per-head q/k RMSNorm), Gemma-1 (GeGLU, sqrt(hidden)-scaled
embeddings, (1+w) RMSNorm), Mixtral (sparse MoE) and Phi-3 (fused-qkv
checkpoints, LongRoPE) ones — verified against transformers'
implementations in tests/test_hf_parity.py.

Parity surface: /root/reference/DeFT/deft/models/llama2.py (LlamaMLP :24-48,
LlamaAttention :51-113, LlamaDecoderLayer :116-177, LlamaModel :180-222) and
layers/{layernorm,activation,linear,logits_processor}.py.

TPU-first design:
- One ``lax.scan`` over stacked layer params: a single compiled decoder-layer
  body regardless of depth (compile time O(1) in layers).
- The paged KV pools (num_layers, slots, kv_heads, head_dim) ride the scan
  carry and are updated with scatter-at; under donation XLA performs these
  in place.
- Attention is a pluggable callable so every ForwardMode shares this forward:
  the DeFT-Flatten Pallas kernel, the DeFT-Node variant, the sequential
  flash-decoding baseline, and the dense medusa oracle.
- All norm/softmax math fp32, matmuls bf16 with fp32 accumulation.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from deft_tpu.models.config import LlamaConfig


class DecodeBatch(NamedTuple):
    """One tree-decode step (shapes static per bucket; see plan/)."""

    q_tokens: jnp.ndarray  # (R,) int32
    q_pos: jnp.ndarray     # (R,) int32
    out_loc: jnp.ndarray   # (R,) int32 pool slots for new K/V
    kv_idx: jnp.ndarray    # (T,) int32 tree KV slots (DFS) — flatten modes
    tok_lo: jnp.ndarray    # (T,) int32
    tok_hi: jnp.ndarray    # (T,) int32
    blk_lo: jnp.ndarray    # (B,) int32
    blk_hi: jnp.ndarray    # (B,) int32
    # (B * block_len/seg_len,) int32 DMA segment table for the in-kernel
    # paged gather; None on plans that fell back to the XLA-gather path.
    seg_src: Optional[jnp.ndarray] = None


class SeqBatch(NamedTuple):
    """One decode step for the sequential (per-leaf) baseline."""

    q_tokens: jnp.ndarray  # (R,) int32
    q_pos: jnp.ndarray     # (R,) int32
    out_loc: jnp.ndarray   # (R,) int32
    paths: jnp.ndarray     # (R, C) int32 per-leaf KV slots (gather path)
    seq_lens: jnp.ndarray  # (R,) int32
    # In-kernel paged-read tables (ops/paged_seq_attn.py); None on the
    # XLA-gather fallback:
    seg_src: Optional[jnp.ndarray] = None   # (R * nb * spb,) int32
    seg_off: Optional[jnp.ndarray] = None   # (R * nb * spb,) int32
    seg_live: Optional[jnp.ndarray] = None  # (R * nb * spb,) int32
    blk_live: Optional[jnp.ndarray] = None  # (R * nb,) int32


class PrefillBatch(NamedTuple):
    tokens: jnp.ndarray     # (P,) int32
    positions: jnp.ndarray  # (P,) int32
    out_loc: jnp.ndarray    # (P,) int32
    length: jnp.ndarray     # () int32 true prompt length


class RaggedPrefillBatch(NamedTuple):
    """B prompts concatenated along the token axis (reference ragged-batch
    prefill, context_flashattention_nopad.py:132-195 — start_loc/seqlen
    re-expressed as per-token segment ids for static TPU shapes)."""
    tokens: jnp.ndarray     # (P,) int32 concatenated prompt tokens (padded)
    positions: jnp.ndarray  # (P,) int32 position within own prompt
    out_loc: jnp.ndarray    # (P,) int32 KV slot per token (DUMP for pads)
    seg_ids: jnp.ndarray    # (P,) int32 prompt index per token; pads -1
    last_idx: jnp.ndarray   # (B,) int32 index of each prompt's final token


class KVPool(NamedTuple):
    """Paged KV arena for one of K/V.  ``data`` is token-major and
    head-flattened: (L, S, Hkv*D) — one pool row is every head's K (or V)
    for a token, stored exactly in the layout the paged kernel DMAs
    (reshaping a pool per kernel call would relayout gigabytes per layer).
    int8 adds per-(token, head) fp32 ``scale`` stored head-major
    (L, Hkv, S) — the layout whose per-head rows the int8 kernel DMAs as
    lane vectors for post-matmul dequant; int8 KV halves HBM footprint and
    attention KV IO (no reference counterpart; SURVEY.md §7 item 8)."""

    data: jnp.ndarray
    scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.scale is not None


def kv_store(pool: KVPool, li, out_loc, x) -> KVPool:
    """Scatter new per-token K or V rows (n, Hkv, D) into the pool,
    quantizing if the pool is int8."""
    n, Hkv, D = x.shape
    if not pool.quantized:
        return pool._replace(
            data=pool.data.at[li, out_loc].set(
                x.reshape(n, Hkv * D).astype(pool.data.dtype)
            )
        )
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)  # (n, Hkv)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    # mixed scalar+slice+array indexing fronts advanced dims: the (L, Hkv, S)
    # scale pool takes the (n, Hkv) update directly
    return KVPool(
        pool.data.at[li, out_loc].set(q.reshape(n, Hkv * D)),
        pool.scale.at[li, :, out_loc].set(s),
    )


def kv_gather_heads(pool: KVPool, li, idx, head_dim: int,
                    out_dtype) -> jnp.ndarray:
    """Gather + dequantize pool rows, un-flattening the head axis:
    idx (T,) -> (T, Hkv, head_dim); idx (R, C) -> (R, C, Hkv, head_dim)."""
    d = pool.data[li][idx]  # (..., Hkv*D)
    Hkv = d.shape[-1] // head_dim
    d = d.reshape(d.shape[:-1] + (Hkv, head_dim))
    if not pool.quantized:
        return d
    s = jnp.moveaxis(pool.scale[li][:, idx], 0, -1)  # (..., Hkv)
    return (d.astype(jnp.float32) * s[..., None]).astype(out_dtype)


def mm(x: jnp.ndarray, p: Dict[str, jnp.ndarray], name: str) -> jnp.ndarray:
    """x @ p[name], transparently handling weight-only int8.

    Two int8 flavors, selected by which scale key the loader wrote
    (per-output-channel fp32 scales either way):
      name+'_s'  — XLA: the int8->bf16 convert is an operand of the dot and
                   relies on XLA fusing it into the weight-streaming loop;
      name+'_sp' — Pallas ops/int8_matmul.py: the dequant-in-matmul is
                   explicit (guaranteed int8-byte HBM traffic).  Falls back
                   to the XLA expression when the shape is ineligible
                   (prefill-sized activations, non-tileable dims)."""
    w = p[name]
    s = p.get(name + "_s")
    if s is not None:
        return ((x @ w.astype(x.dtype)).astype(jnp.float32) * s).astype(x.dtype)
    sp = p.get(name + "_sp")
    if sp is not None:
        from deft_tpu.ops import int8_matmul as i8mm

        if i8mm.eligible(x, w):
            return i8mm.int8_matmul(x, w, sp).astype(x.dtype)
        return ((x @ w.astype(x.dtype)).astype(jnp.float32) * sp).astype(x.dtype)
    return x @ w


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def gemma_rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Gemma RMSNorm: (1 + w) scaling, multiplied in fp32 BEFORE the output
    cast (transformers modeling_gemma.GemmaRMSNorm — the cast order differs
    from Llama's and matters in bf16)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    nrm = xf * jax.lax.rsqrt(var + eps)
    return (nrm * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _act_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """MLP gate activation by HF name (fp32 in, fp32 out)."""
    if name == "silu":
        return jax.nn.silu
    if name in ("gelu_pytorch_tanh", "gelu_new"):  # Gemma GeGLU
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise NotImplementedError(f"hidden_act {name!r}")


def _moe_mlp(cfg: LlamaConfig, lp: Dict[str, jnp.ndarray], h: jnp.ndarray,
             act) -> jnp.ndarray:
    """Mixtral-family sparse MoE block (transformers MixtralSparseMoeBlock):
    softmax router, top-k experts with renormalized weights.

    TPU-first: executed DENSE over the stacked expert tensors
    (wg/wu/wdown (NE, E, I)-shaped) — at decode widths (R leaves x top-2 of
    8 experts) nearly every expert is hit each step, so streaming all expert
    weights is already the IO floor, and the extra (NE/k)x FLOPs are free at
    R << model dims (decode is bandwidth-bound).  Routing weights are exact:
    unselected experts contribute with weight 0."""
    NE, K = cfg.num_experts, cfg.experts_per_tok
    logits = (h @ lp["wrt"].astype(h.dtype)).astype(jnp.float32)  # (R, NE)
    probs = jax.nn.softmax(logits, axis=-1)
    _, top_i = jax.lax.top_k(probs, K)
    mask = jnp.sum(jax.nn.one_hot(top_i, NE, dtype=probs.dtype), axis=1)
    rw = probs * mask                                  # (R, NE) sparse
    rw = rw / jnp.sum(rw, axis=-1, keepdims=True)      # renormalize top-k

    def emm(x, name, eq):
        """Per-expert matmul with the same int8 handling as mm() (the
        Pallas-int8 kernel has no expert-batched variant; _sp scales use
        the XLA fused-dequant expression)."""
        w = lp[name]
        y = jnp.einsum(eq, x, w.astype(x.dtype))
        s = lp.get(name + "_s", lp.get(name + "_sp"))
        if s is not None:
            y = (y.astype(jnp.float32) * s[:, None, :]).astype(x.dtype)
        return y

    g = emm(h, "wg", "re,neo->nro")                    # (NE, R, I)
    u = emm(h, "wu", "re,neo->nro")
    z = act(g.astype(jnp.float32)).astype(h.dtype) * u
    o = emm(z, "wdown", "nri,nie->nre")                # (NE, R, E)
    out = jnp.einsum("nre,rn->re", o.astype(jnp.float32),
                     rw.astype(jnp.float32))
    return out.astype(h.dtype)


# Row-tile size of the grouped-matmul MoE dispatch; the gmm path engages
# when the padded-group layout wastes <= ~50% rows (n*k >= 2*NE*tile_m).
_GMM_TILE_M = 128


def _moe_gmm_ok(cfg: LlamaConfig, lp, n: int) -> bool:
    from deft_tpu.ops.gmm import gmm_eligible

    NE, K = cfg.num_experts, cfg.experts_per_tok
    if n * K < 2 * NE * _GMM_TILE_M:
        return False
    # int8 experts ride the same path: gmm takes the loader's (NE, F)
    # per-output-channel scales directly (asserted in _moe_mlp_gmm)
    E, I = cfg.hidden_size, cfg.intermediate_size
    return gmm_eligible(_GMM_TILE_M, E, I, _GMM_TILE_M) and \
        gmm_eligible(_GMM_TILE_M, I, E, _GMM_TILE_M)


def _moe_mlp_gmm(cfg: LlamaConfig, lp: Dict[str, jnp.ndarray],
                 h: jnp.ndarray, act) -> jnp.ndarray:
    """Top-k MoE execution for prefill-scale token counts: rows sorted by
    expert into a tile-aligned padded layout, three grouped matmuls
    (ops/gmm.py), weighted scatter-add combine.  Exact: identical routing
    math to _moe_mlp (same softmax/top-k/renormalize), every token's top-k
    experts execute (dropless — no capacity factor), pad rows combine with
    weight 0.  FLOPs and expert-weight IO scale with k, not NE."""
    from deft_tpu.ops.gmm import gmm

    NE, K = cfg.num_experts, cfg.experts_per_tok
    n, E = h.shape
    tm = _GMM_TILE_M
    nK = n * K
    # static worst-case padded rows: each expert group tile-aligns
    M_pad = -(-(nK + NE * (tm - 1)) // tm) * tm

    logits = (h @ lp["wrt"].astype(h.dtype)).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, K)            # (n, K)
    top_w = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

    flat_e = top_i.reshape(-1)                        # (nK,) expert per slot
    flat_t = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, K)
    ).reshape(-1)                                     # token per slot
    flat_w = top_w.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(flat_e)                       # stable: token-major
    se = flat_e[order]
    g = jnp.bincount(flat_e, length=NE)               # group sizes
    gstart = jnp.cumsum(g) - g
    padded = -(-g // tm) * tm
    pstart = jnp.cumsum(padded) - padded              # tile-aligned starts
    pos = (pstart[se] + jnp.arange(nK, dtype=jnp.int32)
           - gstart[se]).astype(jnp.int32)
    row_src = jnp.zeros(M_pad, jnp.int32).at[pos].set(flat_t[order])
    tok_pos = jnp.full(M_pad, n, jnp.int32).at[pos].set(flat_t[order])
    w_pos = jnp.zeros(M_pad, jnp.float32).at[pos].set(flat_w[order])
    # tile -> owning expert (tiles past the last live group run expert
    # NE-1 on zero-weight pad rows; their output is discarded at combine)
    tile_eid = (jnp.searchsorted(
        pstart, jnp.arange(M_pad // tm, dtype=jnp.int32) * tm, side="right"
    ) - 1).astype(jnp.int32)

    xs = h[row_src]                                   # (M_pad, E)

    def expert_scale(name):
        s = lp.get(name + "_s", lp.get(name + "_sp"))
        if s is None:
            return None
        # gmm dequant expects per-output-channel (NE, F) scales
        assert s.ndim == 2 and s.shape[0] == NE, s.shape
        return s.astype(jnp.float32)

    gx = gmm(xs, lp["wg"], tile_eid, expert_scale("wg"), tile_m=tm)
    ux = gmm(xs, lp["wu"], tile_eid, expert_scale("wu"), tile_m=tm)
    zx = act(gx.astype(jnp.float32)).astype(h.dtype) * ux
    yx = gmm(zx, lp["wdown"], tile_eid, expert_scale("wdown"), tile_m=tm)

    out = jnp.zeros((n + 1, E), jnp.float32).at[tok_pos].add(
        yx.astype(jnp.float32) * w_pos[:, None]
    )
    return out[:n].astype(h.dtype)


# An attention impl consumes
#   (q, k_new, v_new, k_pool, v_pool, layer_idx, batch, scale)
# and returns (R, Hq, D).  Decode impls gather KV from the pool at
# [layer_idx, indices] (one fused gather); prefill impls attend the in-flight
# k_new/v_new directly and ignore the pool.
AttnFn = Callable[..., jnp.ndarray]


def _forward(
    cfg: LlamaConfig,
    params: Dict[str, jnp.ndarray],
    rope_apply: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    tokens: jnp.ndarray,
    positions: jnp.ndarray,
    out_loc: jnp.ndarray,
    attn: AttnFn,
    batch,
    moe_gmm: bool = False,
):
    x = params["embed"][tokens]
    if cfg.gemma_norm:
        # Gemma scales embeddings by sqrt(hidden) rounded to the model dtype
        # (transformers GemmaModel.forward normalizer tensor)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    norm = gemma_rms_norm if cfg.gemma_norm else rms_norm
    act = _act_fn(cfg.hidden_act)
    scale = cfg.head_dim ** -0.5
    n = x.shape[0]
    D = cfg.head_dim
    layer_keys = ["ln1", "wo", "ln2", "wdown"]
    layer_keys += ["wqkv"] if "wqkv" in params else ["wq", "wk", "wv"]
    layer_keys += ["wgu"] if "wgu" in params else ["wg", "wu"]
    layer_keys += [k + suf for k in list(layer_keys) for suf in ("_s", "_sp")
                   if k + suf in params]
    layer_keys += [k for k in ("bq", "bk", "bv", "bqkv", "ln_q", "ln_k",
                               "wrt") if k in params]
    layer_params = {k: params[k] for k in layer_keys}
    nq_d = cfg.num_q_heads * D
    nkv_d = cfg.num_kv_heads * D

    def body(carry, xs):
        x, kp, vp = carry
        lp, li = xs
        h = norm(x, lp["ln1"], cfg.rms_norm_eps)
        if "wqkv" in lp:  # fused single-chip path (loader.fuse_params)
            qkv = mm(h, lp, "wqkv")
            if cfg.qkv_bias:  # Qwen2-family
                qkv = qkv + lp["bqkv"].astype(qkv.dtype)
            q = qkv[:, :nq_d]
            k = qkv[:, nq_d:nq_d + nkv_d]
            v = qkv[:, nq_d + nkv_d:]
        else:
            q, k, v = (mm(h, lp, w) for w in ("wq", "wk", "wv"))
            if cfg.qkv_bias:  # Qwen2-family
                q = q + lp["bq"].astype(q.dtype)
                k = k + lp["bk"].astype(k.dtype)
                v = v + lp["bv"].astype(v.dtype)
        q = q.reshape(n, cfg.num_q_heads, D)
        k = k.reshape(n, cfg.num_kv_heads, D)
        v = v.reshape(n, cfg.num_kv_heads, D)
        if cfg.qk_norm:  # Qwen3-family: per-head RMSNorm before RoPE
            q = rms_norm(q, lp["ln_q"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["ln_k"], cfg.rms_norm_eps)
        # one rope application over q|k (fewer ops per scanned layer)
        qk = rope_apply(jnp.concatenate([q, k], axis=1), positions)
        q, k = qk[:, : cfg.num_q_heads], qk[:, cfg.num_q_heads:]
        kp = kv_store(kp, li, out_loc, k)
        vp = kv_store(vp, li, out_loc, v)
        o = attn(q, k, v, kp, vp, li, batch, scale)
        x = x + mm(o.reshape(x.shape[0], -1).astype(x.dtype), lp, "wo")
        h = norm(x, lp["ln2"], cfg.rms_norm_eps)
        if cfg.num_experts > 0:  # Mixtral-family sparse MoE
            # decode widths execute DENSE (streaming all experts is the IO
            # floor there); prefill-scale token counts dispatch top-k via
            # the grouped-matmul kernel — FLOPs scale with k, not NE.
            # n is static per trace, so this is a compile-time branch.
            # Under a mesh the runner passes a CALLABLE (the shard_map'ed
            # expert-parallel dispatch, parallel/moe.py — GSPMD cannot
            # auto-shard a pallas_call); it makes the same size branch
            # internally.
            if callable(moe_gmm):
                x = x + moe_gmm(cfg, lp, h, act)
            elif moe_gmm and _moe_gmm_ok(cfg, lp, n):
                x = x + _moe_mlp_gmm(cfg, lp, h, act)
            else:
                x = x + _moe_mlp(cfg, lp, h, act)
            return (x, kp, vp), None
        if "wgu" in lp:
            gu = mm(h, lp, "wgu")
            g, u = gu[:, :cfg.intermediate_size], gu[:, cfg.intermediate_size:]
        else:
            g = mm(h, lp, "wg")
            u = mm(h, lp, "wu")
        x = x + mm(
            act(g.astype(jnp.float32)).astype(x.dtype) * u,
            lp, "wdown",
        )
        return (x, kp, vp), None

    (x, k_pool, v_pool), _ = jax.lax.scan(
        body,
        (x, k_pool, v_pool),
        (layer_params, jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )
    x = norm(x, params["ln_f"], cfg.rms_norm_eps)
    return x, k_pool, v_pool


def decode_forward(
    cfg: LlamaConfig,
    params: Dict[str, jnp.ndarray],
    rope_apply,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    batch,
    attn: AttnFn,
    compute_logits: bool = True,
    moe_gmm: bool = False,
):
    """One tree-decode step: returns (logits (R, V) fp32, k_pool, v_pool).

    compute_logits=False skips the lm_head matmul and returns the final
    hidden state (R, E) instead — logits-free replay steps (predetermined
    token schedules) only need the KV-pool side effects, and on large-vocab
    models the lm_head is a ~GB weight stream per step."""
    x, k_pool, v_pool = _forward(
        cfg,
        params,
        rope_apply,
        k_pool,
        v_pool,
        batch.q_tokens,
        batch.q_pos,
        batch.out_loc,
        attn,
        batch,
        moe_gmm=moe_gmm,
    )
    if not compute_logits:
        return x, k_pool, v_pool
    logits = mm(x, params, "lm_head").astype(jnp.float32)
    return logits, k_pool, v_pool


def prefill_forward(
    cfg: LlamaConfig,
    params: Dict[str, jnp.ndarray],
    rope_apply,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    batch: PrefillBatch,
    attn: AttnFn,
    moe_gmm: bool = False,
):
    """Prefill over the prompt; returns (last-token logits (V,) fp32, pools).

    ``attn`` here is a causal self-attention impl over the in-flight
    projections (KV pool rows are written but not re-read during prefill)."""
    x, k_pool, v_pool = _forward(
        cfg,
        params,
        rope_apply,
        k_pool,
        v_pool,
        batch.tokens,
        batch.positions,
        batch.out_loc,
        attn,
        batch,
        moe_gmm=moe_gmm,
    )
    last = x[batch.length - 1]
    logits = mm(last[None, :], params, "lm_head")[0].astype(jnp.float32)
    return logits, k_pool, v_pool


def ragged_prefill_forward(
    cfg: LlamaConfig,
    params: Dict[str, jnp.ndarray],
    rope_apply,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    batch: RaggedPrefillBatch,
    attn: AttnFn,
    moe_gmm: bool = False,
):
    """Prefill B concatenated prompts in ONE forward; returns ((B, V) fp32
    last-token logits, pools).  The attention impl masks cross-prompt pairs
    via batch.seg_ids (reference ragged-batch prefill,
    context_flashattention_nopad.py:132-195)."""
    x, k_pool, v_pool = _forward(
        cfg,
        params,
        rope_apply,
        k_pool,
        v_pool,
        batch.tokens,
        batch.positions,
        batch.out_loc,
        attn,
        batch,
        moe_gmm=moe_gmm,
    )
    last = x[batch.last_idx]  # (B, hidden)
    logits = mm(last, params, "lm_head").astype(jnp.float32)
    return logits, k_pool, v_pool

"""Parameter loading: HF safetensors/bin -> stacked-layer pytree, bf16.

Parity surface: the reference's load_weights + hf_model_weights_iterator
(/root/reference/DeFT/deft/models/llama2.py:252-295, utils.py:116-175).
TPU-first: per-layer tensors are stacked into (num_layers, ...) arrays so the
forward is a lax.scan over layers (one compiled layer body instead of an
unrolled 32-layer graph), and projections are kept as (in, out) matrices for
row-major MXU matmuls.  q/k/v and gate/up stay separate tensors (see
_param_shapes) so tensor-parallel sharding is clean.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from deft_tpu.models.config import LlamaConfig


def _param_shapes(cfg: LlamaConfig) -> Dict[str, Any]:
    E = cfg.hidden_size
    D = cfg.head_dim
    L = cfg.num_layers
    I = cfg.intermediate_size
    NE = cfg.num_experts
    mlp = (
        # Mixtral-family sparse MoE: stacked expert tensors (the scan body
        # streams all experts — at decode widths every expert is hit anyway,
        # so dense streaming is the IO-optimal TPU layout) + router
        {"wrt": (L, E, NE), "wg": (L, NE, E, I), "wu": (L, NE, E, I),
         "wdown": (L, NE, I, E)}
        if NE > 0
        else {"wg": (L, E, I), "wu": (L, E, I), "wdown": (L, I, E)}
    )
    return {
        "embed": (cfg.vocab_size, E),
        "ln1": (L, E),
        # q/k/v and gate/up are separate tensors (not the reference's merged
        # QKVLinear/MergedLinear, linear.py:8-117): XLA fuses the matmuls
        # anyway, and separate tensors shard cleanly along the tp axis
        # (a merged output axis would put shard boundaries across the
        # q/k/v and gate/up splits).
        "wq": (L, E, cfg.num_q_heads * D),
        "wk": (L, E, cfg.num_kv_heads * D),
        "wv": (L, E, cfg.num_kv_heads * D),
        "wo": (L, cfg.num_q_heads * D, E),
        "ln2": (L, E),
        **mlp,
        "ln_f": (E,),
        "lm_head": (E, cfg.vocab_size),
    } | (
        # Qwen2-family qkv biases (o/mlp carry none)
        {
            "bq": (L, cfg.num_q_heads * D),
            "bk": (L, cfg.num_kv_heads * D),
            "bv": (L, cfg.num_kv_heads * D),
        }
        if cfg.qkv_bias
        else {}
    ) | (
        # Qwen3-family per-head q/k RMSNorm weights ("ln" prefix: init to
        # ones, never int8-quantized)
        {"ln_q": (L, D), "ln_k": (L, D)} if cfg.qk_norm else {}
    )


# Stacked matmul weights eligible for weight-only int8 (everything except
# embeddings and norms; embed is a row gather whose dtype doesn't affect IO).
# Fused names included: per-output-column int8 scales concatenate exactly,
# so quantize(concat) == concat(quantize) column-for-column.
QUANT_WEIGHTS = ("wq", "wk", "wv", "wo", "wg", "wu", "wdown", "lm_head",
                 "wqkv", "wgu")

# (members, fused name) along the output axis; biases fuse the same way.
_FUSE_GROUPS = ((("wq", "wk", "wv"), "wqkv"), (("wg", "wu"), "wgu"))


def _fuse_host(bufs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse q/k/v -> wqkv and gate/up -> wgu on HOST numpy, before any device
    transfer — fusing on device (fuse_params) transiently doubles the largest
    group's HBM footprint (~3.8 GB for 8B int8 wg+wu), which can OOM init on
    a 16 GB chip that fits the steady-state model."""
    p = dict(bufs)
    for group, out in _FUSE_GROUPS:
        # MoE expert tensors (L, NE, E, I) stay unfused: the expert einsum
        # path streams them as-is
        if all(g in p for g in group) and p[group[0]].ndim == 3:
            p[out] = np.concatenate([p[g] for g in group], axis=-1)
            for g in group:
                del p[g]
    if all(b in p for b in ("bq", "bk", "bv")):
        p["bqkv"] = np.concatenate([p["bq"], p["bk"], p["bv"]], axis=-1)
        for b in ("bq", "bk", "bv"):
            del p[b]
    return p


def _fused_shapes(shapes: Dict[str, Any]) -> Dict[str, Any]:
    """Shape-dict analog of _fuse_host (on-device random init generates the
    fused tensors directly rather than concatenating in HBM)."""
    out: Dict[str, Any] = {}
    emitted = set()
    member_of = {g: fused for group, fused in _FUSE_GROUPS for g in group}
    member_of |= {b: "bqkv" for b in ("bq", "bk", "bv")}
    groups = {fused: group for group, fused in _FUSE_GROUPS}
    groups["bqkv"] = ("bq", "bk", "bv")
    for name, shape in shapes.items():
        fused = member_of.get(name)
        if fused is None:
            out[name] = shape
            continue
        if fused in emitted:
            continue
        members = groups[fused]
        # MoE expert tensors (4-D) stay unfused, matching _fuse_host
        if not all(m in shapes for m in members) or len(shape) == 4:
            out[name] = shape
            continue
        width = sum(shapes[m][-1] for m in members)
        out[fused] = shapes[name][:-1] + (width,)
        emitted.add(fused)
    return out


def fuse_params(params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Single-chip fast path: concatenate q/k/v -> wqkv and gate/up -> wgu
    along the output axis (2 matmuls per layer instead of 5 for the same
    weight bytes — fewer op-dispatch bubbles at decode's tiny row counts,
    and a wider N dim for the MXU).  int8 scales, Pallas-int8 scales and
    Qwen2 biases concatenate the same way.  The TP mesh path keeps the
    tensors separate (head-sharding needs clean per-projection boundaries,
    see _param_shapes); the reference's QKVLinear/MergedLinear
    (/root/reference/DeFT/deft/layers/linear.py:8-117) is the same fusion
    done at weight-load time."""
    p = dict(params)
    for group, out in ((("wq", "wk", "wv"), "wqkv"), (("wg", "wu"), "wgu")):
        if group[0] in p and p[group[0]].ndim == 4:
            continue  # MoE expert tensors stay unfused (see _fuse_host)
        for suf in ("", "_s", "_sp"):
            keys = [g + suf for g in group]
            if all(k in p for k in keys):
                p[out + suf] = jnp.concatenate([p[k] for k in keys], axis=-1)
                for k in keys:
                    del p[k]
    if all(b in p for b in ("bq", "bk", "bv")):
        p["bqkv"] = jnp.concatenate([p["bq"], p["bk"], p["bv"]], axis=-1)
        for b in ("bq", "bk", "bv"):
            del p[b]
    return p


def unfuse_params(params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Inverse of fuse_params (split sizes inferred from shapes: wo's input
    axis is num_q_heads*D; k/v halve the remainder; wgu splits in half).
    Used when fused single-chip params reach the TP mesh path, whose
    shardings need per-projection tensors."""
    if "wqkv" not in params and "wgu" not in params:
        return params
    p = dict(params)
    if "wqkv" in p:
        nq_d = p["wo"].shape[-2]
        nkv_d = (p["wqkv"].shape[-1] - nq_d) // 2
        splits = [("wq", 0, nq_d), ("wk", nq_d, nq_d + nkv_d),
                  ("wv", nq_d + nkv_d, nq_d + 2 * nkv_d)]
        for suf in ("", "_s", "_sp"):
            if "wqkv" + suf in p:
                w = p.pop("wqkv" + suf)
                for name, lo, hi in splits:
                    p[name + suf] = w[..., lo:hi]
        if "bqkv" in p:
            b = p.pop("bqkv")
            for name, lo, hi in splits:
                p["b" + name[1]] = b[..., lo:hi]
    if "wgu" in p:
        half = p["wgu"].shape[-1] // 2
        for suf in ("", "_s", "_sp"):
            if "wgu" + suf in p:
                w = p.pop("wgu" + suf)
                p["wg" + suf] = w[..., :half]
                p["wu" + suf] = w[..., half:]
    return p


def _quantize_int8(arr: np.ndarray):
    """Per-output-channel symmetric int8: arr (..., in, out) ->
    (int8 weights, fp32 scale (..., out))."""
    s = np.maximum(np.abs(arr).max(axis=-2, keepdims=True) / 127.0, 1e-8)
    q = np.clip(np.round(arr / s), -127, 127).astype(np.int8)
    return q, np.squeeze(s, axis=-2).astype(np.float32)


def _finalize(bufs: Dict[str, np.ndarray], dtype, weight_dtype: str,
              fuse: bool = False):
    """Host numpy -> device pytree, quantizing matmul weights to int8 when
    asked (quantization happens on HOST so an 8B model never materializes
    bf16 weights in HBM — that transient alone would OOM a 16 GB chip).
    fuse=True applies _fuse_host first (single-chip runners)."""
    if fuse:
        bufs = _fuse_host(bufs)
    params: Dict[str, jnp.ndarray] = {}
    for name, arr in bufs.items():
        if weight_dtype in ("int8", "int8-pallas") and name in QUANT_WEIGHTS:
            q, s = _quantize_int8(arr)
            params[name] = jnp.asarray(q)
            suffix = "_sp" if weight_dtype == "int8-pallas" else "_s"
            params[name + suffix] = jnp.asarray(s)
        else:
            params[name] = jnp.asarray(arr, dtype=dtype)
    return params


def random_params(
    cfg: LlamaConfig, seed: int = 0, dtype: jnp.dtype = jnp.bfloat16,
    weight_dtype: str = "inherit", on_device: bool = None,
    fuse: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Random-init params with sane scales (tests / benchmarks; the
    environment has no network egress for HF downloads).

    On an accelerator backend the tensors are generated (and int8-quantized)
    ON DEVICE with jax.random — host generation + transfer of multi-GB
    params over the device tunnel costs minutes per process, which starved
    the benchmark's watchdog windows.  CPU keeps the numpy path (test seeds
    derive from it)."""
    if on_device is None:
        on_device = jax.default_backend() != "cpu"
    shapes = _param_shapes(cfg)
    if not on_device:
        rng = np.random.default_rng(seed)
        bufs: Dict[str, np.ndarray] = {}
        for name, shape in shapes.items():
            if name.startswith("ln"):
                bufs[name] = np.ones(shape, dtype=np.float32)
            else:
                fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
                arr = rng.standard_normal(size=shape, dtype=np.float32)
                arr *= 1.0 / np.sqrt(fan_in)
                bufs[name] = arr
        return _finalize(bufs, dtype, weight_dtype, fuse=fuse)

    def gen(sub, shape, fan_in, quant):
        def one(k, shp):
            arr = jax.random.normal(k, shp, jnp.float32) * (fan_in ** -0.5)
            if not quant:
                return (arr.astype(dtype),)
            s = jnp.maximum(
                jnp.max(jnp.abs(arr), axis=-2, keepdims=True) / 127.0, 1e-8
            )
            q = jnp.clip(jnp.round(arr / s), -127, 127).astype(jnp.int8)
            return q, jnp.squeeze(s, axis=-2)

        if len(shape) >= 3:
            # Stacked-layer tensor: generate layer-by-layer inside lax.map
            # so the fp32 transient is ONE layer, not the whole stack — a
            # fused 8B gate_up stack is (32, 4096, 28672) fp32 = 15 GB,
            # which RESOURCE_EXHAUSTs a 16 GB v5e before quantization.
            # Per-layer quant scales are unchanged (axis -2 is per layer).
            keys = jax.random.split(sub, shape[0])
            return jax.lax.map(lambda k: one(k, shape[1:]), keys)
        return one(sub, shape)

    gen = jax.jit(gen, static_argnums=(1, 2, 3))
    key = jax.random.PRNGKey(seed)
    if fuse:
        # generate fused tensors directly: concatenating on device would
        # transiently double the largest group's HBM footprint (same
        # rationale as _fuse_host; RNG stream differs from the unfused
        # layout, which only matters for cross-layout weight equality —
        # benches compare modes within one layout)
        shapes = _fused_shapes(shapes)
    params: Dict[str, jnp.ndarray] = {}
    for name, shape in shapes.items():
        if name.startswith("ln"):
            params[name] = jnp.ones(shape, dtype)
            continue
        key, sub = jax.random.split(key)
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
        quant = (weight_dtype in ("int8", "int8-pallas")
                 and name in QUANT_WEIGHTS)
        out = gen(sub, shape, fan_in, quant)
        params[name] = out[0]
        if quant:
            suffix = "_sp" if weight_dtype == "int8-pallas" else "_s"
            params[name + suffix] = out[1]
    return params


def _iter_hf_weights(path: str):
    """Yield (name, np.ndarray) from safetensors (preferred) or torch .bin."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors or .bin weights under {path}")
    import torch

    for f in bin_files:
        state = torch.load(f, map_location="cpu", weights_only=True)
        for name, t in state.items():
            yield name, t.to(torch.float32).numpy()


def load_params(
    path: str, cfg: LlamaConfig, dtype: jnp.dtype = jnp.bfloat16,
    weight_dtype: str = "inherit", fuse: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Load a local HF Llama checkpoint into the stacked pytree layout."""
    E, D, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    nq, nkv = cfg.num_q_heads, cfg.num_kv_heads
    shapes = _param_shapes(cfg)
    bufs = {k: np.zeros(v, dtype=np.float32) for k, v in shapes.items()}
    seen_lm_head = False

    for name, w in _iter_hf_weights(path):
        w = np.asarray(w, dtype=np.float32)
        if name == "model.embed_tokens.weight":
            bufs["embed"][:] = w
        elif name == "lm_head.weight":
            bufs["lm_head"][:] = w.T
            seen_lm_head = True
        elif name == "model.norm.weight":
            bufs["ln_f"][:] = w
        elif name.startswith("model.layers."):
            parts = name.split(".")
            li = int(parts[2])
            sub = ".".join(parts[3:])
            if sub == "input_layernorm.weight":
                bufs["ln1"][li] = w
            elif sub == "post_attention_layernorm.weight":
                bufs["ln2"][li] = w
            elif sub == "self_attn.q_proj.weight":
                bufs["wq"][li] = w.T
            elif sub == "self_attn.k_proj.weight":
                bufs["wk"][li] = w.T
            elif sub == "self_attn.v_proj.weight":
                bufs["wv"][li] = w.T
            elif sub in ("self_attn.q_proj.bias", "self_attn.k_proj.bias",
                         "self_attn.v_proj.bias"):
                key = "b" + sub[len("self_attn.")]
                if key not in bufs:
                    raise KeyError(
                        f"checkpoint has {name} but the parsed config set "
                        "qkv_bias=False (config.json probably lacks an "
                        "'architectures' entry naming Qwen2 or an "
                        "attention_bias flag)"
                    )
                bufs[key][li] = w
            elif sub in ("self_attn.q_norm.weight",
                         "self_attn.k_norm.weight"):
                key = "ln_" + sub[len("self_attn.")]
                if key not in bufs:
                    raise KeyError(
                        f"checkpoint has {name} but the parsed config set "
                        "qk_norm=False (config.json probably lacks an "
                        "'architectures' entry naming Qwen3)"
                    )
                bufs[key][li] = w
            elif sub == "self_attn.qkv_proj.weight":
                # Phi-3 ships q|k|v fused along the output axis — the same
                # order as this repo's wqkv fusion; split into the stacked
                # bufs (re-fused by _fuse_host on single-chip loads)
                wt = w.T
                qd, kvd = nq * D, nkv * D
                bufs["wq"][li] = wt[:, :qd]
                bufs["wk"][li] = wt[:, qd:qd + kvd]
                bufs["wv"][li] = wt[:, qd + kvd:]
            elif sub == "self_attn.o_proj.weight":
                bufs["wo"][li] = w.T
            elif sub == "mlp.gate_proj.weight":
                bufs["wg"][li] = w.T
            elif sub == "mlp.up_proj.weight":
                bufs["wu"][li] = w.T
            elif sub == "mlp.down_proj.weight":
                bufs["wdown"][li] = w.T
            elif sub == "mlp.gate_up_proj.weight":  # Phi-3 fused gate|up
                wt = w.T
                I = cfg.intermediate_size
                bufs["wg"][li] = wt[:, :I]
                bufs["wu"][li] = wt[:, I:]
            elif sub == "block_sparse_moe.gate.weight":  # Mixtral router
                bufs["wrt"][li] = w.T
            elif sub.startswith("block_sparse_moe.experts."):
                # Mixtral experts: w1=gate, w3=up, w2=down
                _, _, ei, wn, _ = sub.split(".")
                dst = {"w1": "wg", "w3": "wu", "w2": "wdown"}[wn]
                bufs[dst][li, int(ei)] = w.T
            elif "rotary_emb" in sub:
                pass  # tables are recomputed
            else:
                raise KeyError(f"unmapped weight {name}")
        else:
            raise KeyError(f"unmapped weight {name}")

    if not seen_lm_head:
        if not cfg.tie_word_embeddings:
            raise ValueError(
                f"checkpoint at {path} has no lm_head.weight but the config "
                "does not tie word embeddings — refusing to silently tie "
                "(the model would produce wrong logits)"
            )
        bufs["lm_head"][:] = bufs["embed"].T
    return _finalize(bufs, dtype, weight_dtype, fuse=fuse)

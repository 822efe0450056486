"""Whole-model parity vs HuggingFace transformers' Llama implementation.

The strongest correctness credential available without network egress: a
tiny random transformers ``LlamaForCausalLM`` is saved to disk (safetensors
+ config.json) and loaded through this repo's REAL checkpoint path
(``LlamaConfig.from_pretrained`` + ``loader.load_params``), then

  - prefill next-token distribution must match the HF forward, and
  - a branch-into-2 tree decode must match HF re-run over each leaf's full
    root-to-leaf path at every step (greedy tokens AND distributions).

This validates the HF weight mapping (q/k/v/o transposes, gate/up/down,
norms, tied lm_head), RMSNorm eps placement, rope application, GQA, KV
pools and tree attention against the public ground-truth implementation —
not just against this repo's own oracle.  Reference counterpart: the
reference loads HF weights but has no cross-implementation test at all
(SURVEY.md §4; /root/reference/DeFT/deft/models/llama2.py:252-295).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from deft_tpu.config import EngineConfig
from deft_tpu.models.config import LlamaConfig
from deft_tpu.runtime import ForwardMode, ModelRunner

PROMPT = [3, 11, 250, 77, 141, 9, 62, 200, 5, 18, 33, 127]  # 12 tokens
DECODE_STEPS = 6


_TINY = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rms_norm_eps=1e-5,
    tie_word_embeddings=False,
    torch_dtype=torch.float32,
)


def _make_hf(family):
    if family == "llama":
        cfg = transformers.LlamaConfig(
            rope_theta=10000.0, attention_bias=False, mlp_bias=False, **_TINY
        )
        cls = transformers.LlamaForCausalLM
    elif family == "qwen2":  # qkv biases hardcoded in the HF modeling code
        cfg = transformers.Qwen2Config(
            rope_theta=1e6, use_sliding_window=False, **_TINY
        )
        cls = transformers.Qwen2ForCausalLM
    elif family == "qwen3":  # per-head q/k RMSNorm, no bias, explicit head_dim
        cfg = transformers.Qwen3Config(
            rope_theta=1e6, use_sliding_window=False, attention_bias=False,
            head_dim=16, **_TINY
        )
        cls = transformers.Qwen3ForCausalLM
    elif family == "gemma":  # GeGLU, sqrt(hidden)-scaled embeddings,
        # (1+w) RMSNorm, tied lm_head (exercises the tie path in the loader)
        kw = dict(_TINY)
        kw["tie_word_embeddings"] = True
        cfg = transformers.GemmaConfig(
            rope_theta=10000.0, attention_bias=False, head_dim=16, **kw
        )
        cls = transformers.GemmaForCausalLM
    elif family == "mixtral":  # sparse MoE (softmax router, top-2 of 4)
        cfg = transformers.MixtralConfig(
            rope_theta=1e6, sliding_window=None, attention_bias=False,
            num_local_experts=4, num_experts_per_tok=2, **_TINY
        )
        cls = transformers.MixtralForCausalLM
    else:  # phi3: fused qkv/gate_up checkpoint layout + LongRoPE scaling
        # (distinct short/long factors so the regime choice matters; the
        # engine table and the HF run both sit in the short regime here)
        cfg = transformers.Phi3Config(
            rope_theta=10000.0, sliding_window=None, pad_token_id=0,
            original_max_position_embeddings=256,
            rope_scaling={
                "type": "longrope",
                "short_factor": [1.0 + 0.25 * i for i in range(8)],
                "long_factor": [4.0 + 0.5 * i for i in range(8)],
            },
            **_TINY,
        )
        cls = transformers.Phi3ForCausalLM
    torch.manual_seed(0)
    return cls(cfg).eval()


@pytest.fixture(scope="module",
                params=["llama", "qwen2", "qwen3", "gemma", "mixtral",
                        "phi3"])
def hf_model(request, tmp_path_factory):
    """Tiny random HF checkpoint saved as safetensors + its live module."""
    model = _make_hf(request.param)
    d = tmp_path_factory.mktemp(f"hf_tiny_{request.param}")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def hf_next_probs(model, token_ids):
    """HF forward over the full sequence -> fp64 softmax of the last row."""
    with torch.no_grad():
        logits = model(torch.tensor([token_ids])).logits[0, -1]
    x = logits.double().numpy()
    e = np.exp(x - x.max())
    return e / e.sum()


def make_runner(path):
    cfg = LlamaConfig.from_pretrained(path)
    ecfg = EngineConfig(
        kv_pool_slots=2048,
        max_requests=16,
        max_context_len=256,
        min_token_bucket=128,
        dtype="float32",
    )
    return ModelRunner(cfg, ecfg, kernels="xla", model_path=path,
                       retain_full_logits=True)


def test_config_parse_matches_hf(hf_model):
    path, model = hf_model
    cfg = LlamaConfig.from_pretrained(path)
    assert cfg.hidden_size == 64 and cfg.num_layers == 2
    assert cfg.num_q_heads == 4 and cfg.num_kv_heads == 2
    assert cfg.head_dim == 16 and cfg.vocab_size == 256
    # qkv_bias mirrors the architecture: hardcoded True in HF's Qwen2
    assert cfg.qkv_bias == isinstance(model, transformers.Qwen2ForCausalLM)
    # qk_norm mirrors the architecture: hardcoded q/k norms in HF's Qwen3
    assert cfg.qk_norm == isinstance(model, transformers.Qwen3ForCausalLM)
    is_gemma = isinstance(model, transformers.GemmaForCausalLM)
    assert cfg.gemma_norm == is_gemma
    assert (cfg.hidden_act == "gelu_pytorch_tanh") == is_gemma
    assert cfg.tie_word_embeddings == is_gemma
    is_moe = isinstance(model, transformers.MixtralForCausalLM)
    assert (cfg.num_experts == 4 and cfg.experts_per_tok == 2) == is_moe


def test_prefill_distribution_matches_hf(hf_model):
    path, model = hf_model
    runner = make_runner(path)
    view = runner.forward_prefill(PROMPT)
    got = view.full_probs()[0]
    want = hf_next_probs(model, PROMPT)
    # full_probs includes the engine's +1e-6 smoothing; compare shifted
    np.testing.assert_allclose(got, want + 1e-6, rtol=0, atol=5e-5)
    assert int(view.ids[0, 0]) == int(want.argmax())


def test_int8_checkpoint_load_matches_hf(hf_model):
    """Loading a REAL on-disk checkpoint with weight_dtype='int8'
    (host-side per-channel quantization during load, loader.load_params)
    must stay close to the HF fp distribution and pick the same greedy
    token — the deployment path for 8B-on-one-chip, previously covered
    only via random_params."""
    path, model = hf_model
    cfg = LlamaConfig.from_pretrained(path)
    ecfg = EngineConfig(
        kv_pool_slots=2048, max_requests=16, max_context_len=256,
        min_token_bucket=128, dtype="float32", weight_dtype="int8",
    )
    runner = ModelRunner(cfg, ecfg, kernels="xla", model_path=path,
                         retain_full_logits=True)
    assert any(k.endswith("_s") for k in runner.params), \
        "int8 load must produce per-channel scale tensors"
    view = runner.forward_prefill(PROMPT)
    got = view.full_probs()[0]
    want = hf_next_probs(model, PROMPT)
    # int8 weights perturb the distribution; the tiny model's margins are
    # wide enough that the greedy token and coarse shape must survive
    assert int(view.ids[0, 0]) == int(want.argmax())
    np.testing.assert_allclose(got, want + 1e-6, rtol=0, atol=5e-2)


def test_tree_decode_matches_hf_per_path(hf_model):
    """Branch the root into the top-2 prefill tokens, decode greedily; at
    every step each leaf's distribution must equal HF run fresh over that
    leaf's full path (tree attention == per-path causal attention)."""
    path, model = hf_model
    runner = make_runner(path)
    view = runner.forward_prefill(PROMPT)
    tree = runner.tree
    _, top2 = view.topk(0, 2)
    for c, child in enumerate(tree.branch(tree.root, 2)):
        child.append_token(int(top2[c]))

    for step in range(DECODE_STEPS):
        tree.alloc()
        plan = runner.build_plan(ForwardMode.TREE_DECODE_FLATTEN)
        lv, _ = runner.forward_tree_decode(ForwardMode.TREE_DECODE_FLATTEN,
                                           plan)
        probs = lv.full_probs()
        ids, _ = lv.argmax()
        for leaf in list(tree.leaves.values()):
            q = tree.leaf_to_q[leaf.id]
            path_tokens = []
            n = leaf
            chain = []
            while n is not None:
                chain.append(n)
                n = n.parent
            for node in reversed(chain):
                path_tokens.extend(int(t) for t in node.token_ids)
            want = hf_next_probs(model, path_tokens)
            np.testing.assert_allclose(
                probs[q], want + 1e-6, rtol=0, atol=5e-5,
                err_msg=f"step {step}, leaf {leaf.id}",
            )
            assert int(ids[q]) == int(want.argmax()), (step, leaf.id)
            leaf.append_token(int(ids[q]))

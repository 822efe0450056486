"""RoPE scaling-family parity vs HuggingFace transformers' reference
implementations (transformers.modeling_rope_utils is the public ground truth
for the same formulas the reference's vLLM-derived code implements)."""

import numpy as np
import pytest

from deft_tpu.models.rope import rope_table

tf_rope = pytest.importorskip("transformers.modeling_rope_utils")


class _Cfg:
    """Minimal config shim for ROPE_INIT_FUNCTIONS."""

    def __init__(self, head_dim, theta, max_pos, scaling):
        self.head_dim = head_dim
        self.rope_theta = theta
        # HF's dynamic-NTK scales relative to config.max_position_embeddings
        # (the pre-extension length); our rope_table takes it via
        # scaling["original_max_position_embeddings"]
        self.max_position_embeddings = (
            scaling or {}
        ).get("original_max_position_embeddings", max_pos)
        self.original_max_position_embeddings = (
            scaling or {}
        ).get("original_max_position_embeddings", max_pos)
        self.rope_scaling = scaling
        self.hidden_size = head_dim * 8
        self.num_attention_heads = 8
        self.partial_rotary_factor = 1.0

    def get_text_config(self):
        return self


def _hf_freqs(rtype, head_dim, theta, max_pos, scaling):
    fn = tf_rope.ROPE_INIT_FUNCTIONS[rtype]
    import torch

    cfg = _Cfg(head_dim, theta, max_pos, scaling)
    inv_freq, attn_factor = fn(cfg, device="cpu",
                               seq_len=torch.tensor(max_pos))
    return np.asarray(inv_freq, dtype=np.float64), float(attn_factor)


def _our_freqs(table, mscale_pos=1):
    """Recover inv_freq * mscale from the table row at position 1."""
    half = table.shape[1] // 2
    return np.asarray(table[mscale_pos, half:], dtype=np.float64)


@pytest.mark.parametrize(
    "rtype,scaling",
    [
        ("default", None),
        ("linear", {"rope_type": "linear", "factor": 4.0}),
        ("llama3", {"rope_type": "llama3", "factor": 8.0,
                    "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                    "original_max_position_embeddings": 8192}),
        ("yarn", {"rope_type": "yarn", "factor": 4.0,
                  "original_max_position_embeddings": 4096}),
        ("dynamic", {"rope_type": "dynamic", "factor": 4.0,
                     "original_max_position_embeddings": 2048}),
    ],
)
def test_scaling_matches_transformers(rtype, scaling):
    head_dim, theta, max_pos = 64, 10000.0, 8192
    want_freq, want_attn = _hf_freqs(rtype, head_dim, theta, max_pos, scaling)
    table = np.asarray(rope_table(head_dim, max_pos, theta, scaling))
    # sin(pos=1 * f) * mscale ~= f * mscale for small f; compare via angle
    half = head_dim // 2
    got_sin = np.asarray(table[1, half:], dtype=np.float64)
    got_cos = np.asarray(table[1, :half], dtype=np.float64)
    got_angle = np.arctan2(got_sin, got_cos)
    want_angle = np.mod(want_freq, 2 * np.pi)
    want_angle = np.where(want_angle > np.pi, want_angle - 2 * np.pi,
                          want_angle)
    np.testing.assert_allclose(got_angle, want_angle, rtol=1e-5, atol=1e-6)
    # attention factor folded into the table magnitude
    mag = np.sqrt(got_sin**2 + got_cos**2)
    np.testing.assert_allclose(mag, want_attn, rtol=1e-5)


def test_longrope_matches_transformers_per_position():
    """Phi-3 LongRoPE: positions below original_max use short factors,
    positions at/after it use long factors — exactly what an HF
    incremental decode produces (tokens written while seq <= orig keep
    their short-factor rope in the KV cache); attention factor from the
    config max ratio applies to every row.  Ground truth: transformers'
    _compute_longrope_parameters evaluated in each regime."""
    head_dim, theta, orig = 64, 10000.0, 4096
    half = head_dim // 2
    scaling = {
        "type": "longrope",
        "short_factor": [1.0 + 0.25 * i for i in range(half)],
        "long_factor": [4.0 + 0.5 * i for i in range(half)],
        "original_max_position_embeddings": orig,
    }
    cfg = _Cfg(head_dim, theta, orig, scaling)
    cfg.max_position_embeddings = 16384  # config.json scaled max
    cfg.original_max_position_embeddings = orig
    fn = tf_rope.ROPE_INIT_FUNCTIONS["longrope"]
    short_freq, attn = fn(cfg, device="cpu", seq_len=orig)
    long_freq, attn_l = fn(cfg, device="cpu", seq_len=orig + 1)
    assert float(attn) == float(attn_l) > 1.0  # af is regime-independent
    short_freq = np.asarray(short_freq, dtype=np.float64)
    long_freq = np.asarray(long_freq, dtype=np.float64)

    table = np.asarray(rope_table(head_dim, orig + 64, theta, scaling,
                                  orig_max_pos=16384), dtype=np.float64)

    def expect(p, freq):
        ang = p * freq
        return np.concatenate([np.cos(ang), np.sin(ang)]) * float(attn)

    # fp32 table vs fp64 expectation: cos/sin of angles ~p*freq lose ~1e-3
    # absolute precision at p~4k — tolerance reflects the cast, not drift
    for p in (1, 100, orig - 1):  # short-factor rows
        np.testing.assert_allclose(table[p], expect(p, short_freq),
                                   rtol=0, atol=1e-3, err_msg=str(p))
    for p in (orig, orig + 63):  # long-factor rows
        np.testing.assert_allclose(table[p], expect(p, long_freq),
                                   rtol=0, atol=1e-3, err_msg=str(p))
    # a table that never exceeds orig is pure short-factor
    t_short = np.asarray(rope_table(head_dim, orig, theta, scaling,
                                    orig_max_pos=16384), dtype=np.float64)
    np.testing.assert_allclose(t_short, table[:orig], rtol=0, atol=0)


def test_sliding_window_rejection_is_generic():
    """ANY config with an active window (< max positions) must be rejected
    — loading one would silently compute full attention where the trained
    model masks (Phi-3-mini-4k ships sliding_window=2047).  A window >=
    max positions never masks and loads; Qwen2's explicit opt-out flag
    wins over its vestigial sliding_window value."""
    from deft_tpu.models.config import LlamaConfig

    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=4096)
    with pytest.raises(NotImplementedError):
        LlamaConfig.from_hf_config(
            base | {"architectures": ["Phi3ForCausalLM"],
                    "sliding_window": 2047})
    with pytest.raises(NotImplementedError):
        LlamaConfig.from_hf_config(
            base | {"architectures": ["MistralForCausalLM"],
                    "sliding_window": 2048})
    # window >= max positions: no token is ever masked
    cfg = LlamaConfig.from_hf_config(
        base | {"architectures": ["Phi3ForCausalLM"],
                "sliding_window": 262144})
    assert cfg.hidden_size == 64
    # Qwen2: governed by use_sliding_window alone
    cfg = LlamaConfig.from_hf_config(
        base | {"architectures": ["Qwen2ForCausalLM"],
                "use_sliding_window": False, "sliding_window": 2048})
    assert cfg.qkv_bias
    with pytest.raises(NotImplementedError):
        LlamaConfig.from_hf_config(
            base | {"architectures": ["Qwen2ForCausalLM"],
                    "use_sliding_window": True, "sliding_window": 2048})

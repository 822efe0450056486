"""SamplingParams + sample_token over a LogitsView (runtime/sampling.py)."""

import numpy as np
import pytest

from deft_tpu.runtime.runner import LogitsView
from deft_tpu.runtime.sampling import SamplingParams, sample_token


def _view():
    vals = np.array([[0.5, 0.3, 0.15, 0.05]])
    ids = np.array([[11, 22, 33, 44]])
    return LogitsView(vals, ids)


def test_temperature_zero_is_greedy():
    tok, p = sample_token(_view(), 0, SamplingParams(temperature=0.0),
                          np.random.RandomState(0))
    assert (tok, p) == (11, 0.5)


def test_top_k_restricts_support():
    rng = np.random.RandomState(0)
    sp = SamplingParams(temperature=1.0, top_k=2)
    toks = {sample_token(_view(), 0, sp, rng)[0] for _ in range(200)}
    assert toks <= {11, 22}


def test_top_p_nucleus():
    rng = np.random.RandomState(0)
    sp = SamplingParams(temperature=1.0, top_p=0.6)
    toks = {sample_token(_view(), 0, sp, rng)[0] for _ in range(200)}
    # 0.5 covers 50% < 60%; adding 0.3 exceeds -> support {11, 22}
    assert toks == {11, 22}


def test_verify_rejects_bad_params():
    with pytest.raises(ValueError):
        SamplingParams(temperature=-1.0).verify()
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0).verify()
    with pytest.raises(ValueError):
        SamplingParams(top_k=0).verify()


def test_sampled_generation_reproducible():
    """simple_tree with sampling_params: same seed -> same tokens."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate
    import functools

    def run():
        runner = ModelRunner(
            PRESETS["tiny"],
            EngineConfig(kv_pool_slots=2048, max_requests=32,
                         max_context_len=256, min_token_bucket=128,
                         dtype="float32"),
            kernels="xla",
        )
        fn = functools.partial(
            workloads.simple_tree,
            sampling_params=SamplingParams(temperature=0.8, top_k=8),
            rng=np.random.RandomState(7),
        )
        tree_generate(
            model=runner, mode=ForwardMode.TREE_DECODE_FLATTEN,
            tokenizer=None, prompt_ids=list(range(7, 19)),
            max_seq_len=20, width=3, depth=1,
            branch_controller=Branch_Controller(fn),
        )
        return sorted(tuple(b.token_ids) for b in runner.tree.all_finished_seqs)

    assert run() == run()


def test_sample_token_small_temperature_no_nan():
    """probs ** (1/T) underflows to all-zeros at tiny T; sampling must fall
    back to (effectively) argmax instead of NaN-crashing in rng.choice."""
    class _View:
        k = 8

        def topk(self, row, k):
            p = np.array([0.2, 0.1, 0.05, 0.04, 0.03, 0.02, 0.01, 0.005])
            return p[:k], np.arange(k)

    from deft_tpu.runtime.sampling import sample_token

    tok, p = sample_token(_View(), 0,
                          SamplingParams(temperature=0.002, top_k=8),
                          np.random.RandomState(0))
    assert tok == 0 and abs(p - 0.2) < 1e-12

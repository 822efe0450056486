from deft_tpu.ops.dense_oracle import dense_tree_attention, dense_causal_attention

__all__ = ["dense_tree_attention", "dense_causal_attention"]

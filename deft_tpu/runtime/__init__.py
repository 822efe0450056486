from deft_tpu.runtime.modes import ForwardMode
from deft_tpu.runtime.runner import LogitsView, ModelRunner
from deft_tpu.runtime.generate import tree_generate

__all__ = ["ForwardMode", "ModelRunner", "LogitsView", "tree_generate"]

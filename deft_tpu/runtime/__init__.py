from deft_tpu.runtime.modes import ForwardMode, mode_from_cli
from deft_tpu.runtime.runner import LogitsView, ModelRunner
from deft_tpu.runtime.generate import tree_generate

__all__ = [
    "ForwardMode",
    "mode_from_cli",
    "ModelRunner",
    "LogitsView",
    "tree_generate",
]

from deft_tpu.models.config import LlamaConfig, PRESETS
from deft_tpu.models.loader import load_params, random_params

__all__ = ["LlamaConfig", "PRESETS", "load_params", "random_params"]

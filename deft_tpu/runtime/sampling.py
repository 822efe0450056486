"""Sampling parameter container (parity:
/root/reference/DeFT/deft/sampling_params.py:9-87 — defined there but never
wired into the decode loop; branch controllers do top-k/argmax directly.
Kept for API completeness and used by the LogitsView fast path)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union


@dataclasses.dataclass
class SamplingParams:
    n: int = 1
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    ignore_eos: bool = False
    max_new_tokens: int = 16
    stop: Optional[Union[str, List[str]]] = None

    def verify(self) -> None:
        if self.temperature < 0.0:
            raise ValueError("temperature must be non-negative")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError("top_k must be -1 (disable) or >= 1")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")

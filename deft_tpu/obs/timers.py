"""Named wall-clock timers.

TPU equivalent of the reference GlobalTimer
(/root/reference/DeFT/deft/tree_decoding/timer.py:5-36): the reference wraps
spans in torch.cuda.synchronize(); here callers pass device arrays to
``stop`` and we block_until_ready them, or time pure host spans.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax


class GlobalTimer:
    """Static accumulating timers, milliseconds."""

    _starts: Dict[str, float] = {}
    _accum: Dict[str, float] = {}

    @staticmethod
    def start(name: str) -> None:
        GlobalTimer._starts[name] = time.perf_counter()

    @staticmethod
    def stop(name: str, sync: Optional[Any] = None) -> float:
        """Stop a span; if ``sync`` is a jax array/pytree, block on it first."""
        if sync is not None:
            jax.block_until_ready(sync)
        t0 = GlobalTimer._starts.pop(name, None)
        if t0 is None:
            return 0.0
        dt_ms = (time.perf_counter() - t0) * 1e3
        GlobalTimer._accum[name] = GlobalTimer._accum.get(name, 0.0) + dt_ms
        return dt_ms

    @staticmethod
    def get(name: str) -> float:
        return GlobalTimer._accum.get(name, 0.0)

    @staticmethod
    def reset(name: Optional[str] = None) -> None:
        if name is None:
            GlobalTimer._accum.clear()
            GlobalTimer._starts.clear()
        else:
            GlobalTimer._accum.pop(name, None)
            GlobalTimer._starts.pop(name, None)

"""Device mesh construction.

The reference has no parallelism of any kind (SURVEY.md §2.6: single
``device="cuda"``, commented-out initialize_model_parallel,
/root/reference/DeFT/deft/model_runner.py:252) — this subsystem is a new
TPU-native design, not a port:

- ``tp``  — tensor parallel over attention heads / MLP columns (Megatron
  layout; collectives ride ICI).
- ``sp``  — sequence/KV parallel: the DFS-flattened tree-KV token axis is
  sharded, each chip computes partial (o, lse) per query and XLA inserts the
  cross-chip LSE combine (the psum generalization of DeFT's two-stage
  reduction).
- ``dp``  — data parallel over query rows (decoding branches / trees).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def _factor(n: int, num_kv_heads: int) -> Tuple[int, int, int]:
    """Pick (dp, tp, sp) for n devices: tp as large as the KV-head count
    allows (TP attention is embarrassingly parallel over kv heads — the
    reference kernel's grid axis 0), then sp, then dp."""
    tp = 1
    while (tp * 2 <= n and n % (tp * 2) == 0
           and num_kv_heads % (tp * 2) == 0 and tp < 8):
        tp *= 2
    rest = n // tp
    sp = 1
    while sp * 2 <= rest and rest % (sp * 2) == 0 and sp < 4:
        sp *= 2
    dp = rest // sp
    assert dp * tp * sp == n, (n, dp, tp, sp)
    return dp, tp, sp


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    num_kv_heads: int = 8,
    axes: Sequence[str] = ("dp", "sp", "tp"),
    shape: Optional[Tuple[int, int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, sp, tp) mesh over the first ``n_devices`` devices.

    tp is innermost so tensor-parallel collectives map to adjacent chips
    (ICI neighbors on a pod slice)."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        dp, tp, sp = _factor(n, num_kv_heads)
        shape = (dp, sp, tp)
    mesh_devs = np.asarray(devs).reshape(shape)
    return Mesh(mesh_devs, axis_names=tuple(axes))

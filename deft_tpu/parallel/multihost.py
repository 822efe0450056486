"""Multi-host (pod / multi-slice) runtime initialization.

The reference is strictly single-process/single-GPU (SURVEY.md §2.6); this
is the TPU-native distributed-backend layer it never had.  On TPU pods there
is no NCCL analog to manage: ``jax.distributed.initialize`` wires every host
process into one runtime, ``jax.devices()`` then spans the whole slice, and
XLA compiles the collectives over ICI (intra-slice) / DCN (multi-slice)
itself.  This module owns that bootstrap plus the pod-spanning mesh:

- ``init_runtime()``       — idempotent ``jax.distributed.initialize`` with
                             TPU auto-detection (coordinator/process ids come
                             from the TPU metadata on Cloud TPU VMs; explicit
                             args cover other launchers).
- ``make_pod_mesh(...)``   — a (dp, sp, tp) mesh over ALL processes' devices
                             with tp innermost (ICI-adjacent) and dp
                             outermost (so data-parallel trees land on
                             different hosts and cross-host traffic rides
                             DCN only for dp collectives, which tree decode
                             never issues inside a step).
- ``is_primary()``         — gate for logging / JSON dumps so N hosts do not
                             write N copies.

Single-host (and the CI 8-device CPU mesh) work unchanged: ``init_runtime``
is a no-op when jax.distributed is already initialized or when only one
process exists, and ``make_pod_mesh`` degrades to ``make_mesh``.

Engine contract: every host process runs the SAME tree_generate loop (tree
state and plan build are deterministic host-side numpy on identical inputs),
so the per-step plan uploads — replicated ``device_put`` with an identical
host value on every process (parallel/engine.py:replicate) — form a valid
global replicated array, and the jitted step's params/pool shardings carry
over unchanged from the single-host mesh path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

from deft_tpu.parallel.mesh import make_mesh


def init_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize the multi-host runtime.  Returns True when a multi-process
    runtime is active after the call (False = single-process).

    With no arguments this relies on jax's TPU/cluster auto-detection
    (Cloud TPU VM metadata, SLURM, GKE env); explicit args mirror
    ``jax.distributed.initialize``.  Idempotent: calling again (or in a
    process where the backend is already live) is a no-op.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_count() > 1
    explicit = (coordinator_address is not None or process_id is not None
                or (num_processes or 1) > 1)
    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # LOCAL backend, which both breaks TPU-pod auto-detection (initialize
    # must run before backend init) and makes the subsequent initialize()
    # raise.  Detect launcher config from the environment only.
    def _slurm_multi_node() -> bool:
        # single-node allocations (sbatch without srun) must stay local:
        # jax's SlurmCluster detection needs srun step vars and >1 nodes
        try:
            return int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1
        except ValueError:
            return False

    auto = explicit or any(os.environ.get(v) for v in (
        "JAX_COORDINATOR_ADDRESS",      # generic jax launcher
        "TPU_WORKER_HOSTNAMES",         # Cloud TPU pod metadata
        "MEGASCALE_COORDINATOR_ADDRESS",
    )) or _slurm_multi_node()
    if not auto:
        # nothing to coordinate and no launcher config present: stay local
        # (initialize() would block waiting for peers on a dev box)
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError:
        # backend already started by the launcher — treat as initialized
        pass
    except KeyError as e:
        # cluster auto-detection found a launcher fingerprint but the step
        # env is incomplete (e.g. sbatch without srun): surface what to fix
        raise RuntimeError(
            f"jax.distributed.initialize could not read launcher env {e}; "
            "pass coordinator_address/num_processes/process_id explicitly "
            "or launch via srun"
        ) from e
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on exactly one process (rank 0) — gate for logs/dumps."""
    return jax.process_index() == 0


def make_pod_mesh(
    *,
    num_kv_heads: int = 8,
    shape: Optional[Tuple[int, int, int]] = None,
    axes: Sequence[str] = ("dp", "sp", "tp"),
):
    """(dp, sp, tp) mesh over every device of every process.

    Axis placement policy for pods: ``jax.devices()`` orders devices
    process-major, and make_mesh reshapes row-major with tp innermost —
    so tp/sp stay within a host's slice neighborhood (ICI) and dp strides
    across hosts (DCN).  tree decode issues tp/sp collectives inside the
    step and none over dp, so steady-state decode traffic never touches
    DCN.
    """
    return make_mesh(
        len(jax.devices()),
        num_kv_heads=num_kv_heads,
        shape=shape,
        axes=axes,
        devices=jax.devices(),
    )

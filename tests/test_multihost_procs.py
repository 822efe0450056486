"""Multi-process distributed-backend test (VERDICT r3 missing item 2).

Spawns TWO actual processes, each `jax.distributed.initialize`d with 4
virtual CPU devices, and runs a sharded tree_generate over the pod mesh —
runtime coverage for the initialize branch of parallel/multihost.py and for
make_pod_mesh's process-major device-ordering policy (the reference has no
distributed backend at all, SURVEY.md §2.6; this is the §7 step-9 scaling
validation that single-process 8-device mesh tests cannot provide).

Token equality: both ranks' generations must equal the single-process
single-device run (the same exactness bar as test_multichip's
test_sharded_engine_generation_matches_single_device).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_tokens():
    """Single-process, single-logical-device generation (same workload as
    the worker script) — the exactness oracle."""
    from deft_tpu.config import EngineConfig
    from deft_tpu.control import Branch_Controller, workloads
    from deft_tpu.models import PRESETS
    from deft_tpu.runtime import ForwardMode, ModelRunner, tree_generate

    ecfg = EngineConfig(
        kv_pool_slots=1024, max_requests=16, max_context_len=128,
        min_token_bucket=128, dtype="float32",
    )
    runner = ModelRunner(PRESETS["tiny"], ecfg, kernels="xla", seed=3)
    tree_generate(
        runner, ForwardMode.TREE_DECODE_FLATTEN, None, list(range(7, 27)),
        max_seq_len=32, width=3, depth=0,
        branch_controller=Branch_Controller(workloads.simple_tree),
    )
    return sorted(tuple(s.token_ids) for s in runner.tree.all_finished_seqs)


def test_two_process_distributed_generation(tmp_path):
    want = [list(t) for t in _reference_tokens()]
    assert len(want) == 3

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker sets jax_platforms itself
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    got = []
    for rank in range(2):
        with open(tmp_path / f"rank{rank}.json") as f:
            got.append(json.load(f))
    # both ranks ran the same global program and agree with the oracle
    assert got[0] == got[1] == want

    # is_primary() gated the dump to exactly one rank (rank 0)
    with open(tmp_path / "primary.json") as f:
        primary = json.load(f)
    assert primary["rank"] == 0 and primary["n_branches"] == 3

"""Observability: PerfMetrics dump schema compatibility with the reference's
checked-in raw_data JSONs, timers, tracing no-op mode."""

import glob
import json
import os

import pytest

from deft_tpu.obs import GlobalTimer, PerfMetrics
from deft_tpu.obs.tracing import Tracer

_REF_GLOB = (
    "/root/reference/DeFT/experiments/*/raw_data/**/*.json"
)


def test_perf_metrics_dump_roundtrip(tmp_path):
    pm = PerfMetrics(str(tmp_path / "m.json"))
    pm.update(iter_time=1.0, prepare=0.1, forward=0.7, branch=0.2)
    pm.update_KV_IO(100, 512)
    pm.update_e2e_latency(123.0)
    pm.prompt_len, pm.generated_len = 10, 5
    pm.update_decode_latency()
    pm.compute_tpot()
    pm.dump()
    with open(tmp_path / "m.json") as f:
        d = json.load(f)
    assert d["KV_IO"] == 100 * 512 * 4
    assert d["prompt_len"] == 10


@pytest.mark.skipif(
    not glob.glob(_REF_GLOB, recursive=True),
    reason="reference dumps not mounted",
)
def test_perf_metrics_schema_superset_of_reference():
    """Our dump must contain every key the reference's PerfMetrics dumps so
    the reference's analysis notebooks keep working."""
    ref_file = sorted(glob.glob(_REF_GLOB, recursive=True))[0]
    with open(ref_file) as f:
        ref = json.load(f)
    ours = PerfMetrics().as_dict()
    missing = set(ref) - set(ours)
    assert not missing, f"missing keys vs {os.path.basename(ref_file)}: {missing}"


def test_global_timer_accumulates():
    GlobalTimer.reset("x")
    GlobalTimer.start("x")
    GlobalTimer.stop("x")
    GlobalTimer.start("x")
    GlobalTimer.stop("x")
    assert GlobalTimer.get("x") >= 0.0


def test_tracer_noop_and_span():
    t = Tracer(None)
    with t.session():
        with t.span("unit"):
            pass

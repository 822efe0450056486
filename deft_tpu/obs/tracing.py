"""Device-level tracing (the reference's NVTX/nsight analog,
/root/reference/DeFT/deft/layers/attention/tree_attention.py:320,412 NVTX
ranges): wraps jax.profiler so a decode run emits a TensorBoard-loadable
trace with named spans around prefill / per-step decode / branch phases.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


class Tracer:
    """Optional jax.profiler session with named trace annotations.

    Usage:
        tracer = Tracer("/tmp/deft_trace")   # or Tracer(None) -> no-op
        with tracer.session():
            with tracer.span("decode_step"):
                ...
    """

    def __init__(self, trace_dir: Optional[str] = None):
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def session(self) -> Iterator[None]:
        if self.trace_dir is None:
            yield
            return
        jax.profiler.start_trace(self.trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        with jax.profiler.TraceAnnotation(name):
            yield

    def annotate_fn(self, name: str, fn):
        def wrapped(*a, **k):
            with self.span(name):
                return fn(*a, **k)

        return wrapped

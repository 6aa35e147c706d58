"""Tracing / profiling utilities (SURVEY.md §5: "absent in reference").

Thin, dependency-free wrappers around jax.profiler and jax.named_scope so
every pipeline stage shows up as a named region in XProf/TensorBoard traces,
plus a structured wall-clock timer for per-op throughput logging.

Usage:
    from gpufhe_tpu.utils.profiling import stage, trace, Timer

    with trace("/tmp/fhe-trace"):            # XProf trace of a region
        with stage("keyswitch"):             # named region inside jit
            ...

    t = Timer()
    with t.measure("ct_mul"):
        out = ct_mul(...)
        jax.block_until_ready(out.c)
    print(t.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


def stage(name: str):
    """Named scope that shows up in XLA/XProf traces (usable under jit)."""
    import jax

    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XProf trace of the enclosed region into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Structured wall-clock timing with per-key aggregation."""

    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[key].append(time.perf_counter() - t0)

    def report(self) -> list[dict]:
        out = []
        for key, xs in sorted(self.samples.items()):
            out.append({
                "op": key,
                "n": len(xs),
                "mean_ms": round(1e3 * sum(xs) / len(xs), 3),
                "min_ms": round(1e3 * min(xs), 3),
                "total_s": round(sum(xs), 3),
            })
        return out

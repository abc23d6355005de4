"""Profiling/tracing harness.

The reference has no tracing wired up (SURVEY.md §5); this is the TPU-native
equivalent: jax.profiler traces + a block_until_ready benchmark helper that
reports Mpoints splatted+projected per second per chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def benchmark_fn(
    fn: Callable[[], jax.Array],
    iters: int = 20,
    warmup: int = 2,
) -> dict[str, float]:
    """Time a nullary jitted fn; returns seconds/iter and iters/sec.

    CAUTION: host-side wall timing. On this machine's tunneled TPU it
    UNDER-measures (async dispatch; block_until_ready is not a barrier —
    NOTES.md). For kernel numbers use dpcx.utils.timing.bench_scan, the
    device-side harness every shipped benchmark uses; this helper remains
    for quick local-CPU sanity only."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_iter": dt, "iters_per_sec": 1.0 / dt}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dpcx-trace"):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

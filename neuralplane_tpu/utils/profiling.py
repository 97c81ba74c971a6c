"""Profiling / tracing harness.

The reference's only tracing is commented-out cProfile scaffolding and an
always-on module-level cProfile in the interpolator (SURVEY.md S5). Here
profiling is first-class: a `trace()` context manager captures a
jax.profiler trace viewable in TensorBoard/Perfetto, and `time_fn` gives
honest device timings via block_until_ready (compile excluded).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/neuralplane_trace"):
    """Capture an XLA/device trace: `with trace("dir"): run_workload()`.
    View with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1,
            **kwargs) -> Dict[str, float]:
    """Wall-time a jitted callable with proper device sync.

    Returns {mean_s, total_s, iters}; the warmup calls (compilation) are
    excluded.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    total = time.perf_counter() - t0
    return {"mean_s": total / iters, "total_s": total, "iters": iters}

"""Profiling / timing utilities.

The reference brackets kernels with cudaEvents and appends per-stage
timings to ``timing_results.txt`` (HeaderCUDA.h:161-198 ``CUDA_TIMING_*``,
cross_compiled.cu:54-65).  The TPU equivalents here: a ``jax.profiler``
trace context for deep dives, a stage timer with the same append-to-file
habit, and the dependency-chained device timer shared with bench.py
(through this environment's relay, ``block_until_ready`` alone is not a
reliable completion barrier — see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/legmov_trace"):
    """``jax.profiler`` trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named stage wall-clock timer, optionally appending to a file.

    The functional twin of the reference's ``CUDA_TIMING_START/STOP`` pair
    writing ``timing_results.txt`` (HeaderCUDA.h:161-198).
    """

    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self.records: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.records.append((name, dt))
        line = f"{name}: {dt * 1e3:.3f} ms"
        if self.echo:
            print(line)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")

"""Profiling helpers (the aux subsystem the reference lacks — SURVEY §5).

The reference ships only criterion microbenchmarks; here profiling is a
first-class utility: ``trace()`` wraps a region in a ``jax.profiler`` trace
(viewable in TensorBoard/Perfetto), and ``op_rate`` converts measured times
into the modmul/s accounting used by the benchmarks.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/tb'): run()`` then inspect in
    TensorBoard (`tensorboard --logdir /tmp/tb`) or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with device synchronization."""

    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import jax

        # Ensure all dispatched work completed before reading the clock.
        (jax.device_put(0) + 0).block_until_ready()
        self.elapsed = time.perf_counter() - self._t0


def ntt_modmuls(n: int, count: int = 1) -> int:
    """NTT-equivalent modmul count: ``count * (n/2) * log2(n)``."""
    return count * (n // 2) * (n.bit_length() - 1)


def op_rate(ops: int, seconds: float) -> float:
    return ops / max(seconds, 1e-12)

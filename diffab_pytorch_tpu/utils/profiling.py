"""Tracing / profiling helpers.

TPU-native equivalent of the (absent) profiling subsystem of the reference
(SURVEY.md §5.1: nothing beyond Lightning's progress bar): jax.profiler
trace capture, named scopes for readable XLA timelines, and a step timer.

Usage:
    with trace("/tmp/jax-trace"):          # view with xprof/tensorboard
        run_steps(...)

    @named_scope("denoiser")
    def denoise(...): ...
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str) -> Callable:
    """Decorator version of jax.named_scope — annotates ops in traces."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


class StepTimer:
    """Wall-clock steps/sec with device sync, for metric logging."""

    def __init__(self):
        self._t = None
        self._steps = 0

    def tick(self, n: int = 1) -> Optional[float]:
        """Count n steps; returns steps/sec since the last tick or None on
        the first call."""
        now = time.time()
        if self._t is None:
            self._t, self._steps = now, 0
            return None
        self._steps += n
        dt = now - self._t
        if dt <= 0:
            return None
        rate = self._steps / dt
        self._t, self._steps = now, 0
        return rate


def block_and_time(fn: Callable, *args, iters: int = 3, **kwargs) -> float:
    """Compile (one warmup call) then time `iters` calls, seconds/call."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

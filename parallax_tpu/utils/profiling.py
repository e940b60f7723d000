"""Profiling helpers (SURVEY §5: the reference had only jax_log_compiles).

* ``named`` — context manager adding a jax.named_scope so ops group legibly
  in XProf/profiler traces;
* ``trace`` — capture a profiler trace directory for a callable;
* ``steps_per_second`` — the standard blocked-timing harness used by
  bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


named = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def steps_per_second(fn: Callable, *args, steps_per_call: int = 1, repeats: int = 3):
    """Best-of-N blocked timing; returns steps/second."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return steps_per_call / best

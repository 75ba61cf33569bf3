"""Profiling / tracing harness.

The reference's only timing story is ``@time`` in README examples
(reference README.md:198-201, docs/compare.Rmd); here profiling is a
first-class utility:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (open with xprof / tensorboard-plugin-profile).
- :func:`timed` — honest wall-time measurement on asynchronous backends:
  forces completion with a device-side checksum + scalar fetch
  (``block_until_ready`` alone under-reports through async dispatch layers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/bulklmm_trace"):
    """Capture a device trace: ``with trace("/tmp/t"): run_scan()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _force(x) -> float:
    """Reduce a pytree to one fetched scalar — completion barrier."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    acc = 0.0
    for l in leaves:
        acc += float(jnp.sum(jnp.asarray(l, dtype=jnp.float32)))
    return acc


def timed(fn: Callable, *args, repeats: int = 3, warmup: int = 1, **kwargs) -> Tuple[float, object]:
    """(best_seconds, last_result) of ``fn(*args, **kwargs)``.

    Each timed call ends with a checksum fetch so compile latency lands in
    the warm-up and the measurement reflects true device completion.
    """
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
        _force(result)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        _force(result)
        best = min(best, time.perf_counter() - t0)
    return best, result

"""Profiling & timing harness.

The reference has wall-clock instrumentation only (SURVEY §5.1). Here:
  - trace(dir): jax.profiler context → TensorBoard/xprof trace of XLA ops,
    fusions and HBM traffic for any region (the 'profile, iterate' loop of
    the sharding recipe)
  - timed(fn): wall-clock with a device fence that works through the axon
    tunnel (block_until_ready is a no-op there — a tiny device_get is the
    reliable fence)
  - annotate(name): named trace region (jax.profiler.TraceAnnotation)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax
import numpy as np


def device_sync(x) -> None:
    """Fence: force completion of everything producing `x`."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jax.numpy.ravel(leaf)[0:1]))


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, warmup: int = 2, iters: int = 10,
          **kwargs) -> Tuple[float, object]:
    """Returns (seconds_per_call, last_result) with proper fencing."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    device_sync(out)
    return (time.perf_counter() - t0) / iters, out

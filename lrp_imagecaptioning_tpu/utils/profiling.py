"""Tracing / profiling / numeric-guard subsystem.

The reference has no observability beyond prints and a commented ``@profile``
(SURVEY.md §5): its numeric sanitizers are runtime asserts inside the LRP
rules (lrp_modules.py:26-27).  TPU-native equivalents:

- :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-viewable
  traces (XLA ops, TPU timelines),
- :func:`annotate` — named trace region for host-side phases,
- :class:`StepTimer` — wall-clock per-step timing with explicit device sync
  (device->host transfer; ``block_until_ready`` does not synchronize through
  the remote-tunnel TPU backend),
- :func:`nan_guard` — checkify-based NaN/Inf checking for debug runs of the
  relevance kernels (enable in a debug config; zero cost when off).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region to ``logdir`` (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('beam_search'): ...``"""
    return jax.profiler.TraceAnnotation(name)


def sync(tree) -> None:
    """Force completion of device work (device->host transfer of one leaf)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])


class StepTimer:
    """Per-phase wall-clock accumulator with device sync.

    >>> timer = StepTimer()
    >>> with timer.measure("train_step", out := step(...)):
    ...     pass
    >>> timer.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            sync(result)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        return 1000.0 * self.totals[name] / max(1, self.counts[name])

    def summary(self) -> dict[str, float]:
        return {k: self.mean_ms(k) for k in self.totals}

    def report(self) -> str:
        return "  ".join(f"{k}={self.mean_ms(k):.1f}ms" for k in self.totals)


def nan_guard(fn, *, enabled: bool = True):
    """Wrap a jittable function with checkify NaN/Inf checking (the TPU
    equivalent of the reference's per-rule isnan/isinf asserts,
    lrp_modules.py:26-27).  The wrapped function raises on the first NaN with
    the offending source location; with ``enabled=False`` returns fn
    unchanged."""
    if not enabled:
        return fn
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kw):
        err, out = checked(*args, **kw)
        checkify.check_error(err)
        return out

    return wrapped

"""Structured timing, check counting, and trace capture.

The reference scatters ad-hoc ``time.time()`` prints
(kernel_perceptrons.py:72-80, collision_checkers.py:116-120,
scripts/active.py:642-673) and per-optimizer ``cnt_check`` counters
(optim.py:44,90,179). This module provides the structured equivalents:
a span timer registry, a collision-check counter, and a context manager
for the JAX profiler (TensorBoard traces).
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Timers:
    """Named wall-clock spans with call counts.

    >>> timers = Timers()
    >>> with timers.span('fit'):
    ...     do_work()
    >>> timers.summary()
    """

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # ensure device work launched inside the span is included.
                # A scalar fence on the default device only drains device
                # 0's queue; sharded work on the other devices would still
                # be in flight, under-reporting the span
                try:
                    jax.effects_barrier()
                except Exception:
                    try:
                        for d in jax.devices():
                            jax.block_until_ready(
                                jax.device_put(0.0, d) + 0.0)
                    except Exception:
                        pass
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {'total_s': round(self.total[k], 4),
                    'count': self.count[k],
                    'mean_s': round(self.total[k] / max(self.count[k], 1),
                                    5)}
                for k in sorted(self.total)}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=1)

    def reset(self):
        self.total.clear()
        self.count.clear()


class CheckCounter:
    """Collision-query counter (the reference's ``cnt_check``,
    optim.py:44). Wrap any checker fn to count configurations queried."""

    def __init__(self):
        self.count = 0

    def wrap(self, fn):
        def counted(q, *a, **kw):
            # count CONFIGS: a flat [dof] config is one query, not dof
            # queries (0-/1-D inputs are accepted throughout the checkers)
            ndim = getattr(q, 'ndim', None)
            if ndim is None or ndim <= 1:
                self.count += 1
            else:
                self.count += int(q.shape[0])
            return fn(q, *a, **kw)
        return counted

    def reset(self):
        self.count = 0


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/diffco_tpu_trace'):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats when the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out

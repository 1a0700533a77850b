"""Profiling utilities: jax.profiler trace capture + step-time statistics.

The reference has no profiler (SURVEY §5.1 — only wall-clock ``ts`` stamps in
the metric stream, logger.py:134-143). On TPU this is a first-class subsystem:
``trace`` wraps a region in a jax.profiler trace viewable in
TensorBoard/XProf/Perfetto, and :class:`StepTimer` derives the throughput
metrics (step time, images/sec/chip) the bench harness and train loop report.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

import jax

logger = logging.getLogger("vitef")


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a device trace for the enclosed region.

    Usage::

        with trace("savings/runs/exp/trace"):
            for _ in range(10):
                state, m = step_fn(state, batch)
            jax.block_until_ready(m["loss"])
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


@dataclass
class StepTimer:
    """Steady-state step timing with warmup discard.

    Call :meth:`tick` once per optimizer step (after the step is *dispatched*;
    timing blocks only when :meth:`summary` syncs). ``images_per_step`` scales
    the throughput numbers.
    """

    warmup: int = 3
    images_per_step: int = 0
    _times: list = field(default_factory=list)
    _last: float | None = None
    _count: int = 0

    def tick(self) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._last is not None and self._count > self.warmup:
            self._times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        """Step-time stats and derived throughput (per local chip)."""
        import numpy as np

        if not self._times:
            return {}
        times = np.asarray(self._times)
        n_chips = jax.local_device_count()
        out = {
            "step_time_mean_s": float(times.mean()),
            "step_time_p50_s": float(np.percentile(times, 50)),
            "step_time_p95_s": float(np.percentile(times, 95)),
            "steps_per_sec": float(1.0 / times.mean()),
        }
        if self.images_per_step:
            out["images_per_sec"] = self.images_per_step / times.mean()
            out["images_per_sec_per_chip"] = out["images_per_sec"] / n_chips
        return out

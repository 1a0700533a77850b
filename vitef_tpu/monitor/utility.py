"""Utility manager: seeding + garbage-collection control around the hot loop.

Reference: src/vitef/monitor/utility.py (UtilityConfig :22, Utility :39-71).
Disabling Python GC in the hot loop matters on TPU too: a collector pause on the
host stalls the dispatch pipeline that keeps the device queue fed.
"""

from __future__ import annotations

import gc
import logging
from dataclasses import dataclass

from ..config import set_seed

logger = logging.getLogger("vitef")


@dataclass
class UtilityConfig:
    """Reference utility.py:22-35."""

    seed: int = 42
    period: int = 1000


class Utility:
    """Reference Utility (utility.py:39-71): seed on enter, disable GC, collect
    every ``period`` steps, re-enable on exit."""

    def __init__(self, config: UtilityConfig):
        self.seed = config.seed
        self.period = config.period
        self.step = 0

    def __enter__(self) -> "Utility":
        set_seed(self.seed)
        gc.disable()
        gc.collect()
        return self

    def __call__(self) -> None:
        self.step += 1
        if self.period <= 0:
            return
        if self.step % self.period == 0:
            logger.info("garbage collection")
            gc.collect()

    def __exit__(self, exc, value, tb) -> None:
        gc.enable()

"""Cooperative preemption handling for long training runs.

SURVEY §5.3: the reference has NO failure detection — recovery is only the
checkpoint auto-resume on the next launch, so a SIGTERM (spot/preemptible VM
reclaim, cluster scheduler eviction) loses everything since the last
best-model save. This guard closes that gap the cooperative way that fits a
jitted train loop: a signal handler only sets a flag (async-signal-safe, no
device work in the handler), the loop polls :attr:`requested` once per step,
performs one final synchronous checkpoint, and exits cleanly. On the next
launch the Checkpointer's auto-resume (``__enter__``) continues from that
step — see apps/vit/train.py and tests/test_apps_train_eval.py.

``request()`` triggers the same path in software — for tests and for cluster
notification hooks that learn about preemption out-of-band.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager installing flag-setting handlers for ``signals``.

    Default is SIGTERM only: SIGINT keeps raising KeyboardInterrupt so
    interactive runs still stop immediately. Previous handlers are restored
    on exit; entering from a non-main thread is a no-op (signal handlers can
    only be installed from the main thread — ``request()`` still works).
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous: dict[int, object] = {}
        self._requested = threading.Event()

    @property
    def requested(self) -> bool:
        return self._requested.is_set()

    def request(self) -> None:
        """Software preemption trigger (tests, out-of-band notifications)."""
        self._requested.set()

    def _handler(self, signum, frame) -> None:
        logger.warning(
            "Received signal %s: requesting a preemption checkpoint.",
            signal.Signals(signum).name,
        )
        self._requested.set()

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, exc, value, tb) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()

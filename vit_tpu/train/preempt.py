"""Graceful-shutdown hook: checkpoint-on-SIGTERM for preemptible hosts.

Cloud TPU VMs (and most cluster schedulers) deliver SIGTERM with a short grace
window before a preemption kill. The train loops poll ``requested`` once per
step and, when set, write a final "last" checkpoint and return cleanly, so
``--resume`` continues from the interrupted step instead of the last interval
save. (The reference has no recovery story at all: its checkpoints are
write-only and a kill loses the run — SURVEY.md §5.)

Single-host only by design: checkpoint saves are collective across processes,
and a signal delivered to one process of a multi-host job would deadlock the
collective; multi-host jobs rely on the interval saves (--ckpt_every) plus
--resume.
"""

from __future__ import annotations

import signal
import threading

import jax


class GracefulShutdown:
    """Installs SIGTERM/SIGINT-chaining handlers that set ``requested``."""

    def __init__(self):
        self.requested = False
        self._prev = {}

    @classmethod
    def install(cls, signals=(signal.SIGTERM,)):
        self = cls()
        if jax.process_count() > 1:
            return self  # collective saves: see module docstring
        if threading.current_thread() is not threading.main_thread():
            return self  # signal.signal is main-thread-only
        for sig in signals:
            def handler(signum, frame, self=self):
                self.requested = True
                prev = self._prev.get(signum)
                if callable(prev):
                    prev(signum, frame)

            try:
                self._prev[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread / exotic platform
                pass
        return self

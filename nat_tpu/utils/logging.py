"""Leveled stderr logger with strict stdout/stderr stream discipline.

Contract (mirrors reference neural_audio_tokenizer.py:157-344 behavior, not
implementation): all diagnostics go to stderr only; stdout carries *only*
payload (NDJSON / token text) written via :meth:`NatLogger.stdout`.  In
"default mode" (plain `nat song.wav` with no verbosity flags) every
diagnostic is suppressed so stdout is a pure NDJSON stream and stderr is
empty.  Unlike the reference we never redirect the process-level stderr fd:
correct routing from the start makes `StreamLock`'s /dev/null redirection
unnecessary, though the class is kept for API parity.
"""

from __future__ import annotations

import enum
import os
import sys
import threading
import time
from typing import Optional


class LogLevel(enum.Enum):
    DEBUG = "DEBUG"
    INFO = "INFO"
    WARN = "WARN"
    ERROR = "ERROR"


_LEVEL_ORDER = {
    LogLevel.DEBUG: 0,
    LogLevel.INFO: 1,
    LogLevel.WARN: 2,
    LogLevel.ERROR: 3,
}


class NatLogger:
    """Timestamped leveled logger writing to stderr only.

    ``default_mode=True`` suppresses *all* stderr diagnostics (the reference's
    quiet default); payload emission via :meth:`stdout` is unaffected.
    """

    def __init__(self) -> None:
        self.level: LogLevel = LogLevel.WARN
        self.default_mode: bool = False
        self._lock = threading.Lock()

    # -- configuration -----------------------------------------------------
    def set_level(self, level: LogLevel) -> None:
        self.level = level

    def set_default_mode(self, enabled: bool) -> None:
        self.default_mode = enabled

    # -- internals ---------------------------------------------------------
    def _should_log(self, level: LogLevel) -> bool:
        if self.default_mode:
            return False
        return _LEVEL_ORDER[level] >= _LEVEL_ORDER[self.level]

    def _emit(self, level: LogLevel, message: str) -> None:
        if not self._should_log(level):
            return
        # Logging must never poison caller success state (the reference is
        # explicit about this around its k-means paths); swallow any I/O error.
        try:
            ts = time.strftime("%H:%M:%S")
            with self._lock:
                sys.stderr.write(f"[{ts}] {level.value} nat: {message}\n")
                sys.stderr.flush()
        except Exception:
            pass

    # -- public API --------------------------------------------------------
    def debug(self, message: str) -> None:
        self._emit(LogLevel.DEBUG, message)

    def info(self, message: str) -> None:
        self._emit(LogLevel.INFO, message)

    def warn(self, message: str) -> None:
        self._emit(LogLevel.WARN, message)

    warning = warn

    def error(self, message: str) -> None:
        self._emit(LogLevel.ERROR, message)

    def progress(self, message: str) -> None:
        """Progress lines rank as INFO."""
        self._emit(LogLevel.INFO, message)

    def stdout(self, payload: str) -> None:
        """Write payload to stdout (the *only* sanctioned stdout writer)."""
        try:
            sys.stdout.write(payload)
            if not payload.endswith("\n"):
                sys.stdout.write("\n")
            sys.stdout.flush()
        except BrokenPipeError:
            # Downstream consumer closed the pipe (e.g. `nat x.wav | head`).
            # Exit quietly like well-behaved Unix filters.
            try:
                sys.stdout.close()
            except Exception:
                pass
            raise SystemExit(0)


logger = NatLogger()


def set_log_level(level: LogLevel) -> None:
    logger.set_level(level)


def set_default_mode(enabled: bool) -> None:
    logger.set_default_mode(enabled)


class StreamLock:
    """Context manager guarding NDJSON emission to stdout.

    The reference (neural_audio_tokenizer.py:237-260) redirects stderr to
    /dev/null while emitting; because all our diagnostics already route
    through :class:`NatLogger`, we instead temporarily suppress the logger,
    which achieves the same stream-purity guarantee without touching process
    fds (third-party noise is handled by ``configure_quiet_external``).
    """

    def __init__(self, lock_stderr: bool = True) -> None:
        self.lock_stderr = lock_stderr
        self._saved_default: Optional[bool] = None

    def __enter__(self) -> "StreamLock":
        if self.lock_stderr:
            self._saved_default = logger.default_mode
            logger.set_default_mode(True)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._saved_default is not None:
            logger.set_default_mode(self._saved_default)


def configure_quiet_external(default_mode: bool) -> None:
    """Silence noisy third-party libraries when running quiet.

    Mirrors reference `_configure_quiet_external_logging`
    (neural_audio_tokenizer.py:277-344): set env knobs before heavyweight
    imports and quiet known-chatty loggers.
    """
    if not default_mode:
        return
    os.environ.setdefault("HF_HUB_DISABLE_PROGRESS_BARS", "1")
    os.environ.setdefault("TRANSFORMERS_VERBOSITY", "error")
    os.environ.setdefault("DISABLE_TQDM", "1")
    os.environ.setdefault("JAX_LOG_COMPILES", "0")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import logging as _pylogging

    for name in ("jax", "jax._src", "urllib3", "filelock", "absl",
                 "huggingface_hub", "transformers", "matplotlib"):
        _pylogging.getLogger(name).setLevel(_pylogging.ERROR)

"""Profiling / tracing hooks (SURVEY.md §5.1).

The reference has wall-clock timers only; the TPU-native equivalent is
`jax.profiler` trace annotations around pipeline stages plus the same
budget-meter metrics.  Enable a trace with ``NAT_TPU_PROFILE=/tmp/trace``
(or :func:`start_trace`) and open it in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

from .logging import logger

_active_trace_dir: Optional[str] = None


def maybe_start_trace_from_env() -> None:
    trace_dir = os.environ.get("NAT_TPU_PROFILE")
    if trace_dir:
        start_trace(trace_dir)


def start_trace(trace_dir: str) -> None:
    global _active_trace_dir
    try:
        import jax

        jax.profiler.start_trace(trace_dir)
        _active_trace_dir = trace_dir
        logger.info(f"Profiler trace started → {trace_dir}")
    except Exception as exc:
        logger.warn(f"Could not start profiler trace: {exc}")


def stop_trace() -> None:
    global _active_trace_dir
    if _active_trace_dir is None:
        return
    try:
        import jax

        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {_active_trace_dir}")
    except Exception as exc:
        logger.warn(f"Could not stop profiler trace: {exc}")
    _active_trace_dir = None


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named trace region (shows up in the TPU timeline) + wall timer.

    Emits a ``jax.profiler`` annotation only when jax is already loaded
    (neural path) — the compat path must stay jax-import-free end to end:
    on accelerator-plugin hosts even ``import jax`` can block on a remote
    backend handshake, and compat mode is the degradation lane that must
    work when the accelerator is unreachable (reference compat mode runs
    anywhere, neural_audio_tokenizer.py:4598-4604).
    """
    import sys

    start = time.perf_counter()
    try:
        jax = sys.modules.get("jax")
        if jax is not None:
            with jax.profiler.TraceAnnotation(name):
                yield
        else:
            yield
    finally:
        stage_timings[name] = stage_timings.get(name, 0.0) + (
            time.perf_counter() - start)


stage_timings: Dict[str, float] = {}


def reset_timings() -> None:
    stage_timings.clear()

"""Background accelerator-backend warmup.

On the tunneled driver backend the FIRST host↔device round trip of a
process pays a large fixed handshake (~55 s measured) regardless of
payload size; every subsequent transfer runs at full bandwidth.  Starting
a tiny jit + fetch on a daemon thread as early as possible overlaps that
handshake with host-side work (audio decode, cache reads, executable
deserialization) instead of serializing it in front of the first frame.

No-op on CPU backends and when a warmup was already started.
"""

from __future__ import annotations

import threading
from typing import Optional

_lock = threading.Lock()
_thread: Optional[threading.Thread] = None


def _warm() -> None:
    try:
        # Backend discovery itself (jax.devices) is part of the handshake;
        # it runs on this thread so the main thread stays free.
        import jax
        import jax.numpy as jnp
        import numpy as np

        if all(d.platform == "cpu" for d in jax.devices()):
            return
        np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), jnp.float32)))
    except Exception:
        pass  # best-effort; the real work pays the handshake instead


def start_backend_warmup() -> Optional[threading.Thread]:
    """Fire-and-forget warmup thread (accelerator backends, once)."""
    import os

    global _thread
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu":
        return None
    with _lock:
        if _thread is None:
            _thread = threading.Thread(
                target=_warm, name="nat-backend-warmup", daemon=True)
            _thread.start()
        return _thread


def wait_for_warmup(timeout: Optional[float] = None) -> None:
    if _thread is not None:
        _thread.join(timeout)

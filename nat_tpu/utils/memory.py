"""Host memory introspection and admission checks.

TPU-native counterpart of reference neural_audio_tokenizer.py:421-455: RSS
query via psutil (optional), a heuristic admission check before loading huge
files, and an explicit cleanup sweep.  Device (HBM) memory is managed by XLA;
`live_buffer_bytes` reports what JAX currently holds per device.
"""

from __future__ import annotations

import gc
from typing import Optional


def get_memory_usage_mb() -> float:
    """Current process RSS in MiB (0.0 if psutil is unavailable)."""
    try:
        import psutil

        return psutil.Process().memory_info().rss / (1024 * 1024)
    except Exception:
        return 0.0


def check_memory_requirements(num_samples: int, sample_rate: int,
                              multiplier: float = 10.0) -> bool:
    """Heuristic admission check: processing needs ~``multiplier``× the raw
    float32 audio bytes (feature maps, mel frames, token arrays).  Returns
    True when the host plausibly has room, or when psutil is unavailable.
    """
    try:
        import psutil

        needed = num_samples * 4 * multiplier
        return psutil.virtual_memory().available > needed
    except Exception:
        return True


def live_buffer_bytes() -> Optional[int]:
    """Total bytes of live JAX device buffers (None if unavailable)."""
    try:
        import jax

        total = 0
        for d in jax.devices():
            stats = d.memory_stats()
            if stats and "bytes_in_use" in stats:
                total += stats["bytes_in_use"]
        return total
    except Exception:
        return None


def aggressive_cleanup() -> None:
    """Release host garbage and drop JAX's internal caches where safe."""
    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass

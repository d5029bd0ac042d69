"""Time-axis linear interpolation (torch ``F.interpolate(mode='linear',
align_corners=False)`` equivalent) used for stream alignment.

Implemented as a gather + lerp with precomputed static indices — XLA lowers
this to two strided gathers and fused elementwise math; no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp_linear(x: jnp.ndarray, new_t: int) -> jnp.ndarray:
    """Resize ``[..., T]`` to ``[..., new_t]`` by linear interpolation."""
    t = x.shape[-1]
    if t == new_t:
        return x
    # align_corners=False sample positions
    pos = (jnp.arange(new_t, dtype=jnp.float32) + 0.5) * (t / new_t) - 0.5
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = pos - lo.astype(jnp.float32)
    return x[..., lo] * (1.0 - frac) + x[..., hi] * frac


def interp_nearest(x: jnp.ndarray, new_t: int) -> jnp.ndarray:
    """Nearest-neighbor resize of ``[..., T]`` to ``[..., new_t]``."""
    t = x.shape[-1]
    if t == new_t:
        return x
    idx = jnp.clip(
        jnp.floor((jnp.arange(new_t, dtype=jnp.float32) + 0.5) * (t / new_t)),
        0, t - 1).astype(jnp.int32)
    return x[..., idx]

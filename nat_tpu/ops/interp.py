"""Time-axis linear interpolation (torch ``F.interpolate(mode='linear',
align_corners=False)`` equivalent) used for stream alignment.

Two lowerings, picked by the static size of the interpolation operator:

* **matmul** — each output frame is a convex combination of ≤2 input
  frames, so the whole resize is ``x @ W`` with a precomputed ``[T, T']``
  weight matrix (≤2 nonzeros per column).  Gathers along the *lane*
  (last) dimension are the slowest access pattern on TPU — the stream
  alignment in the tokenizer forward (``[B, D, ~1500] → [B, D, ~80]``)
  measured 17% of the whole forward as a gather and is sub-millisecond
  as an MXU matmul.  Used whenever the weight matrix is small enough to
  live as a graph constant.
* **gather + lerp** — for very large ``T × T'`` products (the decoder's
  waveform upsample interpolates to hundreds of thousands of samples) a
  dense operator would dwarf the data; the original two-strided-gather
  form stays.

Both paths compute identical values in float32 (the matmul contracts
exact products against 0/weight entries; ``Precision.HIGHEST`` keeps the
MXU in its float32-accurate mode).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Max elements of the dense [T, T'] operator that we are willing to bake
# into the graph (16 MB of float32).  Alignment matrices in the forward are
# ~1500 × ~80 ≈ 120k and the temporal encoder's in-branch resizes top out
# around 1292 × 2584 ≈ 3.3M; the decoder's sample-level upsample
# (3k × 660k) is far past this and keeps the gather path.
_MATMUL_LIMIT = 4 << 20


@lru_cache(maxsize=128)
def _interp_weights(t: int, new_t: int) -> np.ndarray:
    """Dense ``[t, new_t]`` linear-resize operator (align_corners=False)."""
    # Same float32 arithmetic as the gather path below, so both lowerings
    # sample identical positions/fractions.
    j = np.arange(new_t)
    pos = np.clip((j.astype(np.float32) + np.float32(0.5))
                  * np.float32(t / new_t) - np.float32(0.5),
                  np.float32(0.0), np.float32(t - 1.0))
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, t - 1)
    frac = (pos - lo.astype(np.float32)).astype(np.float32)
    w = np.zeros((t, new_t), np.float32)
    w[lo, j] += 1.0 - frac
    w[hi, j] += frac
    return w


def interp_linear(x: jnp.ndarray, new_t: int) -> jnp.ndarray:
    """Resize ``[..., T]`` to ``[..., new_t]`` by linear interpolation."""
    t = x.shape[-1]
    if t == new_t:
        return x
    if t * new_t <= _MATMUL_LIMIT:
        w = jnp.asarray(_interp_weights(t, new_t))
        return jax.lax.dot_general(
            x.astype(jnp.float32), w,
            (((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
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

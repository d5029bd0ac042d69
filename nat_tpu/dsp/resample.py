"""Sample-rate conversion.

Two paths:

* :func:`resample_poly` — host-side numpy polyphase (kaiser-windowed sinc),
  used by the load pipeline for ``--resample`` (reference uses
  librosa.resample, neural_audio_tokenizer.py:4769-4782).
* :func:`resample_jax` — the same rational polyphase filter expressed as a
  single `conv_general_dilated` (lhs_dilation=up, stride=down), jit-able and
  differentiable; this is the on-device 22.05 kHz → 16 kHz stage feeding the
  semantic encoder (reference resamples with torchaudio inside
  SemanticAudioEncoder.forward, 2359-2363).  A dilated conv maps onto the
  MXU as an implicit matmul and fuses with downstream encoder convs.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=32)
def _design_filter(up: int, down: int, window_beta: float = 5.0,
                   half_width: int = 10) -> np.ndarray:
    """Kaiser-windowed sinc low-pass for rational resampling (scipy-style)."""
    max_rate = max(up, down)
    cutoff = 1.0 / max_rate  # normalized to Nyquist of the upsampled signal
    numtaps = 2 * half_width * max_rate + 1
    n = np.arange(numtaps) - (numtaps - 1) / 2
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(numtaps, window_beta)
    h *= up / np.sum(h)  # unity DC gain after upsampling
    return h.astype(np.float64)


def _rational_approx(orig_sr: int, new_sr: int) -> Tuple[int, int]:
    g = math.gcd(int(new_sr), int(orig_sr))
    return int(new_sr) // g, int(orig_sr) // g


def resample_poly(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Host polyphase resampling of a 1-D float array."""
    if orig_sr == new_sr:
        return np.asarray(x, dtype=np.float32)
    up, down = _rational_approx(orig_sr, new_sr)
    try:
        from scipy.signal import resample_poly as _scipy_rp

        out = _scipy_rp(np.asarray(x, dtype=np.float64), up, down,
                        window=("kaiser", 5.0))
        return out.astype(np.float32)
    except Exception:
        pass
    # Fallback: direct upsample–filter–downsample with our own filter.
    h = _design_filter(up, down)
    upsampled = np.zeros(len(x) * up, dtype=np.float64)
    upsampled[::up] = np.asarray(x, dtype=np.float64)
    filtered = np.convolve(upsampled, h, mode="same")
    out_len = int(math.ceil(len(x) * up / down))
    return filtered[::down][:out_len].astype(np.float32)


def resample_output_length(num_samples: int, orig_sr: int, new_sr: int) -> int:
    up, down = _rational_approx(orig_sr, new_sr)
    return int(math.ceil(num_samples * up / down))


@functools.lru_cache(maxsize=32)
def _polyphase_bank(up: int, down: int) -> Tuple[np.ndarray, int]:
    """Polyphase filter bank ``G[Lw, up]`` and window start offset ``j_min``.

    Derivation: with zero-stuffed upsampling ``xu[n*up] = x[n]`` and the
    centered filter ``h`` (delay ``half``),

        y[b*up + s] = Σ_j h[s*down - j*up + half] · x[b*down + j]

    so a block of ``up`` consecutive outputs is one matmul between an
    ``x`` window of length ``Lw`` starting at ``b*down + j_min`` and a
    constant ``[Lw, up]`` bank.  Naive zero-stuffed convolution does
    ``up×`` redundant work; this form does none and runs on the MXU.
    """
    h = _design_filter(up, down).astype(np.float32)
    numtaps = len(h)
    half = (numtaps - 1) // 2
    j_min = -(half // up)
    j_max = ((up - 1) * down + half) // up
    lw = j_max - j_min + 1
    bank = np.zeros((lw, up), dtype=np.float32)
    for s in range(up):
        for l in range(lw):
            tap = s * down - (j_min + l) * up + half
            if 0 <= tap < numtaps:
                bank[l, s] = h[tap]
    return bank, j_min


def resample_jax(x, orig_sr: int, new_sr: int, precision=None):
    """Rational polyphase resampling of ``[B, T]`` on device.

    Shifted-block formulation: the window for output block ``b`` starts at
    ``b·down``, so with the padded signal reshaped into ``down``-sized
    blocks ``xb``, ``y_b = Σ_j xb[b+j] @ bank[j·down:(j+1)·down]`` — a few
    shifted ``[blocks, down] × [down, up]`` matmuls (MXU) instead of a
    strided window gather, which dominated resample time on TPU.
    Jit-able, static shapes, differentiable.  ``precision`` defaults to
    ``Precision.HIGHEST``; pass ``DEFAULT`` when the consumer computes in
    bfloat16 anyway.
    """
    import jax
    import jax.numpy as jnp

    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if orig_sr == new_sr:
        return x
    up, down = _rational_approx(orig_sr, new_sr)
    bank, j_min = _polyphase_bank(up, down)
    lw = bank.shape[0]

    t = x.shape[-1]
    out_len = resample_output_length(t, orig_sr, new_sr)
    num_blocks = -(-out_len // up)

    nparts = -(-lw // down)
    pad_left = -j_min
    # Enough samples for xb[j : j + num_blocks] ∀ j < nparts.
    needed = (num_blocks + nparts - 1) * down
    pad_right = max(needed - (t + pad_left), 0)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)])
    xp = xp[..., :needed]
    xb = xp.reshape(*x.shape[:-1], num_blocks + nparts - 1, down)

    bank_padded = np.zeros((nparts * down, up), dtype=np.float32)
    bank_padded[:lw] = bank
    out = 0.0
    for j in range(nparts):
        part = jnp.asarray(bank_padded[j * down:(j + 1) * down])
        out = out + jnp.matmul(xb[..., j : j + num_blocks, :], part,
                               precision=precision)
    out = out.reshape(*x.shape[:-1], num_blocks * up)
    return out[..., :out_len]

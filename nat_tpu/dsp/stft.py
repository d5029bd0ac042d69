"""STFT / spectrogram / mel-spectrogram as pure JAX functions.

TPU-first design notes:

* Framing is a reshape-free gather (`dynamic_slice`-style strided indexing
  compiled by XLA to an efficient copy); everything downstream is dense
  [frames, n_fft] work that XLA fuses and tiles.
* The DFT runs on the MXU as a real matmul against precomputed cos/sin
  bases when ``use_matmul_dft`` (default on TPU: f32 matmul outruns the
  generic FFT path at audio-scale n_fft and maps to the systolic array),
  with `jnp.fft.rfft` as the fallback.
* Semantics mirror torchaudio's Spectrogram/MelSpectrogram (the reference
  frontend, neural_audio_tokenizer.py:2276-2303): center reflect-pad,
  Hann window, power=2, ``normalized=True`` → divide STFT by
  sqrt(sum(window²)).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import melscale_fbanks


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(dtype)


def num_frames(num_samples: int, n_fft: int, hop_length: int,
               center: bool = True) -> int:
    if center:
        return num_samples // hop_length + 1
    return max((num_samples - n_fft) // hop_length + 1, 0)


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True, pad_mode: str = "reflect") -> jnp.ndarray:
    """Slice ``[..., T]`` into overlapping frames ``[..., frames, n_fft]``."""
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    t = x.shape[-1]
    n = (t - n_fft) // hop_length + 1
    starts = jnp.arange(n) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases, shape [n_fft, n_fft//2+1]."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def stft_power(
    x: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    power: float = 2.0,
    normalized: bool = False,
    use_matmul_dft: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Magnitude(^power) STFT of ``[..., T]`` → ``[..., n_freqs, frames]``.

    ``precision`` controls the DFT matmuls (default ``Precision.HIGHEST``
    = fp32-accurate multi-pass on the MXU; pass ``Precision.DEFAULT`` when
    the consumer computes in bfloat16 anyway — 3-6× fewer MXU passes).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    # Host-side window copy (when available) lets the block-DFT path fold
    # the window into the constant bases; a traced window falls back to the
    # dense-frames path.
    window_np = np.asarray(window) if isinstance(
        window, np.ndarray) else None
    window = jnp.asarray(window)
    if win_length < n_fft:  # torch centers the window in the frame
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
        if window_np is not None:
            window_np = np.pad(window_np,
                               (lpad, n_fft - win_length - lpad))

    g = math.gcd(n_fft, hop_length)
    if use_matmul_dft and g >= 32 and window_np is not None:
        # Shifted-block DFT: never materialize the [..., frames, n_fft]
        # window tensor (it is n_fft/hop × the signal size and its
        # gather/scatter dominates STFT time on TPU).  With the padded
        # signal reshaped into g-sized blocks xb (g = gcd(n_fft, hop)),
        # frame f starts at block f·(hop/g) and spans r = n_fft/g blocks:
        #   re[f] = Σ_j (xb[f·step + j] · w_j) @ C[j·g:(j+1)·g]
        # — r strided [n, g] × [g, n_freq] matmuls with the window folded
        # into the bases.  Same math as the dense form (addition order
        # differs per partial only), all MXU work, zero gathers.  The
        # g ≥ 32 guard keeps the matmul K-dim MXU-friendly; smaller gcds
        # fall back to the dense-frames matmul below.
        cos_b, sin_b = _dft_bases(n_fft)
        wf = window_np.astype(np.float32)[:, None]
        cos_w = jnp.asarray(wf * cos_b)
        sin_w = jnp.asarray(wf * sin_b)
        if center:
            pad = n_fft // 2
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                         mode=pad_mode)
        else:
            xp = x
        t = xp.shape[-1]
        n = (t - n_fft) // hop_length + 1
        step = hop_length // g
        r = n_fft // g
        nb = (n - 1) * step + r
        xp = xp[..., : nb * g]
        xb = xp.reshape(*xp.shape[:-1], nb, g)
        re = im = 0.0
        for j in range(r):
            blk = xb[..., j : j + (n - 1) * step + 1 : step, :]  # [.., n, g]
            sl = slice(j * g, (j + 1) * g)
            re = re + jnp.matmul(blk, cos_w[sl], precision=precision)
            im = im + jnp.matmul(blk, sin_w[sl], precision=precision)
        mag_sq = re * re + im * im
    elif use_matmul_dft:
        frames = frame_signal(x, n_fft, hop_length, center, pad_mode) * window
        cos_b, sin_b = _dft_bases(n_fft)
        re = jnp.matmul(frames, jnp.asarray(cos_b), precision=precision)
        im = -jnp.matmul(frames, jnp.asarray(sin_b), precision=precision)
        mag_sq = re * re + im * im
    else:
        frames = frame_signal(x, n_fft, hop_length, center, pad_mode) * window
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        mag_sq = jnp.abs(spec) ** 2

    if normalized:  # torchaudio normalized=True → "window" norm of the STFT
        mag_sq = mag_sq / jnp.sum(window ** 2)

    out = mag_sq if power == 2.0 else jnp.power(jnp.maximum(mag_sq, 0.0), power / 2.0)
    return jnp.swapaxes(out, -1, -2)  # [..., freq, time]


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    power: float = 2.0,
    normalized: bool = True,
    mel_scale: str = "htk",
    norm: Optional[str] = None,
    center: bool = True,
    precision=None,
) -> jnp.ndarray:
    """torchaudio-equivalent MelSpectrogram: ``[..., T]`` → ``[..., n_mels, frames]``.

    The mel projection is a single [freq, n_mels] matmul — MXU work fused by
    XLA with the DFT matmuls above it.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    f_max = f_max or sample_rate / 2.0
    spec = stft_power(x, n_fft=n_fft, hop_length=hop_length, power=power,
                      normalized=normalized, center=center,
                      precision=precision)
    fb = jnp.asarray(melscale_fbanks(
        n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate,
        norm=norm, mel_scale=mel_scale))
    return jnp.einsum("...ft,fm->...mt", spec, fb, precision=precision)


def log_mel_spectrogram(x: jnp.ndarray, eps: float = 1e-10, **kwargs) -> jnp.ndarray:
    return jnp.log(mel_spectrogram(x, **kwargs) + eps)

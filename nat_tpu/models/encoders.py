"""Acoustic + temporal feature encoders (flax).

Counterparts of reference neural_audio_tokenizer.py:2224-2499, designed for
TPU: NHWC/NTC layouts (XLA's preferred conv layouts), GroupNorm+GELU blocks
fused by XLA, and strictly static shapes.  Channel counts stay multiples of
128 where the reference allowed it so conv-as-matmul tiles the MXU cleanly.

* :class:`MelResidualEncoder` — mel spectrogram → 6-layer 2-D conv stack
  (stride 2 on the first 4 layers ⇒ time and frequency downsampled 16×),
  1×1 projection, mean-pool over frequency → ``[B, T/16, D]``.
* :class:`MultiScaleTemporalEncoder` — 5 parallel dilated-stride conv
  branches at scales (1, 2, 4, 8, 16), each upsampled back to the input
  length and fused with a 1×1 conv; length-preserving.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..dsp.stft import mel_spectrogram
from ..ops.interp import interp_linear


class ConvBlock2D(nn.Module):
    """Conv → GroupNorm → GELU (NHWC)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         dtype=self.dtype)(x)
        return nn.gelu(x)


class MelResidualEncoder(nn.Module):
    """Mel-spectrogram convolutional acoustic encoder.

    Input: waveform ``[B, T_samples]`` (+ static sample_rate); output
    features ``[B, T_mel/16, output_dim]``.
    """

    output_dim: int = 512
    n_mels: int = 128
    n_fft: int = 2048
    hop_length: int = 512
    sample_rate: int = 22050
    channels: Sequence[int] = (32, 64, 128, 256, 512, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        # DSP-front precision follows the compute dtype: full-precision
        # DFT passes are wasted when the log-mel is cast straight to
        # bfloat16 for the conv stack (~3-6x fewer MXU passes on TPU);
        # float32 compute keeps Precision.HIGHEST (torchaudio parity).
        import jax

        precision = (jax.lax.Precision.DEFAULT
                     if self.dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        mel = mel_spectrogram(
            waveform, sample_rate=self.sample_rate, n_fft=self.n_fft,
            hop_length=self.hop_length, n_mels=self.n_mels,
            normalized=True, precision=precision)    # [B, n_mels, T]
        x = jnp.log(mel + 1e-5).astype(self.dtype)
        x = jnp.transpose(x, (0, 2, 1))[..., None]    # NHWC: [B, T, n_mels, 1]

        for i, ch in enumerate(self.channels):
            strides = (2, 2) if i < 4 else (1, 1)
            x = ConvBlock2D(ch, strides=strides, dtype=self.dtype)(x)

        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)
        return jnp.mean(x, axis=2).astype(jnp.float32)  # [B, T/16, D]


class ConvBlock1D(nn.Module):
    """Conv1d → GroupNorm → GELU (NTC layout)."""

    features: int
    kernel: int
    strides: int = 1
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel,), strides=(self.strides,),
                    padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.features),
                         dtype=self.dtype)(x)
        return nn.gelu(x)


class MultiScaleTemporalEncoder(nn.Module):
    """Parallel multi-resolution temporal conv branches, length-preserving.

    Input/output ``[B, T, input_dim]``.
    """

    input_dim: int = 512
    scales: Sequence[int] = (1, 2, 4, 8, 16)
    branch_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t = x.shape[1]
        x = x.astype(self.dtype)
        branches = []
        for s in self.scales:
            b = ConvBlock1D(self.branch_dim, kernel=2 * s + 1, strides=s,
                            dtype=self.dtype)(x)
            b = ConvBlock1D(self.branch_dim, kernel=3, dtype=self.dtype)(b)
            # back to the input time base
            b = jnp.swapaxes(interp_linear(jnp.swapaxes(b, 1, 2), t), 1, 2)
            branches.append(b)
        fused = jnp.concatenate(branches, axis=-1)
        return nn.Conv(self.input_dim, (1,),
                       dtype=self.dtype)(fused).astype(jnp.float32)

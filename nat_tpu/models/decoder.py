"""Reconstruction decoder (flax).

Counterpart of the reference's optional Conv1d decoder stack
(neural_audio_tokenizer.py:3022-3035, 3249-3279): concatenated quantized
semantic+acoustic features [B, T, 2D] → conv stack 1024→512→256→128→1 →
linear upsample to ``T_target * hop`` samples.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.interp import interp_linear


class ReconstructionDecoder(nn.Module):
    channels: Sequence[int] = (512, 256, 128)
    kernel: int = 5

    @nn.compact
    def __call__(self, quantized: jnp.ndarray, out_samples: int) -> jnp.ndarray:
        """``quantized [B, T, C]`` → waveform ``[B, out_samples]``."""
        h = quantized
        for ch in self.channels:
            h = nn.Conv(ch, (self.kernel,), padding="SAME")(h)
            h = nn.gelu(h)
        h = nn.Conv(1, (self.kernel,), padding="SAME")(h)   # [B, T, 1]
        wave = jnp.tanh(h[..., 0])
        return interp_linear(wave, out_samples)

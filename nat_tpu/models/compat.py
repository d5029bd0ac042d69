"""Compatibility-fallback tokenizer.

Duck-typed stand-in used when the neural path is unavailable or explicitly
requested via ``--compat-fallback`` (reference neural_audio_tokenizer.py:
4675-4704): frame count is ``samples // hop``, and every S/A layer carries
labeled random tokens in [0, 1024).  Tokens are produced with a numpy
Generator so deterministic mode yields a reproducible stream without any
device round-trip; this is a host-only product mode, exercised by the
black-box CLI tests.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

COMPAT_VOCAB = 1024
COMPAT_HOP = 512


class CompatTokenizer:
    """Emits labeled random token layers shaped like the neural output."""

    def __init__(self, sample_rate: int, num_semantic_layers: int = 4,
                 num_acoustic_layers: int = 4,
                 seed: Optional[int] = None) -> None:
        self.sample_rate = sample_rate
        self.num_semantic_layers = num_semantic_layers
        self.num_acoustic_layers = num_acoustic_layers
        self.seed = seed

    def __call__(self, waveform: np.ndarray,
                 actual_sample_rate: Optional[int] = None) -> Dict:
        waveform = np.atleast_2d(np.asarray(waveform))
        batch, samples = waveform.shape[0], waveform.shape[-1]
        time_steps = max(samples // COMPAT_HOP, 0)

        rng = np.random.default_rng(self.seed)
        semantic = [rng.integers(0, COMPAT_VOCAB, size=(batch, time_steps))
                    for _ in range(self.num_semantic_layers)]
        acoustic = [rng.integers(0, COMPAT_VOCAB, size=(batch, time_steps))
                    for _ in range(self.num_acoustic_layers)]
        return {
            "semantic_codes": semantic,
            "acoustic_codes": acoustic,
            "losses": {"total_vq_loss": 0.0},
            "reconstructed": None,
            "semantic_features": rng.standard_normal((batch, 512, time_steps)).astype(np.float32),
            "acoustic_features": rng.standard_normal((batch, 512, time_steps)).astype(np.float32),
            "num_frames": time_steps,
        }

    def eval(self) -> "CompatTokenizer":
        return self

"""Token budget / throughput metering (reference: 2856-2924)."""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass
class TokenBudgetMetrics:
    """Token budget and throughput tracking metrics."""

    total_tokens: int = 0
    semantic_tokens: int = 0
    acoustic_tokens: int = 0
    tokens_per_second: float = 0.0       # legacy: processing-time rate
    frames_per_second: float = 0.0       # legacy: audio-time rate
    compression_ratio: float = 0.0
    processing_time: float = 0.0
    # Disambiguated audio-time vs processing-time rates
    audio_frames_per_second: float = 0.0
    audio_tokens_per_second: float = 0.0
    processing_frames_per_second: float = 0.0
    processing_tokens_per_second: float = 0.0


class TokenBudgetMeter:
    """Tracks samples/frames/tokens and derives audio-time vs wall-clock rates."""

    def __init__(self, sample_rate: int = 22050, hop_length: int = 512) -> None:
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.reset()

    def reset(self) -> None:
        self.start_time = time.time()
        self.total_samples = 0
        self.total_frames = 0
        self.semantic_tokens = 0
        self.acoustic_tokens = 0

    def update(self, samples: int, frames: int, sem_tokens: int, acc_tokens: int) -> None:
        self.total_samples += samples
        self.total_frames += frames
        self.semantic_tokens += sem_tokens
        self.acoustic_tokens += acc_tokens

    def get_metrics(self) -> TokenBudgetMetrics:
        elapsed = time.time() - self.start_time
        total_tokens = self.semantic_tokens + self.acoustic_tokens
        audio_duration = (
            self.total_samples / self.sample_rate if self.sample_rate > 0 else elapsed
        )
        audio_fps = self.total_frames / max(audio_duration, 1e-6)
        return TokenBudgetMetrics(
            total_tokens=total_tokens,
            semantic_tokens=self.semantic_tokens,
            acoustic_tokens=self.acoustic_tokens,
            tokens_per_second=total_tokens / max(elapsed, 1e-6),
            frames_per_second=audio_fps,
            compression_ratio=self.total_samples / max(total_tokens, 1),
            processing_time=elapsed,
            audio_frames_per_second=audio_fps,
            audio_tokens_per_second=total_tokens / max(audio_duration, 1e-6),
            processing_frames_per_second=self.total_frames / max(elapsed, 1e-6),
            processing_tokens_per_second=total_tokens / max(elapsed, 1e-6),
        )

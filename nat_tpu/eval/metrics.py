"""Tokenization quality metrics.

Counterpart of reference `TokenizationMetrics` / `TokenizationEvaluator`
(neural_audio_tokenizer.py:3318-3732).  This module computes the full
20-field metric set with *value parity*: every formula matches the
reference's code on identical inputs — entropy in nats (scipy.stats.entropy
semantics, :3577-3584), mutual information over ALL semantic vs ALL
acoustic tokens with adaptive binning (:3586-3637), grouped token
diversity (:3441-3447), DC-removed reconstruction MSE (:3459-3467), and
the librosa-based audio metrics via :mod:`nat_tpu.eval.audio_metrics`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..utils.memory import get_memory_usage_mb


@dataclass
class TokenizationMetrics:
    """Comprehensive metrics for evaluating tokenization quality."""

    # Basic statistics
    num_semantic_tokens: int
    num_acoustic_tokens: int
    compression_ratio: float
    token_diversity: float
    # Reconstruction metrics
    mse_loss: float
    spectral_loss: float
    perceptual_loss: float
    # Additional standard audio metrics
    mr_stft_loss: float
    log_spectral_distance: float
    # Information theory metrics
    semantic_entropy: float
    acoustic_entropy: float
    mutual_information: float
    # Music-specific metrics
    pitch_accuracy: float
    rhythm_accuracy: float
    timbral_similarity: float
    # Efficiency metrics
    encoding_time: float
    decoding_time: float
    memory_usage: float
    # Token budget metrics
    tokens_per_second: float = 0.0
    frames_per_second: float = 0.0


def shannon_entropy(tokens: np.ndarray) -> float:
    """Entropy (nats) of a discrete token sequence — the reference uses
    ``scipy.stats.entropy`` whose default base is e (3577-3584)."""
    if tokens.size == 0:
        return 0.0
    _, counts = np.unique(tokens, return_counts=True)
    p = counts / counts.sum()
    return float(-np.sum(p * np.log(p)))


def mutual_information(a: np.ndarray, b: np.ndarray,
                       bins: Optional[int] = None) -> float:
    """MI (bits) between two token streams via a 2-D joint histogram.

    Reference semantics (3586-3637): streams truncated to the common
    length; adaptive bin count ``min(64, max(unique_a, unique_b, 2))``
    unless overridden; joint cells masked at 1e-12; denominator
    regularized by 1e-12."""
    a = np.asarray(a).astype(np.int64).ravel()
    b = np.asarray(b).astype(np.int64).ravel()
    n = min(a.size, b.size)
    if n == 0:
        return 0.0
    a, b = a[:n], b[:n]
    if bins is None:
        bins = min(64, max(len(np.unique(a)), len(np.unique(b)), 2))
    joint, _, _ = np.histogram2d(a, b, bins=bins)
    total = joint.sum()
    if total == 0:
        return 0.0
    pxy = joint / total
    px = pxy.sum(axis=1, keepdims=True)
    py = pxy.sum(axis=0, keepdims=True)
    mask = pxy > 1e-12
    px_e = np.broadcast_to(px, pxy.shape)[mask]
    py_e = np.broadcast_to(py, pxy.shape)[mask]
    pxy_nz = pxy[mask]
    if pxy_nz.size == 0:
        return 0.0
    mi = float(np.sum(pxy_nz * np.log2(pxy_nz / (px_e * py_e + 1e-12))))
    return mi if np.isfinite(mi) else 0.0


def token_diversity(all_tokens: np.ndarray) -> float:
    """unique / total for one token group (reference 3444-3445)."""
    if all_tokens.size == 0:
        return 0.0
    return float(len(np.unique(all_tokens)) / all_tokens.size)


def grouped_token_diversity(sem: np.ndarray, acc: np.ndarray) -> float:
    """Mean of the semantic and acoustic per-group diversities — the
    reference's ``token_diversity`` field (3441-3447)."""
    return (token_diversity(sem) + token_diversity(acc)) / 2.0


class TokenizationEvaluator:
    """Computes the metric set from a tokenizer result dict."""

    def __init__(self, sample_rate: int = 22050) -> None:
        self.sample_rate = sample_rate

    def evaluate_tokenization(
        self,
        audio: np.ndarray,
        tokenizer=None,
        reconstructed: Optional[np.ndarray] = None,
        precomputed_result: Optional[Dict] = None,
        encoding_time: float = 0.0,
        decoding_time: float = 0.0,
        num_samples: Optional[int] = None,
    ) -> TokenizationMetrics:
        """``num_samples`` overrides ``audio.size`` for the compression
        ratio — streaming callers evaluate after trimming their buffers, so
        the true sample count must be passed explicitly."""
        initial_memory = get_memory_usage_mb()
        result = precomputed_result or {}
        sem_codes: List[np.ndarray] = [
            np.asarray(c).reshape(-1) for c in result.get("semantic_codes", [])]
        acc_codes: List[np.ndarray] = [
            np.asarray(c).reshape(-1) for c in result.get("acoustic_codes", [])]

        sem_all = np.concatenate(sem_codes) if sem_codes else np.array([], dtype=int)
        acc_all = np.concatenate(acc_codes) if acc_codes else np.array([], dtype=int)

        if num_samples is None:
            num_samples = int(np.asarray(audio).size)
        total_tokens = int(sem_all.size + acc_all.size)

        mse = 0.0
        spectral = 0.0
        perceptual = 0.0
        mr_stft = 0.0
        lsd = 0.0
        pitch = 0.0
        rhythm = 0.0
        timbre = 0.0
        if reconstructed is not None:
            recon_raw = np.asarray(reconstructed, dtype=np.float32).reshape(-1)
            orig_full = np.asarray(audio, dtype=np.float32).reshape(-1)
            # DC offset removed from the reconstruction before the aligned
            # spectral comparisons (reference 3459-3461); the music metrics
            # below operate on the RAW un-aligned signals (reference
            # 3490-3492 passes original/reconstructed directly).
            recon = recon_raw - np.mean(recon_raw)
            n = min(recon.size, orig_full.size)
            if n > 0:
                recon, orig = recon[:n], orig_full[:n]
                mse = float(np.mean((recon - orig) ** 2))
                from . import audio_metrics

                spectral = audio_metrics.spectral_mse(orig, recon)
                mr_stft = audio_metrics.mr_stft_loss(orig, recon)
                lsd = audio_metrics.log_spectral_distance(orig, recon)
                perceptual = audio_metrics.perceptual_loss(orig, recon, self.sample_rate)
                pitch = audio_metrics.pitch_accuracy(orig_full, recon_raw, self.sample_rate)
                rhythm = audio_metrics.rhythm_accuracy(orig_full, recon_raw, self.sample_rate)
                timbre = audio_metrics.timbral_similarity(orig_full, recon_raw, self.sample_rate)

        # MI over ALL semantic vs ALL acoustic tokens (reference 3489).
        mi = mutual_information(sem_all, acc_all)

        final_memory = get_memory_usage_mb()
        return TokenizationMetrics(
            num_semantic_tokens=int(sem_all.size),
            num_acoustic_tokens=int(acc_all.size),
            compression_ratio=num_samples / max(total_tokens, 1),
            token_diversity=grouped_token_diversity(sem_all, acc_all),
            mse_loss=mse,
            spectral_loss=spectral,
            perceptual_loss=perceptual,
            mr_stft_loss=mr_stft,
            log_spectral_distance=lsd,
            semantic_entropy=shannon_entropy(sem_all),
            acoustic_entropy=shannon_entropy(acc_all),
            mutual_information=mi,
            pitch_accuracy=pitch,
            rhythm_accuracy=rhythm,
            timbral_similarity=timbre,
            encoding_time=encoding_time,
            decoding_time=decoding_time,
            # Peak memory increase during evaluation (reference 3500-3502).
            memory_usage=max(final_memory - initial_memory, 0.0),
        )

"""Native audio-quality metrics (numpy; no librosa dependency).

Value-parity counterparts of reference TokenizationEvaluator internals
(neural_audio_tokenizer.py:3356-3732).  Every formula here matches the
reference's code on identical inputs: linear-magnitude spectral MSE
(:3470-3473), MFCC-MSE perceptual loss (:3481-3484), MR-STFT (:3527-3553),
LSD (:3555-3575), piptrack dominant-pitch correlation (:3639-3673),
onset-interval rhythm correlation (:3675-3711), and mean-MFCC cosine
timbral similarity (:3713-3732).  The librosa calls those formulas make are
served by :mod:`nat_tpu.eval.librosa_compat` (librosa-0.10-faithful numpy).
All functions operate on mono float arrays.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import librosa_compat as lc

_EPS = 1e-8


def stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Magnitude STFT [freq, frames], librosa semantics (centered frames,
    periodic Hann, zero padding)."""
    return lc.stft_mag(x, n_fft, hop)


def _pair(orig: np.ndarray, recon: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = min(orig.size, recon.size)
    return (np.asarray(orig).reshape(-1)[:n].astype(np.float64),
            np.asarray(recon).reshape(-1)[:n].astype(np.float64))


def spectral_mse(orig: np.ndarray, recon: np.ndarray,
                 n_fft: int = 2048, hop: int = 512) -> float:
    """MSE of *linear* STFT magnitudes — the reference's ``spectral_loss``
    (reference 3470-3473: ``np.mean((|stft(o)| - |stft(r)|)**2)``)."""
    o, r = _pair(orig, recon)
    so, sr_ = lc.stft_mag(o, n_fft, hop), lc.stft_mag(r, n_fft, hop)
    t = min(so.shape[1], sr_.shape[1])
    return float(np.mean((so[:, :t] - sr_[:, :t]) ** 2))


def spectral_l1(orig: np.ndarray, recon: np.ndarray,
                sample_rate: int, n_fft: int = 2048, hop: int = 512) -> float:
    """L1 distance between log-magnitude spectrograms (kept as an extra
    diagnostic; the evaluator's ``spectral_loss`` field uses
    :func:`spectral_mse` for reference parity)."""
    o, r = _pair(orig, recon)
    so, sr_ = lc.stft_mag(o, n_fft, hop), lc.stft_mag(r, n_fft, hop)
    t = min(so.shape[1], sr_.shape[1])
    return float(np.mean(np.abs(np.log(so[:, :t] + _EPS)
                                - np.log(sr_[:, :t] + _EPS))))


def mr_stft_loss(orig: np.ndarray, recon: np.ndarray) -> float:
    """Multi-resolution STFT loss over (512,128)/(1024,256)/(2048,512):
    per scale, linear-magnitude MSE + log-magnitude (eps 1e-7) MSE,
    averaged over scales (reference 3527-3553)."""
    o, r = _pair(orig, recon)
    total = 0.0
    resolutions = ((512, 128), (1024, 256), (2048, 512))
    for n_fft, hop in resolutions:
        so, sr_ = lc.stft_mag(o, n_fft, hop), lc.stft_mag(r, n_fft, hop)
        t = min(so.shape[1], sr_.shape[1])
        so, sr_ = so[:, :t], sr_[:, :t]
        mag_loss = np.mean((so - sr_) ** 2)
        log_loss = np.mean((np.log(so + 1e-7) - np.log(sr_ + 1e-7)) ** 2)
        total += mag_loss + log_loss
    return float(total / len(resolutions))


def log_spectral_distance(orig: np.ndarray, recon: np.ndarray,
                          n_fft: int = 2048, hop: int = 512) -> float:
    """Global RMS of log10 power-spectrum differences (reference
    3555-3575: ``sqrt(mean((log10(P_o+1e-10) - log10(P_r+1e-10))**2))``)."""
    o, r = _pair(orig, recon)
    so, sr_ = lc.stft_mag(o, n_fft, hop), lc.stft_mag(r, n_fft, hop)
    t = min(so.shape[1], sr_.shape[1])
    diff = (np.log10(so[:, :t] ** 2 + 1e-10)
            - np.log10(sr_[:, :t] ** 2 + 1e-10))
    return float(np.sqrt(np.mean(diff ** 2)))


def perceptual_loss(orig: np.ndarray, recon: np.ndarray,
                    sample_rate: int) -> float:
    """MSE of default-parameter MFCCs (n_mfcc=20) — the reference's
    perceptual proxy (3481-3484: ``np.mean((mfcc(o) - mfcc(r))**2)``)."""
    o, r = _pair(orig, recon)
    mo, mr = lc.mfcc(o, sample_rate), lc.mfcc(r, sample_rate)
    t = min(mo.shape[1], mr.shape[1])
    return float(np.mean((mo[:, :t] - mr[:, :t]) ** 2))


def dominant_pitch_track(x: np.ndarray, sample_rate: int) -> np.ndarray:
    """Per-frame dominant pitch (Hz): the maximum entry of each piptrack
    frame column — exactly the reference's ``frame[frame.argmax()]``
    selection (3650-3652) over librosa.piptrack output."""
    pitches, _ = lc.piptrack(np.asarray(x, np.float64), sample_rate)
    return pitches.max(axis=0)


def pitch_accuracy(orig: np.ndarray, recon: np.ndarray,
                   sample_rate: int) -> float:
    """Pearson correlation of dominant-pitch tracks (reference 3639-3673:
    raw correlation; 0.0 on degenerate/constant/non-finite tracks)."""
    o, r = _pair(orig, recon)
    po = dominant_pitch_track(o, sample_rate)
    pr = dominant_pitch_track(r, sample_rate)
    t = min(po.size, pr.size)
    if t < 2:
        return 0.0
    po, pr = po[:t], pr[:t]
    if (np.std(po) == 0 or np.std(pr) == 0
            or not np.all(np.isfinite(po)) or not np.all(np.isfinite(pr))):
        return 0.0
    corr = np.corrcoef(po, pr)[0, 1]
    return float(corr) if np.isfinite(corr) else 0.0


def onset_strength(x: np.ndarray, sample_rate: int,
                   hop: int = 512) -> np.ndarray:
    """Spectral-flux onset envelope (librosa.onset.onset_strength)."""
    return lc.onset_strength(np.asarray(x, np.float64), sample_rate, hop)


def detect_onsets(x: np.ndarray, sample_rate: int, hop: int = 512) -> np.ndarray:
    """Onset frame indices (librosa.onset.onset_detect defaults)."""
    return lc.onset_detect(np.asarray(x, np.float64), sample_rate, hop)


def rhythm_accuracy(orig: np.ndarray, recon: np.ndarray,
                    sample_rate: int) -> float:
    """Pearson correlation of inter-onset-interval sequences (reference
    3675-3711: onset times via onset_detect(units='time'), raw correlation,
    0.0 when onsets/intervals are too few or degenerate)."""
    o, r = _pair(orig, recon)
    oo = lc.onset_detect(o, sample_rate, units="time")
    ro = lc.onset_detect(r, sample_rate, units="time")
    if len(oo) < 2 or len(ro) < 2:
        return 0.0
    io, ir = np.diff(oo), np.diff(ro)
    n = min(io.size, ir.size)
    if n < 2:
        return 0.0
    io, ir = io[:n], ir[:n]
    if (np.std(io) == 0 or np.std(ir) == 0
            or not np.all(np.isfinite(io)) or not np.all(np.isfinite(ir))):
        return 0.0
    corr = np.corrcoef(io, ir)[0, 1]
    return float(corr) if np.isfinite(corr) else 0.0


def mfcc(x: np.ndarray, sample_rate: int, n_mfcc: int = 13) -> np.ndarray:
    """MFCCs [n_mfcc, frames], librosa.feature.mfcc semantics."""
    return lc.mfcc(np.asarray(x, np.float64), sample_rate, n_mfcc=n_mfcc)


def timbral_similarity(orig: np.ndarray, recon: np.ndarray,
                       sample_rate: int) -> float:
    """Cosine similarity of time-averaged 13-MFCC vectors (reference
    3713-3732: raw cosine, eps 1e-8 in the denominator)."""
    o, r = _pair(orig, recon)
    mo = lc.mfcc(o, sample_rate, n_mfcc=13).mean(axis=1)
    mr = lc.mfcc(r, sample_rate, n_mfcc=13).mean(axis=1)
    sim = np.dot(mo, mr) / (np.linalg.norm(mo) * np.linalg.norm(mr) + _EPS)
    return float(sim) if np.isfinite(sim) else 0.0


def _mel_spec(x: np.ndarray, sample_rate: int, n_mels: int = 128,
              n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Power mel spectrogram [n_mels, frames] (librosa semantics)."""
    return lc.melspectrogram(np.asarray(x, np.float64), sample_rate,
                             n_fft, hop, n_mels)


def spectral_centroid(x: np.ndarray, sample_rate: int,
                      n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mag = lc.stft_mag(x, n_fft, hop)
    freqs = lc.fft_frequencies(sample_rate, n_fft)[:, None]
    return (freqs * mag).sum(axis=0) / (mag.sum(axis=0) + _EPS)


def spectral_rolloff(x: np.ndarray, sample_rate: int, roll: float = 0.85,
                     n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mag = lc.stft_mag(x, n_fft, hop)
    cum = np.cumsum(mag, axis=0)
    target = roll * cum[-1]
    idx = (cum >= target[None, :]).argmax(axis=0)
    return lc.fft_frequencies(sample_rate, n_fft)[idx]


def zero_crossing_rate(x: np.ndarray, frame: int = 2048,
                       hop: int = 512) -> np.ndarray:
    n = max((x.size - frame) // hop + 1, 0)
    out = np.empty(n)
    for i in range(n):
        seg = x[i * hop: i * hop + frame]
        out[i] = np.mean(np.abs(np.diff(np.signbit(seg))))
    return out

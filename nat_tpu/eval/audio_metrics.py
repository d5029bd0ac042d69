"""Native audio-quality metrics (numpy; no librosa dependency).

Counterparts of reference TokenizationEvaluator internals
(neural_audio_tokenizer.py:3356-3732): multi-resolution STFT loss, log
spectral distance, mel/perceptual losses, dominant-pitch correlation
(librosa.piptrack stand-in), onset-interval rhythm correlation, and
mean-MFCC cosine timbral similarity.  All operate on mono float arrays.
"""

from __future__ import annotations



from typing import Tuple

import numpy as np

from ..dsp.mel import melscale_fbanks

_EPS = 1e-8


def stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Magnitude STFT [freq, frames] with centered Hann frames."""
    if x.size < n_fft:
        x = np.pad(x, (0, n_fft - x.size))
    pad = n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n = (xp.size - n_fft) // hop + 1
    idx = (np.arange(n)[:, None] * hop) + np.arange(n_fft)[None, :]
    frames = xp[idx] * np.hanning(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=-1)).T


def _pair(orig: np.ndarray, recon: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = min(orig.size, recon.size)
    return orig[:n].astype(np.float64), recon[:n].astype(np.float64)


def spectral_l1(orig: np.ndarray, recon: np.ndarray,
                sample_rate: int, n_fft: int = 2048, hop: int = 512) -> float:
    """L1 distance between log-magnitude spectrograms."""
    o, r = _pair(orig, recon)
    so, sr_ = stft_mag(o, n_fft, hop), stft_mag(r, n_fft, hop)
    t = min(so.shape[1], sr_.shape[1])
    return float(np.mean(np.abs(np.log(so[:, :t] + _EPS)
                                - np.log(sr_[:, :t] + _EPS))))


def mr_stft_loss(orig: np.ndarray, recon: np.ndarray) -> float:
    """Multi-resolution STFT loss over (512,128)/(1024,256)/(2048,512):
    spectral convergence + log-magnitude L1 per resolution, averaged."""
    o, r = _pair(orig, recon)
    total = 0.0
    resolutions = ((512, 128), (1024, 256), (2048, 512))
    for n_fft, hop in resolutions:
        so, sr_ = stft_mag(o, n_fft, hop), stft_mag(r, n_fft, hop)
        t = min(so.shape[1], sr_.shape[1])
        so, sr_ = so[:, :t], sr_[:, :t]
        sc = np.linalg.norm(so - sr_) / (np.linalg.norm(so) + _EPS)
        log_l1 = np.mean(np.abs(np.log(so + _EPS) - np.log(sr_ + _EPS)))
        total += sc + log_l1
    return float(total / len(resolutions))


def log_spectral_distance(orig: np.ndarray, recon: np.ndarray,
                          n_fft: int = 2048, hop: int = 512) -> float:
    """Frame-wise RMS of log-power spectrum differences (dB-like)."""
    o, r = _pair(orig, recon)
    so, sr_ = stft_mag(o, n_fft, hop), stft_mag(r, n_fft, hop)
    t = min(so.shape[1], sr_.shape[1])
    diff = (10.0 * np.log10(so[:, :t] ** 2 + _EPS)
            - 10.0 * np.log10(sr_[:, :t] ** 2 + _EPS))
    return float(np.mean(np.sqrt(np.mean(diff ** 2, axis=0))))


def _mel_spec(x: np.ndarray, sample_rate: int, n_mels: int = 64,
              n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mag = stft_mag(x, n_fft, hop)
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, sample_rate / 2, n_mels,
                         sample_rate)
    return fb.T @ (mag ** 2)


def perceptual_loss(orig: np.ndarray, recon: np.ndarray,
                    sample_rate: int) -> float:
    """Log-mel-domain L2 (the reference's perceptual proxy)."""
    o, r = _pair(orig, recon)
    mo, mr = _mel_spec(o, sample_rate), _mel_spec(r, sample_rate)
    t = min(mo.shape[1], mr.shape[1])
    return float(np.mean((np.log(mo[:, :t] + _EPS)
                          - np.log(mr[:, :t] + _EPS)) ** 2))


def dominant_pitch_track(x: np.ndarray, sample_rate: int,
                         n_fft: int = 2048, hop: int = 512,
                         fmin: float = 50.0, fmax: float = 2000.0) -> np.ndarray:
    """Per-frame dominant pitch in Hz via spectral-peak quadratic
    interpolation (librosa.piptrack dominant-pitch stand-in)."""
    mag = stft_mag(x, n_fft, hop)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    band = (freqs >= fmin) & (freqs <= fmax)
    sub = mag[band]
    base = np.nonzero(band)[0][0]
    peak = np.argmax(sub, axis=0)
    # quadratic interpolation around the peak bin
    k = np.clip(peak, 1, sub.shape[0] - 2)
    cols = np.arange(sub.shape[1])
    alpha, beta, gamma = sub[k - 1, cols], sub[k, cols], sub[k + 1, cols]
    denom = alpha - 2 * beta + gamma
    delta = np.where(np.abs(denom) > _EPS,
                     0.5 * (alpha - gamma) / (denom + _EPS), 0.0)
    bin_f = base + k + np.clip(delta, -0.5, 0.5)
    pitch = bin_f * sample_rate / n_fft
    # silence gating
    energy = sub[k, cols]
    pitch[energy < np.max(energy) * 1e-3] = 0.0
    return pitch


def pitch_accuracy(orig: np.ndarray, recon: np.ndarray,
                   sample_rate: int) -> float:
    """Correlation of dominant-pitch tracks, mapped to [0, 1]."""
    o, r = _pair(orig, recon)
    po = dominant_pitch_track(o, sample_rate)
    pr = dominant_pitch_track(r, sample_rate)
    t = min(po.size, pr.size)
    po, pr = po[:t], pr[:t]
    voiced = (po > 0) & (pr > 0)
    if voiced.sum() < 4:
        return 0.0
    if np.std(po[voiced]) < _EPS or np.std(pr[voiced]) < _EPS:
        # Constant pitch on both sides: compare values directly
        return float(np.mean(
            np.abs(po[voiced] - pr[voiced]) < 0.05 * po[voiced]))
    corr = np.corrcoef(po[voiced], pr[voiced])[0, 1]
    return float(max(0.0, corr)) if np.isfinite(corr) else 0.0


def onset_strength(x: np.ndarray, sample_rate: int,
                   hop: int = 512) -> np.ndarray:
    """Spectral-flux onset envelope (librosa.onset stand-in)."""
    mel = np.log(_mel_spec(x, sample_rate, n_mels=64, hop=hop) + _EPS)
    flux = np.diff(mel, axis=1)
    return np.maximum(flux, 0.0).mean(axis=0)


def detect_onsets(x: np.ndarray, sample_rate: int, hop: int = 512) -> np.ndarray:
    """Onset frame indices via adaptive peak picking on the flux envelope."""
    env = onset_strength(x, sample_rate, hop)
    if env.size < 3:
        return np.array([], dtype=int)
    thresh = env.mean() + env.std()
    peaks = []
    last = -4
    for i in range(1, env.size - 1):
        if env[i] > thresh and env[i] >= env[i - 1] and env[i] >= env[i + 1]:
            if i - last >= 4:  # ~46 ms refractory at hop 512 / 22.05 kHz
                peaks.append(i)
                last = i
    return np.asarray(peaks, dtype=int)


def rhythm_accuracy(orig: np.ndarray, recon: np.ndarray,
                    sample_rate: int) -> float:
    """Correlation of inter-onset-interval sequences, mapped to [0, 1]."""
    o, r = _pair(orig, recon)
    oo, ro = detect_onsets(o, sample_rate), detect_onsets(r, sample_rate)
    if len(oo) < 3 or len(ro) < 3:
        # Degenerate: score onset-count agreement instead
        denom = max(len(oo), len(ro), 1)
        return float(min(len(oo), len(ro)) / denom)
    io, ir = np.diff(oo), np.diff(ro)
    n = min(io.size, ir.size)
    if n < 2 or np.std(io[:n]) < _EPS or np.std(ir[:n]) < _EPS:
        return float(min(io.size, ir.size) / max(io.size, ir.size))
    corr = np.corrcoef(io[:n], ir[:n])[0, 1]
    return float(max(0.0, corr)) if np.isfinite(corr) else 0.0


def mfcc(x: np.ndarray, sample_rate: int, n_mfcc: int = 13,
         n_mels: int = 64) -> np.ndarray:
    """MFCCs [n_mfcc, frames] via log-mel + orthonormal DCT-II."""
    logmel = np.log(_mel_spec(x, sample_rate, n_mels=n_mels) + _EPS)
    n = logmel.shape[0]
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n)[None, :]
    dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    return dct @ logmel


def timbral_similarity(orig: np.ndarray, recon: np.ndarray,
                       sample_rate: int) -> float:
    """Cosine similarity of time-averaged MFCC vectors, mapped to [0, 1]."""
    o, r = _pair(orig, recon)
    mo = mfcc(o, sample_rate).mean(axis=1)
    mr = mfcc(r, sample_rate).mean(axis=1)
    denom = (np.linalg.norm(mo) * np.linalg.norm(mr)) + _EPS
    return float(np.clip((np.dot(mo, mr) / denom + 1.0) / 2.0, 0.0, 1.0))


def spectral_centroid(x: np.ndarray, sample_rate: int,
                      n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mag = stft_mag(x, n_fft, hop)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)[:, None]
    return (freqs * mag).sum(axis=0) / (mag.sum(axis=0) + _EPS)


def spectral_rolloff(x: np.ndarray, sample_rate: int, roll: float = 0.85,
                     n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mag = stft_mag(x, n_fft, hop)
    cum = np.cumsum(mag, axis=0)
    target = roll * cum[-1]
    idx = (cum >= target[None, :]).argmax(axis=0)
    return np.fft.rfftfreq(n_fft, 1.0 / sample_rate)[idx]


def zero_crossing_rate(x: np.ndarray, frame: int = 2048,
                       hop: int = 512) -> np.ndarray:
    n = max((x.size - frame) // hop + 1, 0)
    out = np.empty(n)
    for i in range(n):
        seg = x[i * hop: i * hop + frame]
        out[i] = np.mean(np.abs(np.diff(np.signbit(seg))))
    return out

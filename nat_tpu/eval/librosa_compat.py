"""librosa-compatible DSP primitives (numpy/scipy only, librosa 0.10 semantics).

The reference evaluator computes its metrics with librosa — spectral loss
(reference neural_audio_tokenizer.py:3470-3473), MFCC perceptual loss
(:3481-3484), MR-STFT (:3527-3553), LSD (:3555-3575), piptrack pitch
(:3639-3673), onset rhythm (:3675-3711), MFCC timbre (:3713-3732).  To make
``--metrics`` output *value*-comparable with the reference tool, this module
reimplements exactly the librosa call surface those formulas use:

* ``stft_mag`` — centered STFT, periodic Hann, zero ("constant") padding;
* ``mel_fb``/``melspectrogram`` — Slaney mel scale + Slaney area norm;
* ``power_to_db`` — 10·log10 with ``amin=1e-10`` and 80 dB dynamic floor;
* ``mfcc`` — DCT-II (ortho) of the dB mel spectrogram;
* ``piptrack`` — parabolic-interpolated spectral peaks over [fmin, fmax)
  thresholded per frame;
* ``onset_strength``/``onset_detect``/``peak_pick`` — spectral-flux novelty
  with librosa's moving max/average peak picker and its exact defaults.

Validated against real librosa by tests/test_librosa_parity.py whenever
librosa is importable (skipped otherwise — it is not part of this
environment).  Versioning note: librosa changed the STFT ``pad_mode``
default from ``reflect`` to ``constant`` in 0.10; the reference pins
``librosa>=0.9.0``, which resolves to ≥0.10 on any current install, so the
``constant`` semantics are used here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..dsp.mel import hz_to_mel, mel_to_hz


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', fftbins=True)``)."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft(y: np.ndarray, n_fft: int = 2048,
         hop_length: Optional[int] = None,
         center: bool = True) -> np.ndarray:
    """Complex STFT ``[1 + n_fft//2, frames]``, librosa defaults.

    Matches librosa's numerics exactly: the window multiply and FFT run in
    float64, and the result is stored complex64 (librosa pre-allocates the
    output as ``util.dtype_r2c(y.dtype)`` and downcasts on store) — so
    downstream magnitudes/mel/MFCC flow float32, like real librosa."""
    hop = hop_length or n_fft // 4
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2))  # pad_mode="constant"
    if y.size < n_fft:
        y = np.pad(y, (0, n_fft - y.size))
    n = (y.size - n_fft) // hop + 1
    # Strided view instead of a fancy-index gather: the [n, n_fft] int64
    # index array alone was ~200 MB at 300 s / n_fft=2048.  Values are
    # bitwise identical — only the framing copy is avoided; the window
    # multiply materializes the same float64 frames.
    view = np.lib.stride_tricks.sliding_window_view(y, n_fft)[::hop][:n]
    win = _hann_periodic(n_fft)[None, :]
    # Blocked like librosa (MAX_MEM_BLOCK): the complex128 FFT result is
    # downcast on assignment per block instead of materializing the full
    # [n, n_fft] complex128 array (~200 MB at 300 s) and copying it again.
    out = np.empty((n, n_fft // 2 + 1), dtype=np.complex64)
    block = max(1, (1 << 18) // n_fft)
    for lo in range(0, n, block):
        hi = min(n, lo + block)
        out[lo:hi] = np.fft.rfft(view[lo:hi] * win, axis=-1)
    return out.T


# stft_mag memo: one metric evaluation recomputes the SAME (2048, 512)
# magnitude spectrogram of the same signal up to ~6 times (spectral MSE,
# LSD, MFCC mel, onset mel, piptrack, MR-STFT's third scale).  Keyed by a
# content digest (hashing 26 MB ≈ 10 ms vs ~400 ms per STFT); tiny FIFO
# so long batch runs can't accumulate spectrograms.
_stft_mag_cache: "dict" = {}
_stft_mag_lock = None


def stft_mag(y: np.ndarray, n_fft: int = 2048,
             hop_length: Optional[int] = None,
             center: bool = True) -> np.ndarray:
    import hashlib
    import threading

    global _stft_mag_lock
    if _stft_mag_lock is None:
        _stft_mag_lock = threading.Lock()
    arr = np.ascontiguousarray(y)
    key = (hashlib.sha1(arr.view(np.uint8).reshape(-1)).hexdigest(),
           arr.shape, str(arr.dtype), n_fft, hop_length, center)
    with _stft_mag_lock:
        hit = _stft_mag_cache.get(key)
    if hit is not None:
        return hit
    mag = np.abs(stft(arr, n_fft, hop_length, center))
    with _stft_mag_lock:
        if len(_stft_mag_cache) >= 8:
            _stft_mag_cache.pop(next(iter(_stft_mag_cache)))
        _stft_mag_cache[key] = mag
    return mag


def fft_frequencies(sr: float, n_fft: int) -> np.ndarray:
    return np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)


def mel_fb(sr: float, n_fft: int, n_mels: int = 128, fmin: float = 0.0,
           fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-scale, Slaney-normalized mel filterbank ``[n_mels, n_freqs]``
    (librosa.filters.mel defaults: ``htk=False, norm='slaney'``, and
    float32 output like librosa's ``dtype=np.float32`` default — keeps the
    mel matmul in float32 instead of promoting the spectrogram)."""
    fmax = fmax if fmax is not None else sr / 2.0
    key = (float(sr), int(n_fft), int(n_mels), float(fmin), float(fmax))
    hit = _mel_fb_cache.get(key)
    if hit is not None:
        return hit
    freqs = fft_frequencies(sr, n_fft)
    m_pts = np.linspace(hz_to_mel(fmin, "slaney"), hz_to_mel(fmax, "slaney"),
                        n_mels + 2)
    f_pts = mel_to_hz(m_pts, "slaney")
    fdiff = np.diff(f_pts)
    ramps = f_pts[:, None] - freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
    out = (fb * enorm[:, None]).astype(np.float32)
    if len(_mel_fb_cache) < 16:
        _mel_fb_cache[key] = out
    return out


_mel_fb_cache: "dict" = {}


def melspectrogram(y: np.ndarray, sr: float, n_fft: int = 2048,
                   hop_length: int = 512, n_mels: int = 128,
                   power: float = 2.0) -> np.ndarray:
    s = stft_mag(y, n_fft, hop_length) ** power
    return mel_fb(sr, n_fft, n_mels) @ s


def power_to_db(s: np.ndarray, ref: float = 1.0, amin: float = 1e-10,
                top_db: Optional[float] = 80.0) -> np.ndarray:
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def mfcc(y: np.ndarray, sr: float, n_mfcc: int = 20,
         n_mels: int = 128, n_fft: int = 2048,
         hop_length: int = 512) -> np.ndarray:
    """MFCCs ``[n_mfcc, frames]`` — librosa.feature.mfcc defaults
    (dB mel spectrogram → orthonormal DCT-II along the mel axis)."""
    logmel = power_to_db(melspectrogram(y, sr, n_fft, hop_length, n_mels))
    n = logmel.shape[0]
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n)[None, :]
    dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    return dct @ logmel


def _localmax(x: np.ndarray) -> np.ndarray:
    """librosa.util.localmax along axis 0: strictly greater than the previous
    element, greater-or-equal to the next (edge-padded)."""
    xp = np.pad(x, ((1, 1), (0, 0)), mode="edge")
    return (x > xp[:-2]) & (x >= xp[2:])


def piptrack(y: np.ndarray, sr: float, n_fft: int = 2048,
             hop_length: Optional[int] = None, fmin: float = 150.0,
             fmax: float = 4000.0,
             threshold: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """Pitch tracking on thresholded parabolically-interpolated STFT peaks
    (librosa.piptrack defaults).  Returns ``(pitches, mags)`` of shape
    ``[1 + n_fft//2, frames]`` — nonzero where a peak was found."""
    s = stft_mag(y, n_fft, hop_length)
    fmin = max(fmin, 0.0)
    fmax = min(fmax, sr / 2.0)
    freqs = fft_frequencies(sr, n_fft)

    avg = 0.5 * (s[2:] - s[:-2])
    shift_den = 2 * s[1:-1] - s[2:] - s[:-2]
    tiny = np.finfo(s.dtype).tiny
    shift = avg / (shift_den + (np.abs(shift_den) < tiny))
    avg = np.pad(avg, ((1, 1), (0, 0)))
    shift = np.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    freq_mask = ((fmin <= freqs) & (freqs < fmax))[:, None]
    ref_value = threshold * s.max(axis=0, keepdims=True)
    idx = np.nonzero(freq_mask & _localmax(s * (s > ref_value)))
    pitches = np.zeros_like(s)
    mags = np.zeros_like(s)
    pitches[idx] = (idx[0] + shift[idx]) * sr / n_fft
    mags[idx] = s[idx] + dskew[idx]
    return pitches, mags


def onset_strength(y: np.ndarray, sr: float,
                   hop_length: int = 512, n_fft: int = 2048,
                   n_mels: int = 128, lag: int = 1) -> np.ndarray:
    """Spectral-flux novelty curve (librosa.onset.onset_strength defaults):
    dB mel spectrogram, rectified lag-1 difference, mean over mel bands,
    left-padded by ``lag + n_fft // (2*hop)`` to compensate centering."""
    s = power_to_db(melspectrogram(y, sr, n_fft, hop_length, n_mels))
    env = np.maximum(0.0, s[:, lag:] - s[:, :-lag]).mean(axis=0)
    pad = lag + n_fft // (2 * hop_length)
    env = np.pad(env, (pad, 0))
    return env[:s.shape[1]]


def peak_pick(x: np.ndarray, pre_max: int, post_max: int, pre_avg: int,
              post_avg: int, delta: float, wait: int) -> np.ndarray:
    """librosa.util.peak_pick: candidate peaks equal the boundary-truncated
    moving max, exceed the truncated moving average by ``delta``, and are at
    least ``wait`` frames apart."""
    n = x.size
    mov_max = np.empty(n)
    mov_avg = np.empty(n)
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max)
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg)
        mov_max[i] = x[lo_m:hi_m].max() if hi_m > lo_m else x[i]
        mov_avg[i] = x[lo_a:hi_a].mean() if hi_a > lo_a else x[i]
    candidates = np.nonzero((x == mov_max) & (x >= mov_avg + delta))[0]
    peaks = []
    last = -np.inf
    for i in candidates:
        if i > last + wait:
            peaks.append(i)
            last = i
    return np.asarray(peaks, dtype=int)


def onset_detect(y: np.ndarray, sr: float, hop_length: int = 512,
                 units: str = "frames") -> np.ndarray:
    """librosa.onset.onset_detect defaults: normalized onset envelope,
    peak picking with the documented 30 ms / 100 ms window defaults."""
    env = onset_strength(y, sr, hop_length)
    if not env.any() or not np.all(np.isfinite(env)):
        onsets = np.array([], dtype=int)
    else:
        env = env - env.min()
        if env.max() > 0:
            env = env / env.max()
        onsets = peak_pick(
            env,
            pre_max=int(0.03 * sr // hop_length),
            post_max=int(0.00 * sr // hop_length + 1),
            pre_avg=int(0.10 * sr // hop_length),
            post_avg=int(0.10 * sr // hop_length + 1),
            delta=0.07,
            wait=int(0.03 * sr // hop_length))
    if units == "time":
        return onsets * hop_length / sr
    return onsets

"""Functional librosa shim (numpy/scipy-only) for running the reference
tool's neural path + evaluator on hosts without librosa.

Implements the call surface the reference uses (stft, piptrack,
onset.onset_detect, feature.*, power/amplitude_to_db, resample); load()
raises so the reference's loader ladder falls through to raw-PCM.
"""

import numpy as np


def load(*a, **k):
    raise RuntimeError("librosa.load unavailable (shim)")


def stft(y, n_fft=2048, hop_length=None, **_k):
    hop_length = hop_length or n_fft // 4
    y = np.asarray(y, dtype=np.float64)
    if y.size < n_fft:
        y = np.pad(y, (0, n_fft - y.size))
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n = (yp.size - n_fft) // hop_length + 1
    idx = (np.arange(n)[:, None] * hop_length) + np.arange(n_fft)[None, :]
    frames = yp[idx] * np.hanning(n_fft)[None, :]
    return np.fft.rfft(frames, axis=-1).T


def power_to_db(s, ref=1.0, amin=1e-10, top_db=80.0):
    ref_value = ref(s) if callable(ref) else ref
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def amplitude_to_db(s, **k):
    return power_to_db(np.abs(s) ** 2, **k)


def resample(y, orig_sr=22050, target_sr=22050, **_k):
    from math import gcd

    from scipy.signal import resample_poly

    if orig_sr == target_sr:
        return np.asarray(y)
    g = gcd(int(target_sr), int(orig_sr))
    return resample_poly(np.asarray(y, dtype=np.float64),
                         target_sr // g, orig_sr // g,
                         window=("kaiser", 5.0)).astype(np.float32)


def piptrack(y=None, sr=22050, n_fft=2048, hop_length=None, **_k):
    hop_length = hop_length or n_fft // 4
    s = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    pitches = np.zeros_like(s)
    mags = np.zeros_like(s)
    peak = np.argmax(s, axis=0)
    cols = np.arange(s.shape[1])
    pitches[peak, cols] = freqs[peak]
    mags[peak, cols] = s[peak, cols]
    return pitches, mags


class onset:  # namespace stand-in
    @staticmethod
    def onset_detect(y=None, sr=22050, hop_length=512, units="frames", **_k):
        s = np.abs(stft(y, n_fft=2048, hop_length=hop_length))
        logmel = np.log(s + 1e-10)
        flux = np.maximum(np.diff(logmel, axis=1), 0.0).mean(axis=0)
        if flux.size < 3:
            return np.array([], dtype=int)
        thresh = flux.mean() + flux.std()
        peaks, last = [], -4
        for i in range(1, flux.size - 1):
            if (flux[i] > thresh and flux[i] >= flux[i - 1]
                    and flux[i] >= flux[i + 1] and i - last >= 4):
                peaks.append(i)
                last = i
        frames = np.asarray(peaks, dtype=int)
        if units == "time":
            return frames * hop_length / sr
        return frames


class feature:  # namespace stand-in
    @staticmethod
    def melspectrogram(y=None, sr=22050, n_fft=2048, hop_length=512,
                       n_mels=128, **_k):
        s = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** 2
        # HTK-style triangular filterbank
        def hz_to_mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

        def mel_to_hz(m):
            return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

        n_freqs = n_fft // 2 + 1
        all_freqs = np.linspace(0, sr / 2, n_freqs)
        m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
        f_pts = mel_to_hz(m_pts)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts[None, :] - all_freqs[:, None]
        down = -slopes[:, :-2] / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        fb = np.maximum(0.0, np.minimum(down, up))
        return fb.T @ s

    @staticmethod
    def mfcc(y=None, sr=22050, n_mfcc=13, **_k):
        logmel = np.log(feature.melspectrogram(y=y, sr=sr, n_mels=64) + 1e-10)
        n = logmel.shape[0]
        k = np.arange(n_mfcc)[:, None]
        m = np.arange(n)[None, :]
        dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
        dct[0] /= np.sqrt(2.0)
        return dct @ logmel

    @staticmethod
    def spectral_centroid(y=None, sr=22050, n_fft=2048, hop_length=512, **_k):
        s = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
        freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)[:, None]
        return ((freqs * s).sum(axis=0) / (s.sum(axis=0) + 1e-10))[None, :]

    @staticmethod
    def spectral_rolloff(y=None, sr=22050, n_fft=2048, hop_length=512,
                         roll_percent=0.85, **_k):
        s = np.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
        cum = np.cumsum(s, axis=0)
        idx = (cum >= roll_percent * cum[-1][None, :]).argmax(axis=0)
        return np.fft.rfftfreq(n_fft, 1.0 / sr)[idx][None, :]

    @staticmethod
    def zero_crossing_rate(y, frame_length=2048, hop_length=512, **_k):
        n = max((len(y) - frame_length) // hop_length + 1, 0)
        out = np.empty((1, n))
        for i in range(n):
            seg = y[i * hop_length: i * hop_length + frame_length]
            out[0, i] = np.mean(np.abs(np.diff(np.signbit(seg))))
        return out


def __getattr__(name):
    if name == "display":
        from . import display

        return display

    class _Unavailable:
        def __init__(self, fname):
            self._name = fname

        def __call__(self, *a, **k):
            raise RuntimeError(f"librosa.{self._name} unavailable (shim)")

        def __getattr__(self, item):
            return _Unavailable(f"{self._name}.{item}")

    return _Unavailable(name)

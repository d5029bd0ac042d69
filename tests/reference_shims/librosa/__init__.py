"""Functional librosa shim (numpy/scipy-only) for running the reference
tool's neural path + evaluator on hosts without librosa.

Implements the call surface the reference uses (stft, piptrack,
onset.onset_detect, feature.*, power/amplitude_to_db, resample); load()
raises so the reference's loader ladder falls through to raw-PCM.

The DSP is served by nat_tpu.eval.librosa_compat — the SAME librosa-
faithful implementations the nat-tpu evaluator uses — so differential
runs of the reference evaluator produce metric *values* directly
comparable with nat-tpu's (tests/test_metric_value_parity.py).
"""

import sys
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[3]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from nat_tpu.eval import librosa_compat as _lc  # noqa: E402


def load(*a, **k):
    raise RuntimeError("librosa.load unavailable (shim)")


def stft(y, n_fft=2048, hop_length=None, **_k):
    return _lc.stft(np.asarray(y, dtype=np.float64), n_fft, hop_length)


def power_to_db(s, ref=1.0, amin=1e-10, top_db=80.0):
    ref_value = ref(s) if callable(ref) else ref
    return _lc.power_to_db(np.asarray(s), ref_value, amin, top_db)


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
    return _lc.piptrack(np.asarray(y, dtype=np.float64), sr, n_fft,
                        hop_length)


class onset:  # namespace stand-in
    @staticmethod
    def onset_detect(y=None, sr=22050, hop_length=512, units="frames", **_k):
        return _lc.onset_detect(np.asarray(y, dtype=np.float64), sr,
                                hop_length, units=units)


class feature:  # namespace stand-in
    @staticmethod
    def melspectrogram(y=None, sr=22050, n_fft=2048, hop_length=512,
                       n_mels=128, **_k):
        return _lc.melspectrogram(np.asarray(y, dtype=np.float64), sr,
                                  n_fft, hop_length, n_mels)

    @staticmethod
    def mfcc(y=None, sr=22050, n_mfcc=20, **_k):
        return _lc.mfcc(np.asarray(y, dtype=np.float64), sr, n_mfcc=n_mfcc)

    @staticmethod
    def spectral_centroid(y=None, sr=22050, n_fft=2048, hop_length=512, **_k):
        s = _lc.stft_mag(np.asarray(y, dtype=np.float64), n_fft, hop_length)
        freqs = _lc.fft_frequencies(sr, n_fft)[:, None]
        return ((freqs * s).sum(axis=0) / (s.sum(axis=0) + 1e-10))[None, :]

    @staticmethod
    def spectral_rolloff(y=None, sr=22050, n_fft=2048, hop_length=512,
                         roll_percent=0.85, **_k):
        s = _lc.stft_mag(np.asarray(y, dtype=np.float64), n_fft, hop_length)
        cum = np.cumsum(s, axis=0)
        idx = (cum >= roll_percent * cum[-1][None, :]).argmax(axis=0)
        return _lc.fft_frequencies(sr, n_fft)[idx][None, :]

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

"""Cross-validation of nat_tpu.eval.librosa_compat against REAL librosa.

librosa is not part of this environment (the evaluator is numpy-native by
design), so these tests auto-skip here — but any environment that does have
librosa installed asserts numerical parity of every primitive the metric
formulas use (reference neural_audio_tokenizer.py:3470-3732 call these via
librosa; nat-tpu serves them from librosa_compat).

Tolerances: stft/mel/mfcc agree to float tolerance; piptrack and
onset_detect agree exactly on peak sets for librosa >= 0.10 (the pad_mode
default changed from 'reflect' to 'constant' in 0.10 — see
librosa_compat's module docstring).
"""

import numpy as np
import pytest

librosa = pytest.importorskip("librosa")

from nat_tpu.eval import librosa_compat as lc  # noqa: E402

SR = 22050


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(3)
    t = np.arange(SR * 2) / SR
    f = 440 + 30 * np.sin(2 * np.pi * 3 * t)
    x = 0.4 * np.sin(2 * np.pi * np.cumsum(f) / SR)
    clicks = np.zeros_like(x)
    pos = 0
    while pos < x.size - 1:
        clicks[pos] = 1.0
        pos += int(SR * (0.2 + 0.1 * rng.random()))
    x = x + np.convolve(clicks, np.hanning(64), mode="same")
    return (x + 0.01 * rng.standard_normal(x.size)).astype(np.float64)


class TestPrimitiveParity:
    def test_stft(self, signal):
        ours = lc.stft(signal)
        ref = librosa.stft(signal)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.abs(ours), np.abs(ref),
                                   rtol=1e-5, atol=1e-8)

    def test_mel_fb(self):
        ours = lc.mel_fb(SR, 2048)
        ref = librosa.filters.mel(sr=SR, n_fft=2048)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)

    def test_melspectrogram(self, signal):
        ours = lc.melspectrogram(signal, SR)
        ref = librosa.feature.melspectrogram(y=signal, sr=SR)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)

    def test_mfcc(self, signal):
        ours = lc.mfcc(signal, SR)
        ref = librosa.feature.mfcc(y=signal, sr=SR)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_piptrack(self, signal):
        ours_p, ours_m = lc.piptrack(signal, SR)
        ref_p, ref_m = librosa.piptrack(y=signal, sr=SR)
        assert ours_p.shape == ref_p.shape
        # same peak sets, same interpolated frequencies
        np.testing.assert_allclose(ours_p, ref_p, rtol=1e-4, atol=1e-3)

    def test_onset_strength(self, signal):
        ours = lc.onset_strength(signal, SR)
        ref = librosa.onset.onset_strength(y=signal, sr=SR)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_onset_detect(self, signal):
        ours = lc.onset_detect(signal, SR)
        ref = librosa.onset.onset_detect(y=signal, sr=SR)
        np.testing.assert_array_equal(ours, ref)

    def test_power_to_db(self):
        s = np.abs(np.random.default_rng(0).standard_normal((16, 16))) ** 2
        np.testing.assert_allclose(lc.power_to_db(s),
                                   librosa.power_to_db(s),
                                   rtol=1e-6, atol=1e-8)

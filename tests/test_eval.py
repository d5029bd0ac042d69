"""Tests for native audio metrics, evaluator, visualization, and analysis."""

import json
from dataclasses import asdict

import numpy as np
import pytest

from nat_tpu.eval import audio_metrics as am
from nat_tpu.eval.metrics import (TokenizationEvaluator, mutual_information,
                                  shannon_entropy, token_diversity)

SR = 22050


def _tone(freq, dur=1.0, sr=SR, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _clicks(period_s, dur=2.0, sr=SR):
    x = np.zeros(int(sr * dur), dtype=np.float32)
    step = int(period_s * sr)
    x[::step] = 1.0
    return np.convolve(x, np.hanning(64).astype(np.float32), mode="same")


class TestInfoMetrics:
    def test_entropy_uniform(self):
        # nats (scipy.stats.entropy semantics, reference 3577-3584)
        tokens = np.arange(256)
        assert shannon_entropy(tokens) == pytest.approx(np.log(256))

    def test_entropy_constant(self):
        assert shannon_entropy(np.zeros(100, dtype=int)) == 0.0

    def test_mutual_information_identical(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 32, 2000)
        assert mutual_information(a, a) > mutual_information(
            a, rng.integers(0, 32, 2000)) + 1.0

    def test_diversity(self):
        assert token_diversity(np.array([1, 1, 2, 3])) == 0.75


class TestAudioMetrics:
    def test_identical_signals_zero_loss(self):
        x = _tone(440)
        assert am.mr_stft_loss(x, x) == pytest.approx(0.0, abs=1e-9)
        assert am.log_spectral_distance(x, x) == pytest.approx(0.0, abs=1e-9)
        assert am.spectral_l1(x, x, SR) == pytest.approx(0.0, abs=1e-9)

    def test_different_signals_nonzero_loss(self):
        assert am.mr_stft_loss(_tone(440), _tone(880)) > 0.1
        assert am.log_spectral_distance(_tone(440), _tone(880)) > 1.0

    def test_pitch_track_finds_tone(self):
        pitch = am.dominant_pitch_track(_tone(440), SR)
        voiced = pitch[pitch > 0]
        assert abs(np.median(voiced) - 440) < 6

    def test_pitch_accuracy_same_tone_high(self):
        # Tones with vibrato → correlated pitch tracks
        t = np.arange(SR) / SR
        f = 440 + 30 * np.sin(2 * np.pi * 3 * t)
        x = np.sin(2 * np.pi * np.cumsum(f) / SR).astype(np.float32)
        assert am.pitch_accuracy(x, x * 0.8, SR) > 0.9

    def test_pitch_accuracy_different_low(self):
        t = np.arange(SR) / SR
        f1 = 440 + 50 * np.sin(2 * np.pi * 2 * t)
        f2 = 600 + 50 * np.sin(2 * np.pi * 7 * t)
        x1 = np.sin(2 * np.pi * np.cumsum(f1) / SR).astype(np.float32)
        x2 = np.sin(2 * np.pi * np.cumsum(f2) / SR).astype(np.float32)
        assert am.pitch_accuracy(x1, x2, SR) < 0.9

    def test_onsets_detected(self):
        x = _clicks(0.25)
        onsets = am.detect_onsets(x, SR)
        # 2 s of clicks every 0.25 s → ~8 onsets
        assert 5 <= len(onsets) <= 11

    def test_rhythm_accuracy_same_high(self):
        x = _clicks(0.25)
        assert am.rhythm_accuracy(x, x, SR) > 0.9

    def test_timbre_similarity_bounds(self):
        x, y = _tone(440), _tone(880)
        s_same = am.timbral_similarity(x, x, SR)
        s_diff = am.timbral_similarity(x, y, SR)
        assert s_same == pytest.approx(1.0, abs=1e-6)
        assert 0.0 <= s_diff <= s_same

    def test_mfcc_shape(self):
        assert am.mfcc(_tone(440), SR).shape[0] == 13

    def test_spectral_centroid_tracks_frequency(self):
        c_low = am.spectral_centroid(_tone(220), SR).mean()
        c_high = am.spectral_centroid(_tone(3000), SR).mean()
        assert c_high > c_low


class TestEvaluator:
    def test_full_metric_set(self):
        rng = np.random.default_rng(0)
        result = {
            "semantic_codes": [rng.integers(0, 64, (1, 40)) for _ in range(4)],
            "acoustic_codes": [rng.integers(0, 64, (1, 40)) for _ in range(4)],
        }
        x = _tone(440)
        recon = x + 0.01 * rng.standard_normal(x.size).astype(np.float32)
        ev = TokenizationEvaluator(SR)
        m = ev.evaluate_tokenization(x, None, recon,
                                     precomputed_result=result)
        d = asdict(m)
        assert d["num_semantic_tokens"] == 160
        assert d["compression_ratio"] == pytest.approx(SR / 320, rel=0.01)
        assert d["mse_loss"] == pytest.approx(1e-4, rel=0.5)
        assert d["mr_stft_loss"] > 0
        assert d["pitch_accuracy"] >= 0
        assert 0 < d["semantic_entropy"] <= 6.0
        assert np.isfinite(list(d.values())).all()

    def test_no_reconstruction_zeroes_audio_metrics(self):
        result = {"semantic_codes": [np.zeros((1, 10), int)],
                  "acoustic_codes": [np.zeros((1, 10), int)]}
        m = TokenizationEvaluator(SR).evaluate_tokenization(
            _tone(440), None, None, precomputed_result=result)
        assert m.mse_loss == 0.0
        assert m.mr_stft_loss == 0.0


class TestArtifacts:
    @pytest.fixture()
    def result(self):
        rng = np.random.default_rng(0)
        return {
            "semantic_codes": [rng.integers(0, 64, (1, 40)) for _ in range(4)],
            "acoustic_codes": [rng.integers(0, 64, (1, 40)) for _ in range(4)],
            "semantic_features": rng.standard_normal((1, 32, 40)),
            "acoustic_features": rng.standard_normal((1, 32, 40)),
            "reconstructed": _tone(440),
        }

    def test_visualizations_written(self, result, tmp_path):
        from nat_tpu.eval.visualize import generate_visualizations

        files = generate_visualizations(_tone(440), result, str(tmp_path),
                                        "t", sample_rate=SR, sequential=True)
        names = {f.split("/")[-1] for f in files}
        # reference-parity file coverage: per-signal STFT/mel, per-layer
        # token histograms, waveform, feature heatmaps (reference ~9 PNGs)
        for expected in ("t_waveform.png", "t_stft_original.png",
                         "t_mel_original.png", "t_stft_reconstructed.png",
                         "t_mel_reconstructed.png", "t_tokens_S0.png",
                         "t_tokens_S3.png", "t_tokens_A0.png",
                         "t_tokens_A3.png", "t_token_histograms.png",
                         "t_semantic_features.png"):
            assert expected in names, expected
        for f in files:
            assert (tmp_path / f.split("/")[-1]).stat().st_size > 0

    def test_analysis_written(self, result, tmp_path):
        from nat_tpu.eval.analysis import save_detailed_analysis
        from nat_tpu.eval.metrics import TokenizationEvaluator

        m = TokenizationEvaluator(SR).evaluate_tokenization(
            _tone(440), None, None, precomputed_result=result)
        files = save_detailed_analysis(_tone(440), result, m, str(tmp_path),
                                       "t", sample_rate=SR)
        names = [f.split("/")[-1] for f in files]
        assert "t_spectral_features.json" in names
        assert "t_metrics.csv" in names
        assert "t_token_usage.json" in names
        assert sum(n.endswith(".npy") for n in names) >= 8
        usage = json.loads((tmp_path / "t_token_usage.json").read_text())
        assert "S0" in usage and "A3" in usage

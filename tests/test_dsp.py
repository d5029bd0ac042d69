"""Golden tests for the JAX DSP frontend vs scipy/torch references."""

import numpy as np
import pytest

import jax.numpy as jnp

from nat_tpu.dsp import mel as mel_mod
from nat_tpu.dsp import resample as rs
from nat_tpu.dsp import stft as stft_mod


def _sig(sr=22050, dur=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.7)
         + 0.05 * rng.standard_normal(t.shape))
    return x.astype(np.float32)


class TestStftVsTorch:
    def test_stft_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _sig()
        n_fft, hop = 1024, 256
        ours = np.asarray(stft_mod.stft_power(
            jnp.asarray(x), n_fft=n_fft, hop_length=hop, power=2.0))
        ref = torch.stft(
            torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
            window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
            return_complex=True)
        ref_pow = (ref.abs() ** 2).numpy()
        assert ours.shape == ref_pow.shape
        scale = np.max(ref_pow)
        np.testing.assert_allclose(ours / scale, ref_pow / scale, atol=2e-5)

    def test_normalized_stft_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = _sig()
        n_fft, hop = 2048, 512
        ours = np.asarray(stft_mod.stft_power(
            jnp.asarray(x), n_fft=n_fft, hop_length=hop, power=2.0,
            normalized=True))
        # torchaudio's normalized=True is "window" normalization (power
        # divided by sum(win^2)); torch.stft's normalized flag is a
        # different convention, so emulate torchaudio explicitly.
        win = torch.hann_window(n_fft)
        ref = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                         window=win, center=True, pad_mode="reflect",
                         return_complex=True)
        ref_pow = (ref.abs() ** 2).numpy() / float((win ** 2).sum())
        scale = max(np.max(ref_pow), 1e-12)
        np.testing.assert_allclose(ours / scale, ref_pow / scale, atol=2e-5)

    def test_matmul_dft_equals_fft(self):
        x = _sig(dur=0.2)
        a = np.asarray(stft_mod.stft_power(jnp.asarray(x), 1024, 256,
                                           use_matmul_dft=True))
        b = np.asarray(stft_mod.stft_power(jnp.asarray(x), 1024, 256,
                                           use_matmul_dft=False))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("n_fft,hop", [(1024, 320), (2048, 512),
                                           (1024, 768), (512, 200)])
    def test_block_dft_strided_hops(self, n_fft, hop):
        """The gcd-strided block-DFT path (incl. hops that do NOT divide
        n_fft — the spectral-fallback 1024/320 combo) matches rfft."""
        x = _sig(dur=0.21)
        a = np.asarray(stft_mod.stft_power(jnp.asarray(x), n_fft, hop,
                                           use_matmul_dft=True))
        b = np.asarray(stft_mod.stft_power(jnp.asarray(x), n_fft, hop,
                                           use_matmul_dft=False))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_frame_count_formula(self):
        x = jnp.zeros(22050)
        spec = stft_mod.stft_power(x, n_fft=2048, hop_length=512)
        assert spec.shape[-1] == 22050 // 512 + 1
        assert spec.shape[-2] == 2048 // 2 + 1


class TestMelFilterbank:
    def test_htk_mel_conversion_roundtrip(self):
        freqs = np.array([0.0, 440.0, 1000.0, 8000.0])
        back = mel_mod.mel_to_hz(mel_mod.hz_to_mel(freqs, "htk"), "htk")
        np.testing.assert_allclose(back, freqs, rtol=1e-10)

    def test_slaney_mel_conversion_roundtrip(self):
        freqs = np.array([10.0, 440.0, 1000.0, 8000.0])
        back = mel_mod.mel_to_hz(mel_mod.hz_to_mel(freqs, "slaney"), "slaney")
        np.testing.assert_allclose(back, freqs, rtol=1e-8)

    def test_fbank_shape_and_coverage(self):
        fb = mel_mod.melscale_fbanks(1025, 0.0, 11025.0, 128, 22050)
        assert fb.shape == (1025, 128)
        assert np.all(fb >= 0)
        # Middle filters must be non-empty triangles
        assert np.all(fb[:, 1:-1].sum(axis=0) > 0)

    def test_fbank_matches_known_htk_peak(self):
        # Peak of each triangle sits at its center mel frequency
        fb = mel_mod.melscale_fbanks(2049, 0.0, 11025.0, 64, 22050)
        freqs = np.linspace(0, 11025, 2049)
        m_pts = np.linspace(mel_mod.hz_to_mel(0.0), mel_mod.hz_to_mel(11025.0), 66)
        centers = mel_mod.mel_to_hz(m_pts[1:-1])
        peak_freqs = freqs[np.argmax(fb, axis=0)]
        assert np.max(np.abs(peak_freqs - centers)) < 11025 / 2048 * 1.5

    def test_mel_spectrogram_shape(self):
        x = jnp.asarray(_sig())
        m = stft_mod.mel_spectrogram(x, sample_rate=22050, n_fft=2048,
                                     hop_length=512, n_mels=128)
        assert m.shape == (128, len(_sig()) // 512 + 1)
        assert np.all(np.asarray(m) >= 0)


class TestResample:
    def test_jax_matches_scipy(self):
        from scipy.signal import resample_poly as scipy_rp

        x = _sig(dur=1.0)
        ours = np.asarray(rs.resample_jax(jnp.asarray(x[None, :]), 22050, 16000))[0]
        ref = scipy_rp(x.astype(np.float64), 320, 441, window=("kaiser", 5.0))
        n = min(len(ours), len(ref))
        # Ignore filter edge transients
        edge = 200
        np.testing.assert_allclose(ours[edge:n - edge], ref[edge:n - edge],
                                   atol=5e-4)

    def test_host_resample_length(self):
        x = _sig(dur=1.0)
        y = rs.resample_poly(x, 22050, 16000)
        assert abs(len(y) - 16000) <= 1

    def test_identity_when_same_rate(self):
        x = _sig(dur=0.1)
        assert rs.resample_poly(x, 22050, 22050) is not None
        y = np.asarray(rs.resample_jax(jnp.asarray(x[None, :]), 16000, 16000))
        np.testing.assert_array_equal(y[0], x)

    def test_sine_preserved(self):
        # A 440 Hz tone must survive 22050→16000 with same frequency
        sr1, sr2 = 22050, 16000
        t = np.arange(sr1) / sr1
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = np.asarray(rs.resample_jax(jnp.asarray(x[None, :]), sr1, sr2))[0]
        spec = np.abs(np.fft.rfft(y[1000:9000] * np.hanning(8000)))
        peak_hz = np.argmax(spec) * sr2 / 8000
        assert abs(peak_hz - 440) < 5

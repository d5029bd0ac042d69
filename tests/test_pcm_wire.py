"""int16 wire transport (dsp/pcm.py): lossless recovery of the PCM16 +
peak-normalize load chain, device-conversion exactness proof, and token
byte-identity between float32 and int16 transport."""

import numpy as np
import pytest

from nat_tpu.dsp import pcm
from nat_tpu.io.audio import peak_normalize


def _pcm16_chain(i16: np.ndarray) -> np.ndarray:
    """The load pipeline's exact float32 for a PCM16 source."""
    return peak_normalize(i16.astype(np.float32) / np.float32(32768.0))


def test_recover_roundtrip_exact():
    rng = np.random.default_rng(3)
    i16 = (rng.standard_normal(48000) * 9000).astype(np.int16)
    wave = _pcm16_chain(i16)
    rec = pcm.recover_pcm16(wave[None, :])
    assert rec is not None
    got, divisor = rec
    np.testing.assert_array_equal(got[0], i16)
    rebuilt = (got.astype(np.float32) / np.float32(32768.0)) / divisor
    assert np.array_equal(rebuilt.view(np.uint32), wave[None, :].view(np.uint32))


def test_recover_leading_silence_and_peak():
    rng = np.random.default_rng(4)
    i16 = np.concatenate([np.zeros(8192, np.int16),
                          (rng.standard_normal(20000) * 500).astype(np.int16),
                          np.array([-32768], np.int16)])
    rec = pcm.recover_pcm16(_pcm16_chain(i16)[None, :])
    assert rec is not None
    np.testing.assert_array_equal(rec[0][0], i16)


def test_recover_rejects_non_pcm_sources():
    rng = np.random.default_rng(5)
    assert pcm.recover_pcm16(
        rng.standard_normal((1, 4000)).astype(np.float32) * 0.3) is None
    # stereo mixdown: averaged channels are not /32768-grid values
    a = (rng.standard_normal(4000) * 9000).astype(np.int16)
    b = (rng.standard_normal(4000) * 9000).astype(np.int16)
    mix = peak_normalize(((a.astype(np.float32) + b.astype(np.float32)) / 2.0)
                         / np.float32(32768.0))
    assert pcm.recover_pcm16(mix[None, :]) is None


def test_device_conversion_exact_on_cpu():
    assert pcm.device_conversion_exact(np.float32(0.51234)) is True


def test_tokens_identical_with_wire_transport(monkeypatch):
    """Grouped multi-span tokenization must be byte-identical across
    float32 and int16 transport (CPU; the wire is forced on via env)."""
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    sr = 4000
    rng = np.random.default_rng(11)
    i16 = (rng.standard_normal(int(sr * 90)) * 11000).astype(np.int16)
    wave = _pcm16_chain(i16)

    def run(wire: str):
        monkeypatch.setenv("NAT_TPU_PCM16_WIRE", wire)
        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
        tok = NeuralAudioTokenizer(
            sample_rate=sr, codebook_size=64, semantic_dim=32,
            acoustic_dim=32, n_mels=16, enable_codebook_cache=False,
            use_pretrained_semantic=False, codebook_init_method="random",
            enable_reconstruction=False)
        return tok(wave[None, :])

    off, on = run("0"), run("1")
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in off["semantic_codes"]]),
        np.stack([np.asarray(c) for c in on["semantic_codes"]]))
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in off["acoustic_codes"]]),
        np.stack([np.asarray(c) for c in on["acoustic_codes"]]))
    assert off["losses"] == on["losses"]


def test_recover_unnormalized_pcm16():
    """--stream-stdin audio skips peak normalization: plain i16/32768
    recovers with divisor exactly 1.0."""
    rng = np.random.default_rng(6)
    i16 = (rng.standard_normal(30000) * 7000).astype(np.int16)
    wave = (i16.astype(np.float32) / np.float32(32768.0))
    rec = pcm.recover_pcm16(wave[None, :])
    assert rec is not None
    got, divisor = rec
    assert float(divisor) == 1.0
    np.testing.assert_array_equal(got[0], i16)

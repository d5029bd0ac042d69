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


def test_recover_silent_probe_prefix_regression():
    """Sizes in (64K, 128K) used to probe only a PREFIX (floor stride=1):
    a file starting with >64K samples of silence returned None even though
    it was PCM16-derived.  The ceil stride makes the probe span the array;
    the full-array reference fallback covers strided probes that still
    land only on silence."""
    rng = np.random.default_rng(6)
    i16 = np.concatenate([
        np.zeros(70000, np.int16),                          # > _PROBE zeros
        (rng.standard_normal(30000) * 800).astype(np.int16),
    ])
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


class TestLoaderSidecar:
    """The decoder-built int16 sidecar + exact-divisor normalize replace
    the full recovery scan on the product load path."""

    def _wav_bytes(self, i16: np.ndarray, sr: int = 8000) -> bytes:
        import struct
        pcm_bytes = i16.astype("<i2").tobytes()
        return struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm_bytes), b"WAVE",
            b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16, b"data",
            len(pcm_bytes)) + pcm_bytes

    def test_wav_sidecar_roundtrip(self):
        from nat_tpu.io.audio import decode_bytes_ex
        rng = np.random.default_rng(7)
        i16 = (rng.standard_normal(20000) * 9000).astype(np.int16)
        audio, sr, side = decode_bytes_ex(self._wav_bytes(i16))
        assert side is not None
        np.testing.assert_array_equal(side, i16)
        assert np.array_equal(
            (side.astype(np.float32) / np.float32(32768.0)).view(np.uint32),
            audio.view(np.uint32))

    def test_float_wav_has_no_sidecar(self):
        import struct
        from nat_tpu.io.audio import decode_bytes_ex
        rng = np.random.default_rng(8)
        f32 = (rng.standard_normal(4000) * 0.3).astype("<f4")
        payload = f32.tobytes()
        data = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload), b"WAVE",
            b"fmt ", 16, 3, 1, 8000, 32000, 4, 32, b"data",
            len(payload)) + payload
        _, _, side = decode_bytes_ex(data)
        assert side is None

    def test_stereo_wav_has_no_sidecar(self):
        import struct
        from nat_tpu.io.audio import decode_bytes_ex
        rng = np.random.default_rng(9)
        i16 = (rng.standard_normal(8000) * 9000).astype("<i2")
        payload = i16.tobytes()
        data = struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(payload), b"WAVE",
            b"fmt ", 16, 1, 2, 8000, 32000, 4, 16, b"data",
            len(payload)) + payload
        _, _, side = decode_bytes_ex(data)
        assert side is None

    def test_raw_fallback_sidecar(self):
        from nat_tpu.io.audio import decode_bytes_ex
        rng = np.random.default_rng(10)
        i16 = (rng.standard_normal(5000) * 9000).astype(np.int16)
        audio, _, side = decode_bytes_ex(i16.astype("<i2").tobytes())
        assert side is not None and side.size == audio.size

    def test_pipeline_hint_matches_recovery(self, tmp_path):
        """_load_audio_ex's hint must equal what recover_pcm16 would find,
        and verify_hint must accept it over the FULL array."""
        from nat_tpu.io.audio import write_wav
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
        rng = np.random.default_rng(12)
        i16 = (rng.standard_normal(30000) * 11000).astype(np.int16)
        path = str(tmp_path / "hint.wav")
        with open(path, "wb") as f:
            f.write(self._wav_bytes(i16))
        pipe = AudioTokenizationPipeline(enable_compat_fallback=True)
        audio, sr, hint = pipe._load_audio_ex(path)
        assert hint is not None
        got, divisor = hint
        np.testing.assert_array_equal(got, i16)
        assert pcm.verify_hint(audio[None, :], got[None, :], divisor)
        rec = pcm.recover_pcm16(audio[None, :])
        assert rec is not None
        np.testing.assert_array_equal(rec[0][0], got)
        assert float(rec[1]) == float(divisor)
        rebuilt = (got.astype(np.float32) / np.float32(32768.0)) / divisor
        assert np.array_equal(rebuilt.view(np.uint32), audio.view(np.uint32))

    def test_verify_hint_rejects_corruption(self):
        rng = np.random.default_rng(13)
        i16 = (rng.standard_normal(70000) * 9000).astype(np.int16)
        wave = _pcm16_chain(i16)
        rec = pcm.recover_pcm16(wave[None, :])
        assert rec is not None
        assert pcm.verify_hint(wave[None, :], rec[0], rec[1])
        assert not pcm.verify_hint(wave[None, :], rec[0],
                                   np.float32(rec[1] * (1 + 1e-3)))
        bad = rec[0].copy()
        bad[0, 5] += 1
        # corruption lands on the probe only if index 5 is sampled; use a
        # divisor-level corruption above for the guaranteed reject, and
        # accept either outcome here on the value flip
        pcm.verify_hint(wave[None, :], bad, rec[1])

    def test_wire_hint_tokens_identical(self, monkeypatch):
        """Hint-fed wire transport must produce byte-identical tokens to
        both scan-recovered wire and float32 transport."""
        from nat_tpu.models.tokenizer import NeuralAudioTokenizer

        sr = 4000
        rng = np.random.default_rng(14)
        i16 = (rng.standard_normal(int(sr * 60)) * 11000).astype(np.int16)
        wave = _pcm16_chain(i16)
        divisor = pcm.recover_pcm16(wave[None, :])[1]

        def run(wire: str, hint):
            monkeypatch.setenv("NAT_TPU_PCM16_WIRE", wire)
            monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
            tok = NeuralAudioTokenizer(
                sample_rate=sr, codebook_size=64, semantic_dim=32,
                acoustic_dim=32, n_mels=16, enable_codebook_cache=False,
                use_pretrained_semantic=False, codebook_init_method="random",
                enable_reconstruction=False)
            return tok(wave[None, :], pcm16_hint=hint)

        base = run("0", None)
        hinted = run("1", (i16, divisor))
        for key in ("semantic_codes", "acoustic_codes"):
            np.testing.assert_array_equal(
                np.stack([np.asarray(c) for c in base[key]]),
                np.stack([np.asarray(c) for c in hinted[key]]))
        assert base["losses"] == hinted["losses"]


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

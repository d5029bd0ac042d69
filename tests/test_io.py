"""Unit tests for native audio decoding and stdin handling."""

import struct

import numpy as np
import pytest

from nat_tpu.io import audio as audio_io
from nat_tpu.io.stdinio import (detect_audio_format, looks_like_text,
                                split_fs_chunks)


def _sine(sr=22050, dur=0.25, freq=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (np.sin(2 * np.pi * freq * t) * 0.5).astype(np.float32)


class TestWavRoundtrip:
    def test_pcm16_roundtrip(self):
        sig = _sine()
        data = audio_io.encode_wav_pcm16(sig, 22050)
        decoded, sr = audio_io.decode_wav(data)
        assert sr == 22050
        assert decoded.shape == sig.shape
        assert np.max(np.abs(decoded - sig)) < 2.0 / 32768

    def test_float32_wav(self):
        sig = _sine()
        pcm = sig.astype("<f4").tobytes()
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 3, 1,
            22050, 22050 * 4, 4, 32, b"data", len(pcm))
        decoded, sr = audio_io.decode_wav(header + pcm)
        assert np.allclose(decoded, sig, atol=1e-6)

    def test_24bit_wav(self):
        sig = _sine()
        ints = np.clip(sig * 8388607, -8388608, 8388607).astype(np.int32)
        raw = bytearray()
        for v in ints:
            raw += int(v & 0xFFFFFF).to_bytes(3, "little")
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(raw), b"WAVE", b"fmt ", 16, 1, 1,
            22050, 22050 * 3, 3, 24, b"data", len(raw))
        decoded, _ = audio_io.decode_wav(header + bytes(raw))
        assert np.max(np.abs(decoded - sig)) < 1e-3

    def test_stereo_mixdown(self):
        sig = _sine()
        stereo = np.stack([sig, -sig], axis=1).reshape(-1)
        pcm = (stereo * 32767).astype("<i2").tobytes()
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 2,
            22050, 22050 * 4, 4, 16, b"data", len(pcm))
        decoded, _ = audio_io.decode_wav(header + pcm)
        # L + (-L) mixes to ~silence
        assert np.max(np.abs(decoded)) < 1e-4

    def test_mulaw_silence_is_zero(self):
        # mu-law byte 0xFF encodes 0
        pcm = bytes([0xFF] * 100)
        header = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 7, 1,
            8000, 8000, 1, 8, b"data", len(pcm))
        decoded, sr = audio_io.decode_wav(header + pcm)
        assert sr == 8000
        assert np.max(np.abs(decoded)) < 1e-3

    def test_aiff_16bit_roundtrip(self):
        sig = _sine()
        pcm = (np.clip(sig, -1, 1) * 32767).astype(">i2").tobytes()
        # 80-bit extended float for 22050 Hz: exponent 16397, mantissa top
        sr = 22050
        import math

        m, e = math.frexp(sr)
        mantissa = int(m * (1 << 64))
        exp = e - 1 + 16383
        comm = struct.pack(">HIH", 1, len(sig), 16) + struct.pack(
            ">H", exp) + struct.pack(">II", (mantissa >> 32) & 0xFFFFFFFF,
                                     mantissa & 0xFFFFFFFF)
        ssnd = struct.pack(">II", 0, 0) + pcm
        body = (b"COMM" + struct.pack(">I", len(comm)) + comm
                + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
        aiff = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
        decoded, got_sr = audio_io.decode_aiff(aiff)
        assert got_sr == sr
        assert np.max(np.abs(decoded - sig)) < 2.0 / 32768
        # and via the generic decoder + magic sniffing
        decoded2, _ = audio_io.decode_bytes(aiff)
        np.testing.assert_array_equal(decoded2, decoded)
        assert detect_audio_format(aiff) == ".aiff"

    def test_raw_fallback(self):
        garbage = bytes(range(256)) * 8
        decoded, sr = audio_io.decode_bytes(garbage)
        assert sr == audio_io.RAW_FALLBACK_SR
        assert decoded.size == len(garbage) // 2

    def test_empty_file_raises(self, tmp_path):
        p = tmp_path / "empty.wav"
        p.write_bytes(b"")
        with pytest.raises(ValueError):
            audio_io.load_audio_file(str(p))


class TestPeakNormalize:
    def test_normalizes_to_unit_peak(self):
        x = np.array([0.1, -0.25, 0.2], dtype=np.float32)
        y = audio_io.peak_normalize(x)
        assert np.max(np.abs(y)) == pytest.approx(1.0)

    def test_silence_unchanged(self):
        x = np.zeros(16, dtype=np.float32)
        assert np.array_equal(audio_io.peak_normalize(x), x)

    def test_inplace_matches_copy_path_bitwise(self):
        """inplace=True must produce the SAME bits as the copying path
        (the int16 wire gates on `(i16/32768)/divisor` reproducing the
        normalized floats exactly) while writing into the caller's buffer."""
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(1024).astype(np.float32) * 0.3)
        expect, div_copy = audio_io.peak_normalize_ex(x.copy())
        buf = x.copy()
        got, div_inplace = audio_io.peak_normalize_ex(buf, inplace=True)
        assert got is buf  # divided into the caller's buffer
        assert div_inplace == div_copy
        np.testing.assert_array_equal(got, expect)

    def test_inplace_falls_back_on_readonly_input(self):
        x = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
        x.setflags(write=False)
        got, div = audio_io.peak_normalize_ex(x, inplace=True)
        assert got is not x and div is not None
        assert np.max(np.abs(got)) == pytest.approx(1.0)


class TestFormatDetection:
    def test_wav_magic(self):
        sig = audio_io.encode_wav_pcm16(_sine(), 22050)
        assert detect_audio_format(sig) == ".wav"

    def test_flac_magic(self):
        assert detect_audio_format(b"fLaC" + b"\x00" * 32) == ".flac"

    def test_mp3_id3(self):
        assert detect_audio_format(b"ID3\x04" + b"\x00" * 32) == ".mp3"

    def test_mp3_frame_sync(self):
        assert detect_audio_format(b"\xff\xfb\x90\x00" + b"\x00" * 32) == ".mp3"

    def test_ogg(self):
        assert detect_audio_format(b"OggS" + b"\x00" * 32) == ".ogg"

    def test_m4a(self):
        assert detect_audio_format(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 16) == ".m4a"

    def test_unknown_is_raw(self):
        assert detect_audio_format(b"\x01\x02\x03\x04" * 8) == ".raw"


class TestTextHeuristic:
    def test_paths_are_text(self):
        assert looks_like_text(b"/path/to/a.wav\n/path/to/b.wav\n")

    def test_binary_is_not_text(self):
        assert not looks_like_text(b"\x00\x01\x02RIFF binary")

    def test_empty_is_text(self):
        assert looks_like_text(b"")


class TestFsSplitting:
    def test_split_two_files(self):
        chunks = split_fs_chunks(b"AAAA\x1cBBBB")
        assert chunks == [b"AAAA", b"BBBB"]

    def test_drops_empty_chunks(self):
        chunks = split_fs_chunks(b"\x1cAAAA\x1c\x1cBBBB\x1c")
        assert chunks == [b"AAAA", b"BBBB"]

    def test_no_fs_single_chunk(self):
        assert split_fs_chunks(b"AAAA") == [b"AAAA"]

    def test_structure_aware_wav_split(self):
        """FS bytes inside PCM payloads must not split real containers."""
        sig = _sine()
        wav_a = audio_io.encode_wav_pcm16(sig, 22050)
        wav_b = audio_io.encode_wav_pcm16(-sig, 22050)
        assert b"\x1c" in wav_a  # the payload really does contain FS bytes
        chunks = split_fs_chunks(wav_a + b"\x1c" + wav_b)
        assert len(chunks) == 2
        assert chunks[0] == wav_a
        assert chunks[1] == wav_b

    def test_structure_aware_single_wav_with_fs_bytes(self):
        wav = audio_io.encode_wav_pcm16(_sine(), 22050)
        assert split_fs_chunks(wav) == [wav]

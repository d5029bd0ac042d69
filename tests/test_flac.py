"""FLAC codec tests: round-trips through every decoder path the encoder can
produce, CRC robustness, and the audio-loader integration."""

import numpy as np
import pytest

from nat_tpu.io import flac


def _sig(n=6000, sr=22050):
    t = np.arange(n) / sr
    return (0.6 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1200 * t + 0.4)).astype(np.float32)


class TestRoundtrip:
    @pytest.mark.parametrize("mode", ["verbatim", "fixed2"])
    @pytest.mark.parametrize("bps", [16, 24])
    def test_roundtrip(self, mode, bps):
        sig = _sig()
        data = flac.encode_flac(sig, 22050, bps=bps, block_size=2048,
                                mode=mode)
        decoded, sr = flac.decode_flac(data)
        assert sr == 22050
        assert decoded.shape == sig.shape
        tol = 2.0 / (1 << (bps - 1))
        assert np.max(np.abs(decoded - sig)) < tol

    def test_multi_frame_utf8_ordinals(self):
        # >128 frames exercises the 2-byte UTF-8 ordinal form
        sig = _sig(n=200 * 192)
        data = flac.encode_flac(sig, 22050, block_size=192, mode="fixed2")
        decoded, _ = flac.decode_flac(data)
        assert decoded.shape == sig.shape
        assert np.max(np.abs(decoded - sig)) < 1e-3

    def test_partial_final_block(self):
        sig = _sig(n=5000)  # 4096 + 904
        data = flac.encode_flac(sig, 22050, block_size=4096, mode="verbatim")
        decoded, _ = flac.decode_flac(data)
        assert decoded.shape == sig.shape

    def test_constant_subframe_path(self):
        """All-zero residual stays tiny and decodes exactly."""
        sig = np.zeros(3000, dtype=np.float32)
        data = flac.encode_flac(sig, 16000, mode="fixed2")
        decoded, sr = flac.decode_flac(data)
        assert sr == 16000
        np.testing.assert_array_equal(decoded, sig)


class TestRobustness:
    def test_header_crc_detected(self):
        data = bytearray(flac.encode_flac(_sig(1000), 22050, mode="verbatim"))
        # Corrupt a frame-header byte (after fLaC + 4-byte block header
        # + 34-byte STREAMINFO = offset 42; +2 lands inside the header)
        data[44] ^= 0xFF
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(data))

    def test_not_flac_rejected(self):
        with pytest.raises(ValueError):
            flac.decode_flac(b"RIFFxxxxWAVE")

    def test_payload_crc_detected(self):
        data = bytearray(flac.encode_flac(_sig(1000), 22050, mode="verbatim"))
        data[-40] ^= 0x01  # flip a bit inside the last frame payload
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(data))


class TestLoaderIntegration:
    def test_decode_bytes_routes_flac(self):
        from nat_tpu.io.audio import decode_bytes

        sig = _sig()
        data = flac.encode_flac(sig, 22050, mode="fixed2")
        decoded, sr = decode_bytes(data)
        assert sr == 22050
        assert np.max(np.abs(decoded - sig)) < 1e-3

    def test_cli_tokenizes_flac(self, cli, tmp_path):
        sig = _sig(n=22050)
        path = tmp_path / "tone.flac"
        path.write_bytes(flac.encode_flac(sig, 22050, mode="fixed2"))
        rc, stdout, stderr = cli(["--compat-fallback", str(path)])
        assert rc == 0, stderr
        assert '"event":"header"' in stdout
        import json

        header = json.loads(stdout.splitlines()[0])
        assert header["sr"] == 22050
        assert header["duration_seconds"] == pytest.approx(1.0, abs=0.01)

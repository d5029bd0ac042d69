"""Native C++ host-runtime parity tests (skipped if no toolchain)."""

import numpy as np
import pytest

from nat_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestDenseSerializer:
    def test_byte_parity_with_python(self, lib):
        """C++ and Python dense streams must be byte-identical."""
        import os

        from nat_tpu.stream.protocol import StreamingProtocol

        rng = np.random.default_rng(0)
        sem = rng.integers(0, 4096, (4, 500))
        acc = rng.integers(0, 4096, (4, 500))
        tokens = {
            "semantic_codes": [sem[i][None] for i in range(4)],
            "acoustic_codes": [acc[i][None] for i in range(4)],
        }

        proto = StreamingProtocol(sample_rate=22050, hop_length=512)
        with_native = proto.create_ndjson_stream(tokens)

        os.environ["NAT_TPU_NO_NATIVE"] = "1"
        native._lib = None
        native._load_attempted = False
        try:
            proto2 = StreamingProtocol(sample_rate=22050, hop_length=512)
            without_native = proto2.create_ndjson_stream(tokens)
        finally:
            del os.environ["NAT_TPU_NO_NATIVE"]
            native._load_attempted = False

        # Strip the end event (stats include wall-clock-free but identical
        # content here) and compare frame lines exactly.
        frames_a = [l for l in with_native.splitlines() if '"frame"' in l]
        frames_b = [l for l in without_native.splitlines() if '"frame"' in l]
        assert frames_a == frames_b
        assert len(frames_a) == 500

    def test_various_rates(self, lib):
        for sr, hop in ((22050, 512), (16000, 320), (48000, 512), (44100, 441)):
            a = native.serialize_dense_frames(
                np.zeros((4, 7), np.int32), np.zeros((4, 7), np.int32),
                hop / sr * 1000.0)
            assert a.count('"event":"frame"') == 7


class TestPcmDecode:
    def test_pcm16_matches_numpy(self, lib):
        rng = np.random.default_rng(1)
        pcm = rng.integers(-32768, 32767, 1000, dtype=np.int16)
        data = pcm.tobytes()
        out = native.pcm_to_float_mono(data, 16, 1)
        np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0,
                                   atol=1e-7)

    def test_pcm16_stereo_mixdown(self, lib):
        pcm = np.array([1000, -1000, 500, 500], dtype=np.int16)  # 2 frames
        out = native.pcm_to_float_mono(pcm.tobytes(), 16, 2)
        np.testing.assert_allclose(out, [0.0, 500.0 / 32768.0], atol=1e-6)

    def test_pcm24_sign(self, lib):
        raw = bytes([0x00, 0x00, 0x80,   # -8388608 → -1.0
                     0xFF, 0xFF, 0x7F])  # +8388607 → ~+1.0
        out = native.pcm_to_float_mono(raw, 24, 1)
        np.testing.assert_allclose(out, [-1.0, 8388607 / 8388608], atol=1e-6)


class TestChangeMask:
    def test_matches_numpy(self, lib):
        rng = np.random.default_rng(2)
        codes = np.repeat(rng.integers(0, 4, (4, 50)), 4, axis=1)
        mask = native.change_mask(codes)
        expect = np.zeros(codes.shape[1], dtype=np.uint32)
        expect[0] = (1 << 4) - 1
        for l in range(4):
            changed = np.nonzero(codes[l, 1:] != codes[l, :-1])[0] + 1
            for fi in changed:
                expect[fi] |= 1 << l
        np.testing.assert_array_equal(mask, expect)

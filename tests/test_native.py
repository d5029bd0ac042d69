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


class TestRleSerializer:
    """Native RLE serializer parity: the C++ walk (serialize_rle_frames +
    numeric carry) must be byte-identical to the Python streamer on any
    token dynamics, layer config, frame rate, and chunking."""

    @staticmethod
    def _gen(rng, style, n_layers, t, codebook=4096):
        if style == "random":
            return rng.integers(0, codebook, (n_layers, t))
        if style == "constant":
            return np.full((n_layers, t), int(rng.integers(0, codebook)))
        # piecewise-constant runs at a random change rate
        rate = rng.uniform(0.02, 0.8)
        steps = rng.random((n_layers, t)) < rate
        return np.cumsum(steps, axis=1) % codebook

    @staticmethod
    def _with_python_fallback(fn):
        import os

        os.environ["NAT_TPU_NO_NATIVE"] = "1"
        native._lib = None
        native._load_attempted = False
        try:
            return fn()
        finally:
            del os.environ["NAT_TPU_NO_NATIVE"]
            native._load_attempted = False

    def _run_both(self, sem, acc, chunks, **proto_kwargs):
        from nat_tpu.stream.protocol import StreamingProtocol

        def batch():
            proto = StreamingProtocol(rle_mode=True, **proto_kwargs)
            tokens = {
                "semantic_codes": [sem[i][None] for i in range(sem.shape[0])],
                "acoustic_codes": [acc[i][None] for i in range(acc.shape[0])],
            }
            return proto.create_ndjson_stream(tokens)

        def incremental():
            proto = StreamingProtocol(rle_mode=True, **proto_kwargs)
            lines = [proto.begin_stream()]
            prev = 0
            for s in list(chunks) + [sem.shape[1]]:
                lines.extend(proto.feed_frames(sem[:, prev:s],
                                               acc[:, prev:s]))
                prev = s
            lines.extend(proto.end_stream())
            return "\n".join(lines)

        nat_b, nat_i = batch(), incremental()
        py_b = self._with_python_fallback(batch)
        py_i = self._with_python_fallback(incremental)
        return nat_b, nat_i, py_b, py_i

    @pytest.mark.parametrize("seed", range(16))
    def test_byte_parity_fuzz(self, lib, seed):
        rng = np.random.default_rng(seed)
        ls = int(rng.integers(1, 9))
        la = int(rng.integers(1, 9))
        t = int(rng.integers(1, 400))
        style = ["random", "constant", "runs", "runs"][seed % 4]
        sem = self._gen(rng, style, ls, t)
        acc = self._gen(rng, style, la, t)
        # random per-layer encoding overrides (mixed rle/dense both groups)
        enc = {}
        for i in range(ls):
            enc[f"S{i}"] = rng.choice(["rle", "dense"])
        for i in range(la):
            enc[f"A{i}"] = rng.choice(["rle", "dense"])
        sr, hop = [(22050, 512), (16000, 320), (44100, 441),
                   (48000, 512)][seed % 4]
        n_chunks = int(rng.integers(0, min(8, t)))
        chunks = sorted(rng.choice(np.arange(1, t), size=n_chunks,
                                   replace=False).tolist()) if n_chunks else []
        kw = dict(sample_rate=sr, hop_length=hop,
                  num_semantic_layers=ls, num_acoustic_layers=la,
                  per_layer_encoding=enc,
                  keyframe_interval_seconds=float(rng.uniform(0.2, 6.0)))
        nat_b, nat_i, py_b, py_i = self._run_both(sem, acc, chunks, **kw)
        assert nat_b == py_b   # batch path parity
        assert nat_i == py_i   # incremental path parity

    def test_single_frame_chunks(self, lib):
        """Chunk size 1 maximizes carry traffic (every buffered event and
        keyframe crosses the native boundary)."""
        rng = np.random.default_rng(99)
        sem = self._gen(rng, "runs", 4, 120)
        acc = self._gen(rng, "runs", 4, 120)
        kw = dict(sample_rate=22050, hop_length=512,
                  num_semantic_layers=4, num_acoustic_layers=4,
                  keyframe_interval_seconds=1.0)
        nat_b, nat_i, py_b, py_i = self._run_both(
            sem, acc, list(range(1, 120)), **kw)
        assert nat_i == py_i
        assert nat_b == py_b

    def test_repr_formatter_matches_python(self, lib):
        """nat_format_repr must reproduce CPython float repr exactly —
        'dur' values accumulate into full-precision doubles and the wire
        contract is byte-level."""
        import ctypes
        import random
        import struct

        lib.nat_format_repr.restype = ctypes.c_int
        lib.nat_format_repr.argtypes = [ctypes.c_double, ctypes.c_char_p,
                                        ctypes.c_int]
        buf = ctypes.create_string_buffer(64)
        rng = random.Random(7)
        for i in range(20000):
            mode = i % 5
            if mode == 0:
                v = rng.uniform(0, 1e7)
            elif mode == 1:
                fd = rng.uniform(1, 100)
                v = round(fd, 3) + rng.randint(1, 10000) * fd
            elif mode == 2:
                v = rng.randint(0, 10**8) / 1000.0
            elif mode == 3:
                v = rng.uniform(0, 1) * 10**rng.randint(-12, 20)
            else:
                v = struct.unpack(
                    "<d", struct.pack("<Q", rng.getrandbits(63)))[0]
                if v != v or abs(v) == float("inf"):
                    continue
            n = lib.nat_format_repr(v, buf, 64)
            assert n > 0
            assert buf.value.decode() == repr(v), v.hex()

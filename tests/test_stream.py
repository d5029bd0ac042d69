"""Unit tests for the NDJSON streaming layer: schema, RLE round-trips,
keyframes, duration aggregation, and the reader."""

import json

import numpy as np
import pytest

from nat_tpu.stream.ndjson import NDJSONStreamer
from nat_tpu.stream.protocol import StreamingProtocol
from nat_tpu.stream.reader import parse_ndjson_stream


def make_tokens(sem: np.ndarray, acc: np.ndarray):
    """Wrap [L, T] matrices as the tokenizer-result dict shape."""
    return {
        "semantic_codes": [sem[i][None, :] for i in range(sem.shape[0])],
        "acoustic_codes": [acc[i][None, :] for i in range(acc.shape[0])],
    }


def run_protocol(sem, acc, **kwargs):
    proto = StreamingProtocol(sample_rate=22050, hop_length=512,
                              codebook_size=1024, **kwargs)
    return proto.create_ndjson_stream(make_tokens(sem, acc),
                                      duration_seconds=1.0)


class TestDenseStream:
    def test_dense_stream_shape(self):
        rng = np.random.default_rng(0)
        sem = rng.integers(0, 1024, (4, 10))
        acc = rng.integers(0, 1024, (4, 10))
        text = run_protocol(sem, acc)
        lines = text.splitlines()
        assert json.loads(lines[0])["event"] == "header"
        assert json.loads(lines[-1])["event"] == "end"
        frames = [json.loads(l) for l in lines if '"frame"' in l]
        assert len(frames) == 10
        for fi, f in enumerate(frames):
            assert f["fi"] == fi
            assert f["S"] == sem[:, fi].tolist()
            assert f["A"] == acc[:, fi].tolist()

    def test_dense_roundtrip(self):
        rng = np.random.default_rng(1)
        sem = rng.integers(0, 1024, (4, 50))
        acc = rng.integers(0, 1024, (4, 50))
        parsed = parse_ndjson_stream(run_protocol(sem, acc))
        np.testing.assert_array_equal(parsed.semantic, sem)
        np.testing.assert_array_equal(parsed.acoustic, acc)

    def test_layer_truncation_to_min(self):
        # Reference truncates to the min layer length across all code layers
        sem = np.arange(40).reshape(4, 10)
        acc = np.arange(32).reshape(4, 8)
        text = run_protocol(sem, acc)
        frames = [l for l in text.splitlines() if '"frame"' in l]
        assert len(frames) == 8


class TestRleStream:
    def test_rle_roundtrip_constant(self):
        """Constant tokens collapse to one event; reader re-expands."""
        sem = np.full((4, 100), 7)
        acc = np.full((4, 100), 3)
        text = run_protocol(sem, acc, rle_mode=True)
        parsed = parse_ndjson_stream(text)
        assert parsed.num_frames == 100
        np.testing.assert_array_equal(parsed.semantic, sem)
        np.testing.assert_array_equal(parsed.acoustic, acc)
        token_events = [l for l in text.splitlines() if '"tokens"' in l]
        # Far fewer events than frames
        assert len(token_events) < 10

    def test_rle_roundtrip_random(self):
        rng = np.random.default_rng(2)
        # Slow-moving semantic, fast acoustic — the target workload
        sem = np.repeat(rng.integers(0, 8, (4, 10)), 10, axis=1)
        acc = rng.integers(0, 1024, (4, 100))
        parsed = parse_ndjson_stream(run_protocol(sem, acc, rle_mode=True))
        np.testing.assert_array_equal(parsed.semantic, sem)
        np.testing.assert_array_equal(parsed.acoustic, acc)

    def test_rle_duration_totals(self):
        """Total covered duration matches reference aggregation semantics.

        The reference extends a buffered run *through* the frame where the
        change occurs, and the new event also starts with one frame of
        duration at that frame — so each of the 7 change frames is counted
        twice (reference neural_audio_tokenizer.py:2775-2795).  We reproduce
        that wire behavior exactly.
        """
        sem = np.repeat(np.arange(8).reshape(1, 8), 4, axis=0)
        sem = np.repeat(sem, 25, axis=1)  # 200 frames, change every 25
        acc = np.full((4, 200), 5)
        text = run_protocol(sem, acc, rle_mode=True)
        frame_dur = 512 / 22050 * 1000.0
        covered = 0.0
        for line in text.splitlines():
            obj = json.loads(line)
            if obj["event"] in ("frame", "tokens"):
                covered += obj["dur"]
        num_changes = 7
        assert covered == pytest.approx((200 + num_changes) * frame_dur, rel=1e-6)

    def test_keyframes_emitted(self):
        sem = np.full((4, 1000), 1)  # ~23 s of frames at 43 fps
        acc = np.full((4, 1000), 2)
        text = run_protocol(sem, acc, rle_mode=True,
                            keyframe_interval_seconds=5.0)
        keyframes = [json.loads(l) for l in text.splitlines()
                     if '"is_keyframe":true' in l]
        # 1000 frames * 23.22 ms = 23.2 s → keyframes at ~5/10/15/20 s
        assert len(keyframes) == 4
        for kf in keyframes:
            assert kf["event"] == "frame"
            assert kf["S"] == [1, 1, 1, 1]

    def test_per_layer_encoding_override(self):
        sem = np.full((4, 20), 1)
        acc = np.full((4, 20), 2)
        proto = StreamingProtocol(
            sample_rate=22050, hop_length=512, rle_mode=True,
            per_layer_encoding={"S0": "dense", "A0": "rle"})
        text = proto.create_ndjson_stream(make_tokens(sem, acc))
        header = json.loads(text.splitlines()[0])
        enc = {l["name"]: l["encoding"] for l in header["layers"]}
        assert enc["S0"] == "dense"
        assert enc["A0"] == "rle"


class TestNDJSONStreamer:
    def test_layer_count_defense(self):
        s = NDJSONStreamer(22050, 512, num_semantic_layers=4,
                           num_acoustic_layers=4)
        line = s.create_frame(0, 0.0, [1, 2], [1, 2, 3, 4, 5, 6])
        obj = json.loads(line)
        assert obj["S"] == [1, 2, 0, 0]  # padded
        assert obj["A"] == [1, 2, 3, 4]  # truncated

    def test_compat_header_warning(self):
        s = NDJSONStreamer(22050, 512, compat_mode=True)
        header = json.loads(s.create_header())
        assert header["compat_mode"] is True
        assert "warning" in header

    def test_no_legend(self):
        s = NDJSONStreamer(22050, 512)
        assert "legend" not in json.loads(s.create_header(include_legend=False))

    def test_fast_dumps_byte_identical_to_json(self):
        from nat_tpu.stream.ndjson import _dumps

        cases = [
            {"event": "frame", "t": 0, "ts": 0.0, "dur": 23.22},
            {"i": -7, "j": 0, "k": 2**63, "f": 0.1, "g": -1e-9,
             "h": 1e300, "w": 2.0, "z": -0.0},
            {"b1": True, "b0": False, "s": "hello", "e": ""},
            {"L": [1, 2, 3], "E": [], "N": [-1, 0, 10**12]},
            # fallback cases: must still match json.dumps exactly
            {"inf": float("inf")},
            {"ninf": float("-inf")},
            {"nan": float("nan")},
            {"mixed": [1, 2.5]},
            {"lbool": [True, 1]},
            {"quote": 'say "hi"', "back": "a\\b", "ctl": "a\nb",
             "tab": "a\tb"},
            {"uni": "café"},
            {"none": None},
            {"nest": {"a": 1}},
            {"stats": {"frames": 10, "sha": "ab" * 32}},
        ]
        for obj in cases:
            assert _dumps(obj) == json.dumps(obj, separators=(",", ":")), obj

    def test_layer_encoding_cache_respects_overrides(self):
        s = NDJSONStreamer(22050, 512, num_semantic_layers=2,
                           num_acoustic_layers=2, rle_mode=True,
                           per_layer_encoding={"S0": "dense", "A1": "rle"})
        assert s.layer_encoding("S0") == "dense" and not s.uses_rle("S0")
        assert s.layer_encoding("S1") == "rle" and s.uses_rle("S1")
        assert s.layer_encoding("A0") == "dense" and not s.uses_rle("A0")
        assert s.layer_encoding("A1") == "rle" and s.uses_rle("A1")

    def test_end_marker_flushes_buffer(self):
        s = NDJSONStreamer(22050, 512, rle_mode=True)
        out = s.create_frame(0, 0.0, [1, 1, 1, 1], [2, 2, 2, 2],
                             changed_layers=["S0"])
        assert out is None  # buffered
        end = s.create_end_marker({"x": 1})
        lines = end.splitlines()
        assert json.loads(lines[0])["event"] == "tokens"
        assert json.loads(lines[1])["event"] == "end"
        assert json.loads(lines[1])["stats"] == {"x": 1}

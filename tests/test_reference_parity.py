"""Differential tests against the actual reference implementation.

The reference tool (/root/reference/neural_audio_tokenizer.py) runs here
with functional shims for its hard torchaudio/librosa/soundfile imports
(tests/reference_shims): its REAL neural path executes — mel conv encoder,
spectral-fallback semantic encoder (no wav2vec2 checkpoint offline), random
codebooks, full evaluator.  We run both CLIs on the same fixture and compare
stream *structure*: header schema, frame counts and timing, field sets.
Token values differ (random codebooks on both sides) and are not compared.

Note: the reference's compat mode is unreachable in practice — its module-
level imports crash on any missing dependency before `_check_dependencies`
can route to the CompatTokenizer, and with importable (shimmed) deps it
always builds the neural tokenizer.  Our `--compat-fallback` intentionally
*forces* compat (the documented intent); the neural-vs-neural comparison
below is therefore the meaningful parity check.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/neural_audio_tokenizer.py")
REPO = Path(__file__).resolve().parent.parent
SHIMS = Path(__file__).resolve().parent / "reference_shims"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REFERENCE.exists(),
                                 reason="reference tool not available")]

NEURAL_ARGS = ["--codebook-init", "random", "--codebook-size", "512"]


def run_reference(args, input_file, timeout=420):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = f"{SHIMS}:{env.get('PYTHONPATH', '')}"
    env["USE_TF"] = "0"          # keep transformers off tensorflow
    env["USE_FLAX"] = "0"
    env["HF_HUB_OFFLINE"] = "1"
    env["TRANSFORMERS_OFFLINE"] = "1"
    result = subprocess.run(
        [sys.executable, str(REFERENCE), *args, str(input_file)],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(REFERENCE.parent), env=env, stdin=subprocess.DEVNULL)
    return result.returncode, result.stdout, result.stderr


def run_ours(args, input_file, timeout=420):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-m", "nat_tpu", "--device", "cpu",
         "--no-codebook-cache", *args, str(input_file)],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(REPO), env=env, stdin=subprocess.DEVNULL)
    return result.returncode, result.stdout, result.stderr


@pytest.fixture(scope="module")
def streams(simple_wav):
    rc_ref, out_ref, err_ref = run_reference(NEURAL_ARGS, simple_wav)
    rc_our, out_our, err_our = run_ours(NEURAL_ARGS, simple_wav)
    assert rc_ref == 0, f"reference failed: {err_ref[-800:]}"
    assert rc_our == 0, f"ours failed: {err_our[-800:]}"
    ref = [json.loads(l) for l in out_ref.strip().splitlines()]
    our = [json.loads(l) for l in out_our.strip().splitlines()]
    return ref, our


class TestNeuralStreamStructure:
    def test_event_sequence_shape(self, streams):
        ref, our = streams
        assert ref[0]["event"] == our[0]["event"] == "header"
        assert ref[-1]["event"] == our[-1]["event"] == "end"

    def test_neural_frame_count_parity(self, streams):
        """Both stacks must land on the same min(T_sem, T_acc) frame count
        (the reference's acoustic /16 downsampling quirk)."""
        ref, our = streams
        ref_frames = [e for e in ref if e["event"] == "frame"]
        our_frames = [e for e in our if e["event"] == "frame"]
        assert len(our_frames) == len(ref_frames)

    def test_header_field_parity(self, streams):
        ref, our = streams
        h_ref, h_our = ref[0], our[0]
        # duration_seconds differs on .wav inputs: the reference's raw-PCM
        # fallback counts the 44-byte RIFF header as samples (1.001 s vs our
        # correct 1.0 s); exact duration parity is asserted on raw input in
        # test_audio_sha256_identical_on_raw_pcm.
        for key in ("format_version", "schema", "sr", "hop", "hop_ms",
                    "frames_per_second", "encoding_mode", "time_units",
                    "start_ts", "legend"):
            assert h_our.get(key) == h_ref.get(key), key
        assert [l["name"] for l in h_our["layers"]] == \
            [l["name"] for l in h_ref["layers"]]
        assert [l["type"] for l in h_our["layers"]] == \
            [l["type"] for l in h_ref["layers"]]
        assert [l["vocab"] for l in h_our["layers"]] == \
            [l["vocab"] for l in h_ref["layers"]]

    def test_frame_field_and_timing_parity(self, streams):
        ref, our = streams
        ref_frames = [e for e in ref if e["event"] == "frame"]
        our_frames = [e for e in our if e["event"] == "frame"]
        for fr, fo in zip(ref_frames, our_frames):
            assert set(fo.keys()) == set(fr.keys())
            assert fo["fi"] == fr["fi"]
            assert fo["ts"] == fr["ts"]
            assert fo["dur"] == fr["dur"]
            assert len(fo["S"]) == len(fr["S"])
            assert len(fo["A"]) == len(fr["A"])

    def test_end_stats_key_overlap(self, streams):
        """Our end.stats must carry at least the reference's metric keys."""
        ref, our = streams
        ref_stats = set((ref[-1].get("stats") or {}).keys())
        our_stats = set((our[-1].get("stats") or {}).keys())
        missing = ref_stats - our_stats
        assert not missing, f"stats keys missing vs reference: {missing}"

    def test_audio_sha256_identical_on_raw_pcm(self, simple_wav, tmp_path):
        """Bit-identical load+normalize: on a headerless raw-PCM file both
        tools read the same bytes (the reference cannot parse WAV containers
        without audio libs — its raw fallback would include the 44-byte
        header as samples, an environmental artifact, so .wav inputs can't
        hash-match here)."""
        raw = tmp_path / "tone.raw"
        raw.write_bytes(simple_wav.read_bytes()[44:])  # strip RIFF header
        rc_ref, out_ref, err = run_reference(NEURAL_ARGS, raw)
        rc_our, out_our, _ = run_ours(NEURAL_ARGS, raw)
        assert rc_ref == 0, err[-500:]
        assert rc_our == 0
        h_ref = json.loads(out_ref.splitlines()[0])
        h_our = json.loads(out_our.splitlines()[0])
        assert h_our["audio_sha256"] == h_ref["audio_sha256"]
        assert h_our["duration_seconds"] == h_ref["duration_seconds"]


class TestCliContract:
    def test_help_flags_superset(self):
        """Every flag the reference advertises must exist in our CLI."""
        import re

        ref_out = subprocess.run(
            [sys.executable, str(REFERENCE), "--help"],
            capture_output=True, text=True, timeout=120,
            cwd=str(REFERENCE.parent),
            env={**os.environ, "PYTHONPATH": str(SHIMS), "USE_TF": "0",
                 "USE_FLAX": "0"}).stdout
        our_out = subprocess.run(
            [sys.executable, "-m", "nat_tpu", "--help"],
            capture_output=True, text=True, timeout=120,
            cwd=str(REPO)).stdout
        ref_flags = set(re.findall(r"--[a-z][a-z0-9-]+", ref_out))
        our_flags = set(re.findall(r"--[a-z][a-z0-9-]+", our_out))
        missing = ref_flags - our_flags
        assert not missing, f"CLI flags missing vs reference: {missing}"

"""Source-level lints (reference test_demo.py:97-128 counterpart) and
long-file chunking behavior."""

import re
from pathlib import Path

import numpy as np
import pytest


REPO = Path(__file__).resolve().parent.parent


def test_no_hardcoded_version_strings():
    """Version strings must come from nat_tpu.version, not literals."""
    from nat_tpu.version import VERSION

    offenders = []
    for path in (REPO / "nat_tpu").rglob("*.py"):
        if path.name == "version.py":
            continue
        text = path.read_text()
        # A literal like "v0.1.0" outside version.py is a smell; f-strings
        # referencing VERSION are fine (they don't contain the literal).
        for match in re.finditer(re.escape(VERSION), text):
            offenders.append(f"{path.name}:{match.start()}")
    assert not offenders, f"hardcoded VERSION literals: {offenders}"


def test_format_version_single_source():
    from nat_tpu.version import FORMAT_VERSION

    hardcoded = []
    for path in (REPO / "nat_tpu").rglob("*.py"):
        if path.name in ("version.py",):
            continue
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            if f'"{FORMAT_VERSION}"' in line and "format_version" in line.lower():
                hardcoded.append(f"{path.name}:{lineno}")
    assert not hardcoded, f"hardcoded format_version literals: {hardcoded}"


@pytest.mark.slow
class TestLongFileChunking:
    def test_long_file_tokenizes_in_chunks(self):
        """A >30 s input runs through the fixed-chunk path; frame counts
        accumulate across chunks with no crash and monotone timing."""
        from nat_tpu.models.tokenizer import NeuralAudioTokenizer
        from nat_tpu.runtime.bucketing import (FIRST_SPAN_S,
                                               MAX_SINGLE_CHUNK_S,
                                               chunk_spans)

        sr = 22050
        dur = 70.0
        spans = chunk_spans(int(sr * dur), sr, overlap=sr)
        assert len(spans) == 4
        # First-frame ramp: the first span fills the FIRST_SPAN_S bucket
        # exactly once its right-hand overlap margin is added.
        assert spans[0][1] == int(FIRST_SPAN_S * sr) - sr
        # Interior spans reserve 2×overlap of margin below the max bucket
        assert spans[1][1] == int(MAX_SINGLE_CHUNK_S * sr) - 2 * sr
        assert sum(l for _, l in spans) == int(sr * dur)
        # Opt-out restores uniform chunks
        uniform = chunk_spans(int(sr * dur), sr, overlap=sr, ramp=False)
        assert len(uniform) == 3
        assert uniform[0][1] == int(MAX_SINGLE_CHUNK_S * sr) - 2 * sr

        tok = NeuralAudioTokenizer(
            codebook_size=64, enable_codebook_cache=False,
            use_pretrained_semantic=False, codebook_init_method="random",
            enable_reconstruction=False)
        t = np.arange(int(sr * dur)) / sr
        x = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)
        out = tok(x[None, :])
        # Overlap-discard keeps exactly the frames whose centers fall in
        # each chunk's span: total ≈ duration × effective frame rate.
        per_sec = tok._target_frames(int(sr * 30)) / 30.0
        assert abs(out["num_frames"] - dur * per_sec) <= len(spans) + 1
        for codes in out["semantic_codes"]:
            assert codes.shape == (1, out["num_frames"])

    def test_chunk_boundary_continuity(self):
        """On a stationary tone, the slow semantic layers must carry the
        same token across a chunk boundary (overlap margins give boundary
        frames real context instead of zero padding)."""
        from nat_tpu.models.tokenizer import NeuralAudioTokenizer

        sr = 22050
        tok = NeuralAudioTokenizer(
            codebook_size=64, enable_codebook_cache=False,
            use_pretrained_semantic=False, codebook_init_method="random",
            enable_reconstruction=False)
        from nat_tpu.runtime.bucketing import chunk_spans

        t = np.arange(int(sr * 40)) / sr   # crosses the chunk boundary
        x = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)
        out = tok(x[None, :])
        s0 = out["semantic_codes"][0][0]
        spans = chunk_spans(int(sr * 40), sr, overlap=sr)
        per_sec = out["num_frames"] / 40.0
        boundary = int(round((spans[0][1] / sr) * per_sec))
        # Interior tokens of a stationary tone: the dominant value should
        # persist across the boundary region.
        window = s0[max(boundary - 2, 0): boundary + 2]
        assert len(set(window.tolist())) <= 2

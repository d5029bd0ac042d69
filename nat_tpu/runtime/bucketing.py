"""Static-shape bucketing policy.

XLA compiles one program per input shape; audio lengths vary per file.  We
pad every waveform up to a small set of bucket lengths so recompilation is
bounded (SURVEY.md §7.3 "dynamic shapes vs XLA"): powers of two seconds up
to ``max_single_chunk_s``, beyond which files are processed in fixed-size
chunks (the long-context path, §5.7 — exact for finite receptive fields up
to boundary frames).
"""

from __future__ import annotations

from typing import List, Tuple

BUCKET_SECONDS: Tuple[float, ...] = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0)
MAX_SINGLE_CHUNK_S = 30.0


def bucket_length(num_samples: int, sample_rate: int) -> int:
    """Smallest bucket (in samples) that fits ``num_samples``."""
    for seconds in BUCKET_SECONDS:
        b = int(round(seconds * sample_rate))
        if num_samples <= b:
            return b
    return int(round(MAX_SINGLE_CHUNK_S * sample_rate))


def chunk_spans(num_samples: int, sample_rate: int,
                overlap: int = 0) -> List[Tuple[int, int]]:
    """Split a long signal into (start, length) spans.

    ``overlap`` reserves margin on both sides of every span so that spans
    extended by the overlap (for boundary-exact encoding) still fit the
    largest bucket.  The final span is bucket-padded by the caller.
    """
    max_len = int(round(MAX_SINGLE_CHUNK_S * sample_rate))
    if num_samples <= max_len:
        return [(0, num_samples)]
    core_len = max(max_len - 2 * overlap, max_len // 2)
    spans = []
    start = 0
    while start < num_samples:
        length = min(core_len, num_samples - start)
        spans.append((start, length))
        start += length
    return spans

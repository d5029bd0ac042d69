"""Static-shape bucketing policy.

XLA compiles one program per input shape; audio lengths vary per file.  We
pad every waveform up to a small set of bucket lengths so recompilation is
bounded (SURVEY.md §7.3 "dynamic shapes vs XLA"): powers of two seconds up
to ``max_single_chunk_s``, beyond which files are processed in fixed-size
chunks (the long-context path, §5.7 — exact for finite receptive fields up
to boundary frames).

First-frame ramp: on multi-span signals the FIRST span is small (fills the
``FIRST_SPAN_S`` bucket exactly), so time-to-first-token is one small
forward instead of a full 30 s-bucket forward — a serving-latency policy
the uniform-chunk reference has no counterpart for.  Geometry is
prefix-stable (span k's extent never depends on the total length), which
is what lets the live-stdin path emit spans before EOF with byte-identical
output to the buffered path.  ``NAT_TPU_STREAM_RAMP=0`` restores uniform
chunks.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

BUCKET_SECONDS: Tuple[float, ...] = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0)
MAX_SINGLE_CHUNK_S = 30.0
FIRST_SPAN_S = 4.0   # bucket the ramp's first span fills exactly


def bucket_length(num_samples: int, sample_rate: int) -> int:
    """Smallest bucket (in samples) that fits ``num_samples``."""
    for seconds in BUCKET_SECONDS:
        b = int(round(seconds * sample_rate))
        if num_samples <= b:
            return b
    return int(round(MAX_SINGLE_CHUNK_S * sample_rate))


def ramp_enabled() -> bool:
    return os.environ.get("NAT_TPU_STREAM_RAMP", "1") != "0"


def first_core_len(sample_rate: int, overlap: int) -> int:
    """Core samples of the ramp's first span: extended by the right-hand
    overlap margin (the first span has no left margin) it fills the
    ``FIRST_SPAN_S`` bucket exactly — zero padding waste."""
    return int(round(FIRST_SPAN_S * sample_rate)) - overlap


def chunk_spans(num_samples: int, sample_rate: int, overlap: int = 0,
                ramp: Optional[bool] = None) -> List[Tuple[int, int]]:
    """Split a long signal into (start, length) spans.

    ``overlap`` reserves margin on both sides of every span so that spans
    extended by the overlap (for boundary-exact encoding) still fit the
    largest bucket.  The final span is bucket-padded by the caller.
    ``ramp=None`` reads ``NAT_TPU_STREAM_RAMP`` (default on): multi-span
    signals lead with one small first span for first-token latency.
    """
    max_len = int(round(MAX_SINGLE_CHUNK_S * sample_rate))
    if num_samples <= max_len:
        return [(0, num_samples)]
    if ramp is None:
        ramp = ramp_enabled()
    core_len = max(max_len - 2 * overlap, max_len // 2)
    spans = []
    start = 0
    if ramp and overlap > 0:
        l0 = first_core_len(sample_rate, overlap)
        if 0 < l0 < core_len:
            spans.append((0, l0))
            start = l0
    while start < num_samples:
        length = min(core_len, num_samples - start)
        spans.append((start, length))
        start += length
    return spans

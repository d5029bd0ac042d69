"""`lam_audio_tokens` NDJSON stream parsing (consumer side).

The reference ships only a producer; a reader makes the format round-trip
testable and lets downstream tools (and `decode_tokens`) consume streams.
Reconstructs the dense per-frame token matrix from dense frames, RLE
`tokens` events (carrying only changed layers + dense-mode layers), and
keyframes, honoring duration aggregation.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class TokenStream:
    """Parsed stream: header metadata + dense [L, T] token matrices."""

    header: Dict
    semantic: np.ndarray  # [num_semantic_layers, T]
    acoustic: np.ndarray  # [num_acoustic_layers, T]
    end_stats: Optional[Dict] = None
    events: List[Dict] = field(default_factory=list)

    @property
    def num_frames(self) -> int:
        return int(self.semantic.shape[1]) if self.semantic.size else 0


def parse_ndjson_stream(text: str) -> TokenStream:
    """Parse one complete NDJSON stream into dense token matrices."""
    return parse_events([json.loads(line) for line in text.splitlines()
                         if line.strip()])


def parse_events(events: List[Dict]) -> TokenStream:
    """Build a :class:`TokenStream` from already-parsed event dicts (one
    complete stream).  Consumers holding parsed events (TokenClient's
    socket reader) skip the serialize-and-reparse round trip."""
    header: Optional[Dict] = None
    end_stats: Optional[Dict] = None
    for obj in events:
        if obj.get("event") == "header":
            header = obj
        elif obj.get("event") == "end":
            end_stats = obj.get("stats")
    if header is None:
        raise ValueError("Stream has no header event")

    layers = header.get("layers", [])
    sem_names = [l["name"] for l in layers if l["type"] == "semantic"]
    acc_names = [l["name"] for l in layers if l["type"] == "acoustic"]
    frame_dur = header.get("hop_ms", 1000.0 / header.get("frames_per_second", 43.066))

    # Determine total frame count from the last event's coverage.
    max_frame = -1
    for obj in events:
        ev = obj.get("event")
        if ev in ("frame", "tokens"):
            fi = int(obj["fi"])
            # `dur` may cover several frames under RLE aggregation.
            span = max(int(round(obj.get("dur", frame_dur) / frame_dur)), 1)
            max_frame = max(max_frame, fi + span - 1)
    # RLE streams drop trailing/inter-keyframe no-change frames from the
    # wire entirely (reference behavior, neural_audio_tokenizer.py:
    # 2829-2836: "extend buffered event duration IF EXISTS").  Their token
    # values are recoverable by forward-fill (a frame is only dropped when
    # every layer is unchanged), and the true frame count is recoverable
    # from the end.stats token totals both producers emit.
    if end_stats:
        for key, names in (("semantic_tokens", sem_names),
                           ("acoustic_tokens", acc_names)):
            total = end_stats.get(key)
            if total and names:
                max_frame = max(max_frame, int(total) // len(names) - 1)
    num_frames = max_frame + 1
    if num_frames <= 0:
        return TokenStream(header, np.zeros((len(sem_names), 0), dtype=np.int64),
                           np.zeros((len(acc_names), 0), dtype=np.int64),
                           end_stats, events)

    sem = np.zeros((len(sem_names), num_frames), dtype=np.int64)
    acc = np.zeros((len(acc_names), num_frames), dtype=np.int64)
    sem_idx = {n: i for i, n in enumerate(sem_names)}
    acc_idx = {n: i for i, n in enumerate(acc_names)}
    dense_sem = [n for n in sem_names
                 if next(l for l in layers if l["name"] == n)["encoding"] == "dense"]
    dense_acc = [n for n in acc_names
                 if next(l for l in layers if l["name"] == n)["encoding"] == "dense"]

    # Forward-fill model: later events override from their frame onward.
    for obj in events:
        ev = obj.get("event")
        fi = int(obj["fi"]) if ev in ("frame", "tokens") else 0
        if ev == "frame":
            for i, tok in enumerate(obj.get("S", [])):
                sem[i, fi:] = tok
            for i, tok in enumerate(obj.get("A", [])):
                acc[i, fi:] = tok
        elif ev == "tokens":
            for key, val in obj.items():
                if key in sem_idx:
                    sem[sem_idx[key], fi:] = val
                elif key in acc_idx:
                    acc[acc_idx[key], fi:] = val
            for name, val in zip(dense_sem, obj.get("S_dense", [])):
                sem[sem_idx[name], fi:] = val
            for name, val in zip(dense_acc, obj.get("A_dense", [])):
                acc[acc_idx[name], fi:] = val

    return TokenStream(header, sem, acc, end_stats, events)

"""`lam_audio_tokens` NDJSON stream emission.

Wire-format parity with the reference streamer (neural_audio_tokenizer.py:
2614-2853; normative spec man/lam_audio_tokens.5): header/frame/tokens/end
events, compact separators, RLE duration aggregation with buffered-event
flushing, keyframes, per-layer encoding overrides, and the compat-mode
warning.  The implementation is new: token streams arrive as numpy arrays
and the per-frame loop is driven by vectorized change detection in
:mod:`nat_tpu.stream.protocol` rather than per-frame Python list compares.
"""

from __future__ import annotations

import json
import math
from typing import Dict, List, Optional

from ..version import FORMAT_VERSION, SCHEMA_NAME, VERSION


def _dumps_json(obj: dict) -> str:
    return json.dumps(obj, separators=(",", ":"))


def _dumps(obj: dict) -> str:
    """Serialize one event dict, byte-identical to ``json.dumps`` with
    compact separators.

    Frame/tokens events are flat dicts of int/float/bool/list-of-int — the
    per-frame ``json.dumps`` dict walk is a top host cost on RLE streams
    (~40% of serialization time), so those are assembled directly;
    anything else (header/end with nested metadata/stats, aux payloads,
    non-finite floats) falls back to the real encoder.  CPython's json
    emits finite floats via ``float.__repr__`` and ints via ``str``, so
    the fast path's output is identical by construction
    (tests/test_stream.py asserts canonical formatting)."""
    parts = []
    for k, v in obj.items():
        t = type(v)
        if t is int:
            s = str(v)
        elif t is float:
            if not math.isfinite(v):          # json spells these Infinity/NaN
                return _dumps_json(obj)
            s = repr(v)
        elif t is bool:
            s = "true" if v else "false"
        elif t is list:
            if any(type(i) is not int for i in v):
                return _dumps_json(obj)
            s = f"[{','.join(map(str, v))}]"
        elif t is str:
            # json escapes only ", \, control chars, and (ensure_ascii)
            # non-ASCII; plain ASCII printables pass through verbatim.
            if ('"' in v or "\\" in v or not v.isascii()
                    or not v.isprintable()):
                return _dumps_json(obj)
            s = f'"{v}"'
        else:                                  # dicts nest; None, ...
            return _dumps_json(obj)
        parts.append(f'"{k}":{s}')
    return f"{{{','.join(parts)}}}"


class NDJSONStreamer:
    """Builds individual NDJSON event lines for one token stream."""

    def __init__(
        self,
        sample_rate: int,
        hop_length: int,
        model_id: str = f"tims-ears-{VERSION}.epoch",
        codebook_size: int = 1024,
        num_semantic_layers: int = 4,
        num_acoustic_layers: int = 4,
        rle_mode: bool = False,
        per_layer_encoding: Optional[Dict[str, str]] = None,
        keyframe_interval_seconds: float = 5.0,
        audio_sha256: Optional[str] = None,
        compat_mode: bool = False,
    ) -> None:
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self.hop_ms = (hop_length / sample_rate) * 1000.0
        self.frames_per_second = sample_rate / hop_length
        self.frame_duration_ms = 1000.0 / self.frames_per_second
        self.model_id = model_id
        self.codebook_size = codebook_size
        self.num_semantic_layers = num_semantic_layers
        self.num_acoustic_layers = num_acoustic_layers
        self.rle_mode = rle_mode
        self.per_layer_encoding = dict(per_layer_encoding or {})
        self.keyframe_interval_seconds = keyframe_interval_seconds
        self.audio_sha256 = audio_sha256
        self.compat_mode = compat_mode

        # RLE aggregation state
        self.buffered_event: Optional[dict] = None
        self.last_frame_index = -1
        # frame_duration_ms is fixed per stream; "dur" starts from this
        # rounded constant on every event (floats are immutable, so the
        # shared value is safe even though buffered runs += onto "dur").
        self._dur_rounded = round(self.frame_duration_ms, 3)

        # Precomputed per-layer encoding tables: layer_encoding/uses_rle
        # are called per layer per frame on the RLE hot path (~320k calls
        # for a 10-minute stream); resolve them once.
        self._rle_set = frozenset(
            name for name in
            [f"S{i}" for i in range(num_semantic_layers)]
            + [f"A{i}" for i in range(num_acoustic_layers)]
            if self._layer_encoding_uncached(name) == "rle")
        self._dense_s_idx = [i for i in range(num_semantic_layers)
                             if f"S{i}" not in self._rle_set]
        self._dense_a_idx = [i for i in range(num_acoustic_layers)
                             if f"A{i}" not in self._rle_set]

    # -- layer encodings ----------------------------------------------------
    def _layer_encoding_uncached(self, layer_name: str) -> str:
        default = "rle" if (self.rle_mode and layer_name.startswith("S")) else "dense"
        return self.per_layer_encoding.get(layer_name, default)

    def layer_encoding(self, layer_name: str) -> str:
        if layer_name in self._rle_set:
            return "rle"
        return self._layer_encoding_uncached(layer_name)

    def uses_rle(self, layer_name: str) -> bool:
        return (layer_name in self._rle_set
                or self._layer_encoding_uncached(layer_name) == "rle")

    # -- events --------------------------------------------------------------
    def create_header(
        self,
        duration_seconds: Optional[float] = None,
        metadata: Optional[dict] = None,
        include_legend: bool = True,
    ) -> str:
        layers = []
        for i in range(self.num_semantic_layers):
            name = f"S{i}"
            layers.append({
                "name": name,
                "type": "semantic",
                "vocab": self.codebook_size,
                "encoding": self.per_layer_encoding.get(
                    name, "rle" if self.rle_mode else "dense"),
            })
        for i in range(self.num_acoustic_layers):
            name = f"A{i}"
            layers.append({
                "name": name,
                "type": "acoustic",
                "vocab": self.codebook_size,
                "encoding": self.per_layer_encoding.get(name, "dense"),
            })

        header: dict = {
            "event": "header",
            "format_version": FORMAT_VERSION,
            "schema": SCHEMA_NAME,
            "model_id": self.model_id,
            "codebook_id": f"{self.model_id}-cb-{self.codebook_size}",
            "sr": self.sample_rate,
            "hop": self.hop_length,
            "hop_ms": round(self.hop_ms, 3),
            "frames_per_second": round(self.frames_per_second, 3),
            "encoding_mode": "rle" if self.rle_mode else "dense",
            "time_units": "ms",
            "start_ts": 0.0,
            "layers": layers,
        }
        if self.compat_mode:
            header["compat_mode"] = True
            header["warning"] = (
                "Tokens generated in compatibility mode - not from trained quantizers"
            )
        if include_legend:
            header["legend"] = (
                "S* encodes slower, scene/gesture level; A* encodes "
                "timbre/texture/transient detail; S0 < S1 < S2 < S3 in timescale"
            )
        if duration_seconds is not None:
            header["duration_seconds"] = round(duration_seconds, 3)
        if self.audio_sha256:
            header["audio_sha256"] = self.audio_sha256
        if metadata:
            header["metadata"] = metadata
        return _dumps(header)

    def _flush_buffered(self) -> Optional[str]:
        if self.buffered_event is None:
            return None
        line = _dumps(self.buffered_event)
        self.buffered_event = None
        return line

    def _normalize(self, tokens: List[int], expected: int) -> List[int]:
        tokens = [int(t) for t in tokens[:expected]]
        if len(tokens) < expected:
            tokens += [0] * (expected - len(tokens))
        return tokens

    def create_frame(
        self,
        frame_index: int,
        time_ms: float,
        semantic_tokens: List[int],
        acoustic_tokens: List[int],
        changed_layers: Optional[List[str]] = None,
        is_keyframe: bool = False,
        aux_data: Optional[dict] = None,
    ) -> Optional[str]:
        """Produce the next stream line(s) for one frame, or None when the
        frame was absorbed into a buffered RLE run."""
        sem = self._normalize(semantic_tokens, self.num_semantic_layers)
        acc = self._normalize(acoustic_tokens, self.num_acoustic_layers)

        if is_keyframe or not self.rle_mode:
            flushed = self._flush_buffered()
            event: dict = {
                "event": "frame",
                "fi": frame_index,
                "ts": round(time_ms, 3),
                "dur": self._dur_rounded,
                "S": sem,
                "A": acc,
            }
            if is_keyframe:
                event["is_keyframe"] = True
            if aux_data:
                event["aux"] = aux_data
            line = _dumps(event)
            return f"{flushed}\n{line}" if flushed else line

        if not changed_layers:
            # Nothing changed: extend the buffered run's duration.
            if self.buffered_event is not None:
                elapsed = frame_index - self.last_frame_index
                self.buffered_event["dur"] += elapsed * self.frame_duration_ms
                self.last_frame_index = frame_index
            return None

        flushed = None
        if self.buffered_event is not None:
            elapsed = frame_index - self.last_frame_index
            self.buffered_event["dur"] += elapsed * self.frame_duration_ms
            flushed = self._flush_buffered()

        event = {
            "event": "tokens",
            "fi": frame_index,
            "ts": round(time_ms, 3),
            "dur": self._dur_rounded,
        }
        rle_set = self._rle_set
        for name in changed_layers:
            if name not in rle_set:
                continue
            idx = int(name[1:])
            if name[0] == "S":
                if idx < len(sem):
                    event[name] = sem[idx]
            elif idx < len(acc):
                event[name] = acc[idx]
        dense_s = [sem[i] for i in self._dense_s_idx if i < len(sem)]
        dense_a = [acc[i] for i in self._dense_a_idx if i < len(acc)]
        if dense_s:
            event["S_dense"] = dense_s
        if dense_a:
            event["A_dense"] = dense_a
        if aux_data:
            event["aux"] = aux_data

        self.buffered_event = event
        self.last_frame_index = frame_index
        return flushed

    def create_end_marker(self, stats: Optional[dict] = None) -> str:
        lines = []
        flushed = self._flush_buffered()
        if flushed:
            lines.append(flushed)
        end: dict = {"event": "end"}
        if stats:
            end["stats"] = stats
        lines.append(_dumps(end))
        return "\n".join(lines)

    def reset(self) -> None:
        self.buffered_event = None
        self.last_frame_index = -1

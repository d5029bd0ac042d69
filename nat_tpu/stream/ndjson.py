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
from typing import Dict, List, Optional

from ..version import FORMAT_VERSION, SCHEMA_NAME, VERSION


def _dumps(obj: dict) -> str:
    return json.dumps(obj, separators=(",", ":"))


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

    # -- layer encodings ----------------------------------------------------
    def layer_encoding(self, layer_name: str) -> str:
        default = "rle" if (self.rle_mode and layer_name.startswith("S")) else "dense"
        return self.per_layer_encoding.get(layer_name, default)

    def uses_rle(self, layer_name: str) -> bool:
        return self.layer_encoding(layer_name) == "rle"

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
                "dur": round(self.frame_duration_ms, 3),
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
            "dur": round(self.frame_duration_ms, 3),
        }
        for name in changed_layers:
            idx = int(name[1:])
            if name.startswith("S") and idx < len(sem) and self.uses_rle(name):
                event[name] = sem[idx]
            elif name.startswith("A") and idx < len(acc) and self.uses_rle(name):
                event[name] = acc[idx]
        dense_s = [t for i, t in enumerate(sem) if not self.uses_rle(f"S{i}")]
        dense_a = [t for i, t in enumerate(acc) if not self.uses_rle(f"A{i}")]
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

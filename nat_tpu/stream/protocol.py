"""Streaming protocol: RLE change detection, keyframes, stream assembly.

Counterpart of reference `StreamingProtocol` (neural_audio_tokenizer.py:
4330-4520) with the per-frame Python compare loop replaced by vectorized
numpy change detection: layer-change masks and keyframe schedules for the
whole stream are computed in one shot, and the Python loop only touches
frames that actually emit events (a large win on RLE streams where most
frames are silent).
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import numpy as np

from ..version import VERSION
from .ndjson import NDJSONStreamer


class StreamingProtocol:
    """Wraps an :class:`NDJSONStreamer` with change detection + keyframes."""

    def __init__(
        self,
        chunk_size: int = 8192,
        overlap: int = 1024,
        sample_rate: int = 22050,
        hop_length: int = 512,
        rle_mode: bool = False,
        model_id: str = f"tims-ears-{VERSION}.epoch",
        codebook_size: int = 1024,
        num_semantic_layers: int = 4,
        num_acoustic_layers: int = 4,
        per_layer_encoding: Optional[Dict[str, str]] = None,
        keyframe_interval_seconds: float = 5.0,
        audio_sha256: Optional[str] = None,
        include_legend: bool = True,
        compat_mode: bool = False,
    ) -> None:
        self.chunk_size = chunk_size
        self.overlap = overlap
        self.rle_mode = rle_mode
        self.keyframe_interval_seconds = keyframe_interval_seconds
        self.include_legend = include_legend
        self.compat_mode = compat_mode

        if per_layer_encoding is None and rle_mode:
            # Smart defaults: slow-moving semantic layers compress well under
            # RLE; acoustic layers churn every frame, keep them dense.
            per_layer_encoding = {f"S{i}": "rle" for i in range(num_semantic_layers)}
            per_layer_encoding.update(
                {f"A{i}": "dense" for i in range(num_acoustic_layers)})

        self.ndjson_streamer = NDJSONStreamer(
            sample_rate=sample_rate,
            hop_length=hop_length,
            model_id=model_id,
            codebook_size=codebook_size,
            num_semantic_layers=num_semantic_layers,
            num_acoustic_layers=num_acoustic_layers,
            rle_mode=rle_mode,
            per_layer_encoding=per_layer_encoding,
            keyframe_interval_seconds=keyframe_interval_seconds,
            audio_sha256=audio_sha256,
            compat_mode=compat_mode,
        )

        # Native RLE serializer state: None = not yet tried, False = lib
        # unavailable (Python path), RleCarry = active cross-chunk carry.
        self._native_carry = None
        self._rle_masks_cache: Optional[tuple] = None

    # -- native RLE fast path ------------------------------------------------
    def _rle_masks(self) -> tuple:
        """(sem, acc) bitmasks of RLE-encoded layer indices."""
        if self._rle_masks_cache is None:
            s = self.ndjson_streamer
            sem = sum(1 << i for i in range(s.num_semantic_layers)
                      if s.uses_rle(f"S{i}"))
            acc = sum(1 << i for i in range(s.num_acoustic_layers)
                      if s.uses_rle(f"A{i}"))
            self._rle_masks_cache = (sem, acc)
        return self._rle_masks_cache

    def _carry_to_buffered(self, carry) -> None:
        """Materialize the native carry's buffered event into the streamer
        (dict key order matching ndjson.create_frame) so the existing
        tail-extension + end-flush code finishes the stream byte-identically
        whichever serializer produced the lines."""
        streamer = self.ndjson_streamer
        if not carry.has_buffered:
            streamer.buffered_event = None
            return
        fd = streamer.frame_duration_ms
        ev: dict = {"event": "tokens", "fi": int(carry.fi),
                    "ts": round(carry.fi * fd, 3), "dur": float(carry.dur)}
        for i in range(streamer.num_semantic_layers):
            if carry.sem_mask >> i & 1:
                ev[f"S{i}"] = int(carry.sem_vals[i])
        for i in range(streamer.num_acoustic_layers):
            if carry.acc_mask >> i & 1:
                ev[f"A{i}"] = int(carry.acc_vals[i])
        dense_s = [int(carry.sem_vals[i]) for i in streamer._dense_s_idx]
        if dense_s:
            ev["S_dense"] = dense_s
        dense_a = [int(carry.acc_vals[i]) for i in streamer._dense_a_idx]
        if dense_a:
            ev["A_dense"] = dense_a
        streamer.buffered_event = ev
        streamer.last_frame_index = int(carry.last_fi)

    # -- vectorized helpers --------------------------------------------------
    @staticmethod
    def _stack_codes(codes: List[np.ndarray]) -> np.ndarray:
        """Stack per-layer [B, T] (or [T]) code arrays into int32 [L, T],
        truncating to the shortest layer (reference takes min over layers)."""
        rows = []
        min_t = min(int(np.asarray(c).shape[-1]) for c in codes)
        for c in codes:
            arr = np.asarray(c)
            row = arr[0] if arr.ndim > 1 else arr
            rows.append(row[:min_t])
        return np.stack(rows).astype(np.int64)

    def _keyframe_schedule(self, num_frames: int, frame_dur_ms: float) -> np.ndarray:
        """Boolean [T] mask of keyframe positions.

        Replicates the reference's stateful rule (emit when
        ``t - last_keyframe_t >= interval``, starting from 0.0, 4442-4450)
        without per-frame Python state.
        """
        mask = np.zeros(num_frames, dtype=bool)
        if not self.rle_mode or num_frames == 0:
            return mask
        interval_ms = self.keyframe_interval_seconds * 1000.0
        last = 0.0
        t = np.arange(num_frames) * frame_dur_ms
        # The schedule is data-independent (uniform frame spacing), so the
        # stateful walk collapses to a stride; keep the loop for exactness on
        # float accumulation but over keyframes only (~duration/interval).
        idx = 0
        while idx < num_frames:
            nxt = np.searchsorted(t, last + interval_ms, side="left")
            if nxt >= num_frames:
                break
            mask[nxt] = True
            last = float(t[nxt])
            idx = nxt + 1
        return mask

    # -- main entry ----------------------------------------------------------
    def create_ndjson_stream(
        self,
        tokens: Dict,
        metadata: Optional[dict] = None,
        processing_stats: Optional[dict] = None,
        duration_seconds: Optional[float] = None,
        include_legend: bool = True,
    ) -> str:
        """Assemble the full NDJSON stream for one file's token arrays."""
        streamer = self.ndjson_streamer
        lines = [streamer.create_header(duration_seconds, metadata, include_legend)]

        sem_codes = tokens.get("semantic_codes") or []
        acc_codes = tokens.get("acoustic_codes") or []
        if sem_codes and acc_codes:
            sem = self._stack_codes(sem_codes)  # [Ls, T]
            acc = self._stack_codes(acc_codes)  # [La, T]
            num_frames = min(sem.shape[1], acc.shape[1])
            sem, acc = sem[:, :num_frames], acc[:, :num_frames]

            streamer.reset()
            frame_dur = streamer.frame_duration_ms

            if not self.rle_mode:
                # Dense fast path: C++ serializer when available (the
                # dominant host cost at >100x real-time), else vectorized
                # Python. Both produce identical bytes (tested).
                from ..io import native as native_host

                native_text = native_host.serialize_dense_frames(
                    sem, acc, frame_dur)
                if native_text is not None:
                    lines.append(native_text.rstrip("\n"))
                else:
                    ts = np.arange(num_frames) * frame_dur
                    dur = round(frame_dur, 3)
                    sem_l = sem.T.tolist()
                    acc_l = acc.T.tolist()
                    for fi in range(num_frames):
                        lines.append(json.dumps(
                            {"event": "frame", "fi": fi,
                             "ts": round(float(ts[fi]), 3),
                             "dur": dur, "S": sem_l[fi], "A": acc_l[fi]},
                            separators=(",", ":")))
            else:
                keyframes = self._keyframe_schedule(num_frames, frame_dur)
                # RLE fast path: C++ walk against the precomputed keyframe
                # schedule; the buffered tail is handed back numerically and
                # finished by the same Python tail-extension + end flush.
                from ..io import native as native_host

                carry = (native_host.RleCarry()
                         if hasattr(native_host, "RleCarry") else None)
                sm, am = self._rle_masks()
                text = native_host.serialize_rle_frames(
                    sem, acc, frame_dur, streamer._dur_rounded, 0, sm, am,
                    0.0, carry, keyframe_mask=keyframes) \
                    if carry is not None else None
                if text is not None:
                    if text:
                        lines.extend(text.splitlines())
                    self._carry_to_buffered(carry)
                    if streamer.buffered_event is not None and num_frames:
                        tail = (num_frames - 1) - streamer.last_frame_index
                        if tail > 0:
                            streamer.buffered_event["dur"] += tail * frame_dur
                            streamer.last_frame_index = num_frames - 1
                    lines.append(streamer.create_end_marker(processing_stats))
                    return "\n".join(lines)

                # Vectorized change masks: layer differs from previous frame.
                changed_s = np.ones_like(sem, dtype=bool)
                changed_a = np.ones_like(acc, dtype=bool)
                changed_s[:, 1:] = sem[:, 1:] != sem[:, :-1]
                changed_a[:, 1:] = acc[:, 1:] != acc[:, :-1]
                any_change = changed_s.any(axis=0) | changed_a.any(axis=0)
                emit = any_change | keyframes
                emit_frames = np.nonzero(emit)[0]

                for fi in emit_frames:
                    fi = int(fi)
                    time_ms = fi * frame_dur
                    if keyframes[fi]:
                        # A keyframe flushes without the change-branch
                        # extension; fold the skipped unchanged frames into
                        # the buffered run first (the reference walks every
                        # frame so its buffer is already extended to fi-1).
                        if streamer.buffered_event is not None:
                            elapsed = (fi - 1) - streamer.last_frame_index
                            if elapsed > 0:
                                streamer.buffered_event["dur"] += elapsed * frame_dur
                                streamer.last_frame_index = fi - 1
                        out = streamer.create_frame(
                            fi, time_ms, sem[:, fi].tolist(), acc[:, fi].tolist(),
                            is_keyframe=True)
                    else:
                        changed = [f"S{i}" for i in np.nonzero(changed_s[:, fi])[0]]
                        changed += [f"A{i}" for i in np.nonzero(changed_a[:, fi])[0]]
                        out = streamer.create_frame(
                            fi, time_ms, sem[:, fi].tolist(), acc[:, fi].tolist(),
                            changed_layers=changed)
                    if out:
                        lines.append(out)
                # Account for trailing unchanged frames in buffered duration.
                if streamer.buffered_event is not None and num_frames:
                    tail = (num_frames - 1) - streamer.last_frame_index
                    if tail > 0:
                        streamer.buffered_event["dur"] += tail * frame_dur
                        streamer.last_frame_index = num_frames - 1

        lines.append(streamer.create_end_marker(processing_stats))
        return "\n".join(lines)

    # -- incremental emission (chunk-streaming; beyond the reference) ---------
    def begin_stream(self, metadata: Optional[dict] = None,
                     duration_seconds: Optional[float] = None,
                     include_legend: bool = True) -> str:
        """Start an incremental stream: returns the header line and resets
        all cross-frame state.  Follow with :meth:`feed_frames` per chunk
        and :meth:`end_stream`.  Produces byte-identical output to
        :meth:`create_ndjson_stream` over the same frames."""
        self.ndjson_streamer.reset()
        self._inc_frame_idx = 0
        self._inc_prev_sem: Optional[np.ndarray] = None
        self._inc_prev_acc: Optional[np.ndarray] = None
        self._inc_last_keyframe_ms = 0.0
        if self._native_carry is not False:
            self._native_carry = None  # fresh carry for the new stream
        return self.ndjson_streamer.create_header(
            duration_seconds, metadata, include_legend)

    def feed_frames(self, sem: np.ndarray, acc: np.ndarray) -> List[str]:
        """Serialize one chunk's dense token matrices ``[L, t]``; returns
        the NDJSON lines ready to emit (possibly empty under RLE)."""
        streamer = self.ndjson_streamer
        frame_dur = streamer.frame_duration_ms
        sem = np.asarray(sem, dtype=np.int64)
        acc = np.asarray(acc, dtype=np.int64)
        t = min(sem.shape[1], acc.shape[1])
        sem, acc = sem[:, :t], acc[:, :t]
        lines: List[str] = []

        if not self.rle_mode:
            from ..io import native as native_host

            base = self._inc_frame_idx
            text = native_host.serialize_dense_frames_offset(
                sem, acc, frame_dur, base) if hasattr(
                    native_host, "serialize_dense_frames_offset") else None
            if text is None:
                for i in range(t):
                    fi = base + i
                    lines.append(json.dumps(
                        {"event": "frame", "fi": fi,
                         "ts": round(fi * frame_dur, 3),
                         "dur": round(frame_dur, 3),
                         "S": sem[:, i].tolist(), "A": acc[:, i].tolist()},
                        separators=(",", ":")))
            else:
                lines.extend(text.rstrip("\n").splitlines())
            self._inc_frame_idx += t
            return lines

        # Native RLE fast path: C++ walk with a numeric cross-chunk carry
        # (buffered event + prev column + keyframe clock), byte-identical to
        # the Python walk below (fuzz-tested).  The carry is materialized
        # back into the streamer by end_stream for the final flush.
        if self._native_carry is not False and t:
            from ..io import native as native_host

            if not hasattr(native_host, "RleCarry"):
                self._native_carry = False
            else:
                if self._native_carry is None:
                    self._native_carry = native_host.RleCarry()
                    self._native_carry.last_keyframe_ms = (
                        self._inc_last_keyframe_ms)
                sm, am = self._rle_masks()
                text = native_host.serialize_rle_frames(
                    sem, acc, frame_dur, streamer._dur_rounded,
                    self._inc_frame_idx, sm, am,
                    self.keyframe_interval_seconds * 1000.0,
                    self._native_carry)
                if text is None:
                    self._native_carry = False  # lib unavailable
                else:
                    self._inc_frame_idx += t
                    self._inc_prev_sem = sem[:, -1].copy()
                    self._inc_prev_acc = acc[:, -1].copy()
                    return text.splitlines()

        # RLE: change masks continue across chunk boundaries via prev state.
        prev_s = self._inc_prev_sem
        prev_a = self._inc_prev_acc
        changed_s = np.ones_like(sem, dtype=bool)
        changed_a = np.ones_like(acc, dtype=bool)
        if prev_s is not None:
            changed_s[:, 0] = sem[:, 0] != prev_s
            changed_a[:, 0] = acc[:, 0] != prev_a
        changed_s[:, 1:] = sem[:, 1:] != sem[:, :-1]
        changed_a[:, 1:] = acc[:, 1:] != acc[:, :-1]

        # Iterate only frames that emit (change or keyframe); unchanged runs
        # are folded into buffered durations via the same elapsed-frames
        # multiply the batch path uses, so output is bit-identical to
        # create_ndjson_stream (per-frame += accumulation differs in ulps).
        interval_ms = self.keyframe_interval_seconds * 1000.0
        any_change = changed_s.any(axis=0) | changed_a.any(axis=0)
        for i in range(t):
            fi = self._inc_frame_idx + i
            time_ms = fi * frame_dur
            is_keyframe = (time_ms - self._inc_last_keyframe_ms
                           >= interval_ms)
            if not is_keyframe and not any_change[i]:
                continue
            if is_keyframe:
                self._inc_last_keyframe_ms = time_ms
                if streamer.buffered_event is not None:
                    elapsed = (fi - 1) - streamer.last_frame_index
                    if elapsed > 0:
                        streamer.buffered_event["dur"] += elapsed * frame_dur
                        streamer.last_frame_index = fi - 1
                out = streamer.create_frame(
                    fi, time_ms, sem[:, i].tolist(), acc[:, i].tolist(),
                    is_keyframe=True)
            else:
                changed = [f"S{l}" for l in np.nonzero(changed_s[:, i])[0]]
                changed += [f"A{l}" for l in np.nonzero(changed_a[:, i])[0]]
                out = streamer.create_frame(
                    fi, time_ms, sem[:, i].tolist(), acc[:, i].tolist(),
                    changed_layers=changed)
            if out:
                lines.extend(out.splitlines())
        self._inc_frame_idx += t
        if t:
            self._inc_prev_sem = sem[:, -1].copy()
            self._inc_prev_acc = acc[:, -1].copy()
        return lines

    def end_stream(self, processing_stats: Optional[dict] = None) -> List[str]:
        """Finish the incremental stream (flushes RLE state + end event)."""
        streamer = self.ndjson_streamer
        if self.rle_mode and self._native_carry not in (None, False):
            self._carry_to_buffered(self._native_carry)
            self._native_carry = None
        if self.rle_mode and streamer.buffered_event is not None:
            tail = (self._inc_frame_idx - 1) - streamer.last_frame_index
            if tail > 0:
                streamer.buffered_event["dur"] += (
                    tail * streamer.frame_duration_ms)
                streamer.last_frame_index = self._inc_frame_idx - 1
        return streamer.create_end_marker(processing_stats).splitlines()

    # -- legacy chunked text protocol (reference 4367-4412) -------------------
    def create_stream_header(self, sample_rate: int, total_samples: int,
                             metadata: Optional[dict] = None) -> str:
        header = {
            "stream_type": "neural_audio_tokens",
            "version": "1.4",
            "sample_rate": sample_rate,
            "total_samples": total_samples,
            "chunk_size": self.chunk_size,
            "overlap": self.overlap,
            "metadata": metadata or {},
            "timestamp": time.time(),
        }
        if self.compat_mode:
            header["compat_mode"] = True
            header["warning"] = (
                "Tokens generated in compatibility mode - not from trained quantizers"
            )
        return f"===STREAM_HEADER===\n{json.dumps(header)}\n===STREAM_START==="

    def create_chunk_marker(self, chunk_idx: int, chunk_samples: int, tokens: Dict) -> str:
        chunk_data = {
            "chunk_index": chunk_idx,
            "chunk_samples": chunk_samples,
            "tokens": {
                "semantic": [np.asarray(c).reshape(-1).astype(int).tolist()
                             for c in tokens["semantic_codes"]],
                "acoustic": [np.asarray(c).reshape(-1).astype(int).tolist()
                             for c in tokens["acoustic_codes"]],
            },
        }
        return f"===CHUNK_{chunk_idx}===\n{json.dumps(chunk_data)}\n===CHUNK_END==="

    def create_stream_footer(self, processing_stats: Optional[dict] = None) -> str:
        footer = {
            "processing_complete": True,
            "stats": processing_stats or {},
            "timestamp": time.time(),
        }
        return f"===STREAM_FOOTER===\n{json.dumps(footer)}\n===STREAM_COMPLETE==="

"""Incremental audio reading from a byte stream (stdin streaming mode).

The reference reads piped stdin to EOF before any processing
(neural_audio_tokenizer.py:5216-5222); this module parses a RIFF/WAVE
stream *as bytes arrive* so tokenization can start while audio is still
being piped in (``--stream-stdin``).  Only PCM-family WAV streams (the
formats whose payload is decodable block-by-block) stream; anything else
falls back to the buffered path.

Semantics differences vs the buffered path (documented in the man page):
* no global peak normalization (the peak isn't known until EOF);
* the NDJSON header carries ``audio_sha256: null`` — the digest of the
  full (raw) payload is emitted in ``end.stats.audio_sha256`` instead.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

from .audio import _pcm_to_float


class StreamingWavReader:
    """Parse a RIFF/WAVE byte stream incrementally.

    Feed bytes with :meth:`feed`; once the fmt/data headers have arrived,
    ``sample_rate``/``channels`` are set and :meth:`take_samples` yields
    decoded mono float32 blocks.
    """

    def __init__(self) -> None:
        self.sample_rate: Optional[int] = None
        self.channels: int = 1
        self.bits: int = 16
        self.fmt_code: int = 1
        self._buf = bytearray()
        self._header_parsed = False
        self._in_data = False
        self._data_remaining: Optional[int] = None
        self._sha = hashlib.sha256()
        self._failed = False

    @property
    def ready(self) -> bool:
        return self._in_data and self.sample_rate is not None

    @property
    def failed(self) -> bool:
        return self._failed

    def digest(self) -> str:
        return self._sha.hexdigest()

    def feed(self, data: bytes) -> None:
        self._sha.update(data)
        self._buf.extend(data)
        if not self._in_data:
            self._parse_chunks()

    def _parse_chunks(self) -> None:
        buf = self._buf
        if not self._header_parsed:
            if len(buf) < 12:
                return
            if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
                self._failed = True
                return
            del buf[:12]
            self._header_parsed = True
        while len(buf) >= 8:
            chunk_id = bytes(buf[:4])
            (chunk_size,) = struct.unpack_from("<I", buf, 4)
            if chunk_id == b"data":
                del buf[:8]
                self._in_data = True
                self._data_remaining = chunk_size if chunk_size else None
                return
            body_end = 8 + chunk_size + (chunk_size & 1)
            if len(buf) < body_end:
                return
            if chunk_id == b"fmt " and chunk_size >= 16:
                (self.fmt_code, self.channels, self.sample_rate, _, _,
                 self.bits) = struct.unpack_from("<HHIIHH", buf, 8)
                if self.fmt_code == 0xFFFE and chunk_size >= 40:
                    (self.fmt_code,) = struct.unpack_from("<H", buf, 8 + 24)
                if self.fmt_code not in (1, 3, 6, 7):
                    self._failed = True
                    return
            del buf[:body_end]

    def take_samples(self) -> Optional[np.ndarray]:
        """Decode and return all complete frames buffered so far (mono
        float32), or None if none are available yet."""
        if not self.ready or self._failed:
            return None
        bytes_per_sample = 1 if self.fmt_code in (6, 7) or self.bits == 8 \
            else self.bits // 8
        frame_bytes = bytes_per_sample * self.channels
        avail = len(self._buf)
        if self._data_remaining is not None:
            avail = min(avail, self._data_remaining)
        usable = avail - (avail % frame_bytes)
        if usable <= 0:
            return None
        raw = bytes(self._buf[:usable])
        del self._buf[:usable]
        if self._data_remaining is not None:
            self._data_remaining -= usable
        samples = _pcm_to_float(raw, self.bits, self.fmt_code)
        if self.channels > 1:
            n = len(samples) // self.channels
            samples = samples[: n * self.channels].reshape(
                n, self.channels).mean(axis=1)
        return np.ascontiguousarray(samples, dtype=np.float32)


def iter_stream_samples(stream, block_bytes: int = 1 << 16
                        ) -> Iterator[Tuple[str, object]]:
    """Drive a :class:`StreamingWavReader` over a binary file object.

    Yields ``("rate", sample_rate)`` once, then ``("samples", ndarray)``
    blocks, then ``("sha256", digest)`` at EOF.  Raises ValueError if the
    stream is not an incrementally decodable WAV.
    """
    reader = StreamingWavReader()
    announced = False
    while True:
        data = stream.read(block_bytes)
        if reader.failed:
            raise ValueError("stream is not an incrementally decodable WAV")
        if data:
            reader.feed(data)
        if reader.failed:
            raise ValueError("stream is not an incrementally decodable WAV")
        if reader.ready and not announced:
            yield "rate", int(reader.sample_rate)
            announced = True
        block = reader.take_samples()
        if block is not None and block.size:
            yield "samples", block
        if not data:
            break
    if not announced:
        raise ValueError("stream ended before a WAV header was parsed")
    yield "sha256", reader.digest()

"""Incremental audio reading from a byte stream (stdin streaming mode).

The reference reads piped stdin to EOF before any processing
(neural_audio_tokenizer.py:5216-5222); this module parses audio container
streams *as bytes arrive* so tokenization can start while audio is still
being piped in (``--stream-stdin``).  Incrementally decodable formats:
PCM-family WAV, AIFF/AIFC, Sun AU (block-decodable payloads) and FLAC
(frame-by-frame first-party decode).  Anything else falls back to the
buffered path.

Semantics differences vs the buffered path (documented in the man page):
* no global peak normalization (the peak isn't known until EOF);
* the NDJSON header carries ``audio_sha256: null`` — the digest of the
  full (raw) payload is emitted in ``end.stats.audio_sha256`` instead.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .audio import _MULAW, _be_pcm_to_float, _pcm_to_float


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

    @property
    def complete(self) -> bool:
        """Payload fully consumed (self-terminating container only)."""
        return self._in_data and self._data_remaining == 0

    def trailing_bytes(self) -> bytes:
        """Unconsumed bytes past the payload (valid once ``complete``)."""
        return bytes(self._buf)

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


class StreamingAuReader:
    """Parse a Sun AU byte stream incrementally (PCM/μ-law payloads)."""

    _BYTES_PER = {1: 1, 2: 1, 3: 2, 5: 4, 6: 4, 7: 8}

    def __init__(self) -> None:
        self.sample_rate: Optional[int] = None
        self.channels: int = 1
        self.encoding: int = 3
        self._offset: Optional[int] = None
        self._buf = bytearray()
        self._in_data = False
        self._data_remaining: Optional[int] = None
        self._sha = hashlib.sha256()
        self._failed = False

    @property
    def ready(self) -> bool:
        return self._in_data

    @property
    def failed(self) -> bool:
        return self._failed

    @property
    def complete(self) -> bool:
        return self._in_data and self._data_remaining == 0

    def trailing_bytes(self) -> bytes:
        return bytes(self._buf)

    def digest(self) -> str:
        return self._sha.hexdigest()

    def feed(self, data: bytes) -> None:
        self._sha.update(data)
        self._buf.extend(data)
        if self._in_data:
            return
        if self._offset is None:
            if len(self._buf) < 24:
                return
            if bytes(self._buf[:4]) != b".snd":
                self._failed = True
                return
            (self._offset, size, self.encoding, self.sample_rate,
             self.channels) = struct.unpack_from(">IIIII", self._buf, 4)
            if self.encoding not in self._BYTES_PER:
                self._failed = True
                return
            # 0xFFFFFFFF = unknown length (stream to EOF)
            self._data_remaining = size if size != 0xFFFFFFFF else None
        if len(self._buf) >= self._offset:
            del self._buf[: self._offset]
            self._in_data = True

    def take_samples(self) -> Optional[np.ndarray]:
        if not self.ready or self._failed:
            return None
        frame_bytes = self._BYTES_PER[self.encoding] * self.channels
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
        if self.encoding == 1:
            samples = _MULAW[np.frombuffer(raw, dtype=np.uint8)]
        elif self.encoding == 2:
            samples = np.frombuffer(raw, dtype=">i1").astype(np.float32) / 128.0
        elif self.encoding == 3:
            samples = np.frombuffer(raw, dtype=">i2").astype(np.float32) / 32768.0
        elif self.encoding == 5:
            samples = np.frombuffer(raw, dtype=">i4").astype(
                np.float32) / 2147483648.0
        elif self.encoding == 6:
            samples = np.frombuffer(raw, dtype=">f4").astype(np.float32)
        else:  # 7
            samples = np.frombuffer(raw, dtype=">f8").astype(np.float32)
        if self.channels > 1:
            n = len(samples) // self.channels
            samples = samples[: n * self.channels].reshape(
                n, self.channels).mean(axis=1)
        return np.ascontiguousarray(samples, dtype=np.float32)


class StreamingAiffReader:
    """Parse an AIFF/AIFC byte stream incrementally (big-endian PCM)."""

    def __init__(self) -> None:
        self.sample_rate: Optional[int] = None
        self.channels: int = 1
        self.bits: int = 16
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

    @property
    def complete(self) -> bool:
        return self._in_data and self._data_remaining == 0

    def trailing_bytes(self) -> bytes:
        return bytes(self._buf)

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
            if (bytes(buf[:4]) != b"FORM"
                    or bytes(buf[8:12]) not in (b"AIFF", b"AIFC")):
                self._failed = True
                return
            del buf[:12]
            self._header_parsed = True
        while len(buf) >= 8:
            chunk_id = bytes(buf[:4])
            (chunk_size,) = struct.unpack_from(">I", buf, 4)
            if chunk_id == b"SSND":
                # SSND body: 4B offset + 4B blocksize, then `offset` pad
                # bytes, then PCM.  Wait for the sub-header + pad.
                if len(buf) < 16:
                    return
                (offset,) = struct.unpack_from(">I", buf, 8)
                if len(buf) < 16 + offset:
                    return
                del buf[: 16 + offset]
                self._in_data = True
                self._data_remaining = max(chunk_size - 8 - offset, 0)
                return
            body_end = 8 + chunk_size + (chunk_size & 1)
            if len(buf) < body_end:
                return
            if chunk_id == b"COMM" and chunk_size >= 18:
                self.channels, _frames, self.bits = struct.unpack_from(
                    ">HIH", buf, 8)
                exp = struct.unpack_from(">H", buf, 16)[0]
                mant_hi, mant_lo = struct.unpack_from(">II", buf, 18)
                mantissa = (mant_hi << 32) | mant_lo
                if exp != 0 or mantissa != 0:
                    sign = -1.0 if exp & 0x8000 else 1.0
                    e = (exp & 0x7FFF) - 16383
                    self.sample_rate = int(round(
                        sign * mantissa * 2.0 ** (e - 63)))
                if self.bits not in (8, 16, 24, 32):
                    self._failed = True
                    return
            del buf[:body_end]

    def take_samples(self) -> Optional[np.ndarray]:
        if not self.ready or self._failed:
            return None
        frame_bytes = (self.bits // 8) * self.channels
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
        samples = _be_pcm_to_float(raw, self.bits)
        if self.channels > 1:
            n = len(samples) // self.channels
            samples = samples[: n * self.channels].reshape(
                n, self.channels).mean(axis=1)
        return np.ascontiguousarray(samples, dtype=np.float32)


class StreamingFlacReader:
    """Decode a FLAC byte stream incrementally, frame by frame.

    Buffers bytes until a complete frame is available, decodes it with the
    first-party decoder (:mod:`nat_tpu.io.flac`), and consumes it from the
    buffer.  A decode error mid-stream is indistinguishable from a frame
    that hasn't fully arrived, so errors only surface at EOF
    (:meth:`finish`).
    """

    def __init__(self) -> None:
        self.sample_rate: Optional[int] = None
        self._buf = bytearray()
        self._info = None
        self._meta_done = False
        self._sha = hashlib.sha256()
        self._failed = False
        self._pending: List[np.ndarray] = []
        self._decoded_total = 0

    @property
    def ready(self) -> bool:
        return self._meta_done

    @property
    def failed(self) -> bool:
        return self._failed

    @property
    def complete(self) -> bool:
        """All declared samples decoded (STREAMINFO total_samples > 0)."""
        return (self._meta_done and bool(self._info.total_samples)
                and self._decoded_total >= self._info.total_samples)

    def trailing_bytes(self) -> bytes:
        return bytes(self._buf)

    def digest(self) -> str:
        return self._sha.hexdigest()

    def feed(self, data: bytes) -> None:
        from .flac import parse_flac_metadata

        self._sha.update(data)
        self._buf.extend(data)
        if self._failed:
            return
        if not self._meta_done:
            if len(self._buf) >= 4 and bytes(self._buf[:4]) != b"fLaC":
                self._failed = True
                return
            try:
                pos, info = parse_flac_metadata(bytes(self._buf))
            except ValueError as exc:
                if "truncated" not in str(exc):
                    self._failed = True
                return
            self._info = info
            self.sample_rate = int(info.sample_rate)
            del self._buf[:pos]
            self._meta_done = True
        self._decode_frames()

    def _decode_frames(self) -> None:
        from .flac import decode_frame_at

        scale = float(1 << (self._info.bps - 1))
        while self._buf:
            data = bytes(self._buf)
            try:
                mono, _sr, next_pos = decode_frame_at(data, 0, self._info)
            except ValueError:
                return  # incomplete (or bad — resolved at finish())
            del self._buf[:next_pos]
            block = (mono / scale).astype(np.float32)
            if self._info.total_samples:
                remain = self._info.total_samples - self._decoded_total
                block = block[:max(remain, 0)]
            self._decoded_total += len(block)
            if len(block):
                self._pending.append(block)

    def take_samples(self) -> Optional[np.ndarray]:
        if not self._pending:
            return None
        blocks, self._pending = self._pending, []
        return np.concatenate(blocks) if len(blocks) > 1 else blocks[0]

    def finish(self) -> None:
        """EOF: any undecoded remainder means the stream was corrupt."""
        if self._buf and self._meta_done and not self._failed:
            from .flac import decode_frame_at

            try:
                decode_frame_at(bytes(self._buf), 0, self._info)
            except ValueError as exc:
                raise ValueError(
                    f"FLAC stream ended with undecodable bytes: {exc}")


class StreamingCodecReader:
    """Incremental perceptual-codec decode (MP3/OGG/M4A/AAC) by chunked
    re-probe of the FFmpeg shim (:mod:`nat_tpu.io.codecs`).

    libavformat's pull-model demuxers can't be fed push-mode portably, but
    truncated-buffer decodes are *prefix-stable*: decoding the first N
    bytes yields bit-identical leading samples to decoding the whole
    stream (measured exact for mp3/vorbis; a ``HOLDBACK`` tail is withheld
    until EOF as a safety margin).  So the reader re-decodes its buffer at
    geometrically growing byte thresholds and emits only the new samples —
    total decode work stays O(stream bytes × constant), and perceptual
    codecs gain the same frames-before-EOF behavior as the first-party
    container readers (VERDICT r2 next #9).

    Not self-terminating (``complete`` stays False): compressed bitstreams
    can contain any byte, so ASCII-FS multiplexing cannot split them — a
    compressed stream must be the only (or last) file on the pipe.
    """

    PROBE_MIN = 16 * 1024      # first decode attempt after this many bytes
    #                            (~1 s of 128 kbps mp3 — bounds both header
    #                            latency and early re-probe cost)
    HOLDBACK = 4608            # samples withheld until EOF

    def __init__(self) -> None:
        self.sample_rate: Optional[int] = None
        self._buf = bytearray()
        self._sha = hashlib.sha256()
        self._emitted = 0
        self._next_probe = self.PROBE_MIN
        self._pending: Optional[np.ndarray] = None
        self._eof = False
        self._failed = False
        self._eof_error = "decode failed"
        self._warned_fs = False

    @property
    def ready(self) -> bool:
        return self.sample_rate is not None

    @property
    def failed(self) -> bool:
        return self._failed

    @property
    def complete(self) -> bool:
        return False

    def trailing_bytes(self) -> bytes:
        return b""

    def digest(self) -> str:
        return self._sha.hexdigest()

    def feed(self, data: bytes) -> None:
        self._buf += data
        self._sha.update(data)
        # FS multiplexing cannot split a compressed bitstream (any byte may
        # appear in it), so a producer that sends `song.mp3 <FS> next.wav`
        # would get next.wav silently absorbed into the mp3's buffer and
        # digest.  Cheap heuristic to make that loud: warn once when an FS
        # byte is followed by a recognizable container header.
        if not self._warned_fs:
            lo = max(0, len(self._buf) - len(data) - 17)
            window = bytes(self._buf[lo:])
            idx = window.find(b"\x1c")
            while idx != -1:
                head = window[idx + 1:idx + 17]
                if len(head) >= 12 and make_stream_reader(head) is not None:
                    from ..utils.logging import logger

                    logger.warn(
                        "FS separator followed by a container header inside "
                        "a compressed stream: perceptual codecs cannot be "
                        "FS-multiplexed (the remainder is treated as part of "
                        "this stream). Send compressed files on separate "
                        "pipes/connections, or place them last.")
                    self._warned_fs = True
                    break
                idx = window.find(b"\x1c", idx + 1)

    def _probe(self) -> None:
        from . import codecs

        try:
            samples, sr = codecs.decode_bytes(bytes(self._buf))
        except Exception as exc:
            # Not decodable *yet* (e.g. partial header pages) is fine
            # mid-stream; at EOF any failure is terminal — even after
            # successful mid-stream probes, or the held-back tail (and
            # everything after the last good probe) would vanish silently.
            if self._eof:
                self._failed = True
                self._eof_error = str(exc)
            return
        self.sample_rate = int(sr)
        hold = 0 if self._eof else self.HOLDBACK
        end = max(len(samples) - hold, self._emitted)
        if end > self._emitted:
            self._pending = samples[self._emitted:end]
            self._emitted = end

    def take_samples(self) -> Optional[np.ndarray]:
        if self._pending is None and (
                self._eof or len(self._buf) >= self._next_probe):
            self._probe()
            # geometric growth bounds total re-decode work
            self._next_probe = max(self.PROBE_MIN + len(self._buf),
                                   len(self._buf) * 5 // 4)
        out, self._pending = self._pending, None
        return out

    def finish(self) -> None:
        self._eof = True
        self._probe()
        if self.sample_rate is None:
            raise ValueError("compressed stream could not be decoded")
        if self._failed:
            raise ValueError("compressed stream ended with undecodable "
                             f"bytes: {self._eof_error}")


def _read_block(stream, n: int) -> bytes:
    """One "whatever has arrived" read.

    ``BufferedReader.read(n)`` is greedy — on a live pipe/socket it blocks
    until n bytes accumulate, imposing n-byte latency granularity on every
    downstream frame.  ``read1(n)`` returns after the FIRST raw read (all
    currently-available bytes, blocking only until SOME arrive, empty only
    at EOF for blocking streams), so first-frame latency tracks the
    producer instead of the buffer size.  Falls back to ``read`` for
    objects without ``read1``."""
    r1 = getattr(stream, "read1", None)
    if r1 is not None:
        return r1(n)
    return stream.read(n)


def read_sniff(stream, min_bytes: int = 64, cap: int = 1 << 16) -> bytes:
    """Read just enough of a live stream to identify its container.

    Accumulates first-available blocks until ``min_bytes`` non-FS bytes
    (``make_stream_reader`` needs ≤12; margin for ID3/ftyp probing) or
    EOF — never the full ``cap`` unless it arrives in one block.  The
    returned bytes must be replayed ahead of the stream
    (:class:`PrefixedStream`)."""
    buf = b""
    while len(buf.lstrip(b"\x1c")) < min_bytes:
        block = _read_block(stream, cap)
        if not block:
            break
        buf += block
    return buf


class PrefixedStream:
    """Binary reader that replays sniffed bytes before the live stream
    (the companion of :func:`read_sniff`)."""

    def __init__(self, prefix: bytes, stream) -> None:
        self._prefix = prefix
        self._stream = stream

    def read(self, n: int = -1) -> bytes:
        if self._prefix:
            if n is None or n < 0:
                out = self._prefix + self._stream.read(n)
                self._prefix = b""
                return out
            out, self._prefix = self._prefix[:n], self._prefix[n:]
            return out
        return self._stream.read(n)

    def read1(self, n: int = -1) -> bytes:
        """First-available-block read (keeps live-pipe latency at producer
        granularity after the sniff; see :func:`_read_block`)."""
        if self._prefix:
            out = self._prefix if n is None or n < 0 else self._prefix[:n]
            self._prefix = self._prefix[len(out):]
            return out
        r1 = getattr(self._stream, "read1", None)
        if r1 is not None:
            return r1(n)
        return self._stream.read(n)


def make_stream_reader(head: bytes):
    """Pick the incremental reader for a byte-stream prefix, or None."""
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return StreamingWavReader()
    if head[:4] == b"fLaC":
        return StreamingFlacReader()
    if head[:4] == b".snd":
        return StreamingAuReader()
    if head[:4] == b"FORM" and head[8:12] in (b"AIFF", b"AIFC"):
        return StreamingAiffReader()
    # Perceptual codecs: share the buffered ladder's STRICT sniffer
    # (audio._sniff_compressed validates MPEG version/layer/bitrate/srate
    # fields) so a raw-PCM stream whose first sample happens to contain a
    # 0xFF sync byte keeps falling through to the buffered raw-PCM
    # reinterpretation instead of erroring in the codec shim.
    from .audio import _sniff_compressed

    if _sniff_compressed(head[:16]) is not None:
        from . import codecs

        if codecs.available():
            return StreamingCodecReader()
    return None


def iter_fs_streams(stream, block_bytes: int = 1 << 16
                    ) -> Iterator[Tuple[str, object]]:
    """Drive incremental readers over an (optionally) ASCII-FS-delimited
    multi-file byte stream — the streaming analog of the buffered FS
    splitter (reference neural_audio_tokenizer.py:5195-5214).

    Yields ``("file", index)`` at each file start, then that file's
    ``("rate", sr)`` / ``("samples", ndarray)`` / ``("sha256", digest)``
    events; ``sha256`` terminates the file (its digest covers the file's
    own bytes, excluding FS separators).

    Splitting happens only at container boundaries: a file ends when its
    reader reports ``complete`` (self-terminating container — sized WAV/
    AIFF/AU payloads, FLAC with total_samples) and the next non-FS bytes
    start a new container.  The final file may stream to EOF; trailing
    non-FS junk after a complete container is hashed and discarded
    (single-file compatibility).
    """
    carry = b""
    eof = False
    idx = 0

    def fill(n: int) -> None:
        nonlocal carry, eof
        while len(carry) < n and not eof:
            b = _read_block(stream, block_bytes)
            if not b:
                eof = True
                return
            carry += b

    while True:
        fill(1)
        while carry and carry[0] == 0x1C:   # drop separators (and blanks)
            carry = carry.lstrip(b"\x1c")
            fill(1)
        if not carry:
            break
        fill(12)
        reader = make_stream_reader(carry)
        if reader is None:
            raise ValueError(
                "FS chunk is not an incrementally decodable container")
        yield "file", idx
        sha = hashlib.sha256()
        announced = False
        prev_block: Optional[bytes] = None   # hashed one block late: the
        #                                      trailing suffix of the final
        #                                      block belongs to the NEXT file
        while True:
            if carry:
                block, carry = carry, b""
            elif eof:
                block = b""
            else:
                block = _read_block(stream, block_bytes)
                if not block:
                    eof = True
            if block:
                reader.feed(block)
                if prev_block is not None:
                    sha.update(prev_block)
                prev_block = block
            if reader.failed:
                raise ValueError("stream is not incrementally decodable")
            # take BEFORE the rate check: codec readers only resolve their
            # sample rate inside take_samples' probe.
            out = reader.take_samples()
            if reader.ready and not announced:
                yield "rate", int(reader.sample_rate)
                announced = True
            if out is not None and out.size:
                yield "samples", out
            if getattr(reader, "complete", False):
                trailing = reader.trailing_bytes()
                if prev_block is not None:
                    if trailing and len(trailing) <= len(prev_block):
                        sha.update(prev_block[: len(prev_block)
                                              - len(trailing)])
                    elif not trailing:
                        sha.update(prev_block)
                    # trailing longer than the last block would mean the
                    # driver fed past completion — it never does.
                carry = trailing
                fill(1)
                if carry and carry[0] != 0x1C:
                    # Trailing junk (e.g. post-data RIFF chunks), not a
                    # new FS-delimited file: hash + discard to EOF.
                    sha.update(carry)
                    while True:
                        junk = _read_block(stream, block_bytes)
                        if not junk:
                            eof = True
                            break
                        sha.update(junk)
                    carry = b""
                break
            if eof and not block:
                if hasattr(reader, "finish"):
                    reader.finish()
                # Readers that only resolve at EOF (codec re-probe) may
                # first become ready / produce samples here.
                if reader.ready and not announced:
                    yield "rate", int(reader.sample_rate)
                    announced = True
                out = reader.take_samples()
                if out is not None and out.size:
                    yield "samples", out
                if prev_block is not None:
                    sha.update(prev_block)
                break
        if not announced:
            raise ValueError("stream ended before an audio header was parsed")
        yield "sha256", sha.hexdigest()
        idx += 1
        if eof and not carry:
            break


def iter_stream_samples(stream, block_bytes: int = 1 << 16
                        ) -> Iterator[Tuple[str, object]]:
    """Drive an incremental reader over a binary file object.

    Yields ``("rate", sample_rate)`` once, then ``("samples", ndarray)``
    blocks, then ``("sha256", digest)`` at EOF.  Raises ValueError if the
    stream is not incrementally decodable (unknown container, or decode
    failure).
    """
    head = _read_block(stream, block_bytes)
    reader = make_stream_reader(head)
    if reader is None:
        raise ValueError("stream is not an incrementally decodable format")
    announced = False
    data = head
    while True:
        if data:
            reader.feed(data)
        if reader.failed:
            raise ValueError("stream is not incrementally decodable")
        block = reader.take_samples()
        if reader.ready and not announced:
            yield "rate", int(reader.sample_rate)
            announced = True
        if block is not None and block.size:
            yield "samples", block
        if not data:
            break
        data = _read_block(stream, block_bytes)
    if hasattr(reader, "finish"):
        reader.finish()
        if reader.ready and not announced:
            yield "rate", int(reader.sample_rate)
            announced = True
        block = reader.take_samples()
        if block is not None and block.size:
            yield "samples", block
    if not announced:
        raise ValueError("stream ended before an audio header was parsed")
    yield "sha256", reader.digest()


def eager_events(gen, max_queue: int = 256):
    """Decouple stream reading from downstream compute.

    A daemon thread pumps ``gen``'s events into a bounded queue (the bound
    is backpressure: a slow consumer blocks the reader, never memory).
    Iterating yields the same event protocol, except consecutive
    already-queued ``("samples", ...)`` events are merged into one larger
    payload — so when the producer outruns tokenization (``cat file |
    nat --stream-stdin``), the pipeline sees multiple chunk spans at once
    and can dispatch them as a single batched forward
    (`runtime/pipeline._stream_one_file`).  On a live (real-time) pipe the
    queue never fills past one event and behavior is identical to
    consuming ``gen`` directly — first-frame latency is unchanged by
    construction, since only ALREADY-ARRIVED bytes are merged.

    Set ``max_queue`` small to bound lookahead (tests pin it via
    NAT_TPU_STREAM_PREFETCH to keep byte-level arrival assertions
    meaningful on instant in-memory streams).
    """
    import os as _os
    import queue as _queue
    import threading as _threading

    env = _os.environ.get("NAT_TPU_STREAM_PREFETCH")
    if env is not None:
        try:
            max_queue = int(env)
        except ValueError:
            pass
    if max_queue <= 0:           # prefetch disabled: plain pass-through
        yield from gen
        return

    q: "_queue.Queue" = _queue.Queue(maxsize=max_queue)
    _EOF = ("__eof__", None)
    stop = _threading.Event()

    def _put(ev) -> bool:
        # Bounded-queue backpressure that stays abandonable: a consumer
        # that exits mid-stream (client disconnect in the serving daemon)
        # sets ``stop``, and the pump must not park in ``q.put`` forever —
        # that would leak one thread plus a full queue of sample buffers
        # per aborted stream in a long-lived process.
        while not stop.is_set():
            try:
                q.put(ev, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def pump():
        try:
            for ev in gen:
                if not _put(ev):
                    return
            _put(_EOF)
        except BaseException as exc:  # surfaced on the consumer side
            _put(("__err__", exc))

    _threading.Thread(target=pump, daemon=True,
                      name="nat-stream-prefetch").start()

    try:
        pushback = None
        while True:
            kind, payload = pushback if pushback is not None else q.get()
            pushback = None
            if kind == "__eof__":
                return
            if kind == "__err__":
                raise payload
            if kind != "samples":
                yield kind, payload
                continue
            parts = [payload]
            while True:             # merge whatever has ALREADY arrived
                try:
                    nxt = q.get_nowait()
                except _queue.Empty:
                    break
                if nxt[0] == "samples":
                    parts.append(nxt[1])
                else:
                    pushback = nxt
                    break
            yield ("samples",
                   parts[0] if len(parts) == 1 else np.concatenate(parts))
    finally:
        stop.set()

"""stdin byte handling, format sniffing, and FS-delimited multi-file splitting.

Mirrors the contract of reference neural_audio_tokenizer.py:5147-5232:
magic-byte format detection, a text-vs-binary heuristic, ASCII File Separator
(0x1C) splitting of concatenated piped files, and temp-file management.
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import List

FS_BYTE = b"\x1c"


def detect_audio_format(data: bytes) -> str:
    """Sniff magic bytes and return a best-guess file extension."""
    head = data[:16]
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return ".wav"
    if head[:4] == b"fLaC":
        return ".flac"
    if head[:3] == b"ID3" or (len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xE0) == 0xE0):
        return ".mp3"
    if head[:4] == b"OggS":
        return ".ogg"
    if head[4:8] == b"ftyp":
        return ".m4a"
    if head[:4] == b".snd":
        return ".au"
    if head[:4] == b"FORM" and head[8:12] in (b"AIFF", b"AIFC"):
        return ".aiff"
    return ".raw"


def looks_like_text(data: bytes, printable_threshold: float = 0.85) -> bool:
    """NUL-free and mostly-printable ⇒ treat as text (file-path list)."""
    if not data:
        return True
    sample = data[:4096]
    if b"\x00" in sample:
        return False
    printable = sum(1 for b in sample if 32 <= b < 127 or b in (9, 10, 13))
    return printable / len(sample) >= printable_threshold


_STRONG_MAGIC_PREFIXES = (b"fLaC", b"OggS", b"ID3", b".snd")


def _starts_with_container_magic(data: bytes) -> bool:
    head = data[:16]
    if head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return True
    if head[:4] in _STRONG_MAGIC_PREFIXES or head[:3] == b"ID3":
        return True
    if head[4:8] == b"ftyp":
        return True
    return False


def split_fs_chunks(data: bytes) -> List[bytes]:
    """Split concatenated stdin bytes on ASCII FS (0x1C), dropping empties.

    The reference splits on *every* FS byte (neural_audio_tokenizer.py:
    5195-5214), which corrupts real audio containers — 0x1C occurs freely
    inside PCM payloads.  We split structure-aware instead: when the stream
    starts with a recognizable container magic, only FS positions followed by
    another container magic are treated as file boundaries; raw/unknown
    streams keep the reference's split-everywhere behavior.
    """
    if not _starts_with_container_magic(data):
        return [c for c in data.split(FS_BYTE) if c]

    boundaries = [0]
    search = 0
    while True:
        pos = data.find(FS_BYTE, search)
        if pos < 0:
            break
        if _starts_with_container_magic(data[pos + 1 : pos + 17]):
            boundaries.append(pos)
        search = pos + 1

    chunks: List[bytes] = []
    for i, start in enumerate(boundaries):
        begin = start + 1 if i > 0 else 0  # skip the FS byte itself
        end = boundaries[i + 1] if i + 1 < len(boundaries) else len(data)
        chunk = data[begin:end]
        if chunk:
            chunks.append(chunk)
    return chunks


def read_stdin_bytes() -> bytes:
    """Read all of stdin as raw bytes."""
    return sys.stdin.buffer.read()


def has_piped_stdin() -> bool:
    """True when stdin is a pipe/file rather than an interactive TTY."""
    try:
        return not sys.stdin.isatty()
    except Exception:
        try:
            import select

            return select.select([sys.stdin], [], [], 0) == ([sys.stdin], [], [])
        except Exception:
            return False


def chunks_to_temp_files(chunks: List[bytes]) -> List[str]:
    """Write each byte chunk to a temp file with a sniffed extension."""
    paths: List[str] = []
    for chunk in chunks:
        if len(chunk) < 2:  # cannot possibly be audio
            continue
        ext = detect_audio_format(chunk)
        fd, path = tempfile.mkstemp(suffix=ext, prefix="nat_tpu_")
        try:
            os.write(fd, chunk)
        finally:
            os.close(fd)
        paths.append(path)
    return paths


def cleanup_temp_files(paths: List[str]) -> None:
    for path in paths:
        try:
            os.unlink(path)
        except OSError:
            pass

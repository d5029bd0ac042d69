"""Compressed-audio codecs via the system FFmpeg libraries.

ctypes binding to ``native/libnat_codecs.so`` (see ``native/nat_codecs.cpp``).
Covers the perceptual codecs the reference decodes through its
librosa→audioread→ffmpeg chain (neural_audio_tokenizer.py:4722-4762):
MP3, OGG/Vorbis, M4A/AAC — anything libavformat can demux.  The
first-party native parsers in :mod:`nat_tpu.io.audio` / ``flac.py`` remain
primary for WAV/AIFF/AU/FLAC; this module is the decoder for formats where
reimplementing the codec would mean fabricating its constant tables, and
the *encoder* used to generate third-party golden vectors for the
first-party decoders' tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..utils.logging import logger

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnat_codecs.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR), "libnat_codecs.so"],
            check=True, capture_output=True, timeout=180)
        return _LIB_PATH.exists()
    except Exception as exc:
        logger.debug(f"codec shim build failed: {exc}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded codec shim, building on first call; None when the FFmpeg
    libraries or the toolchain are unavailable (NAT_TPU_NO_NATIVE=1 also
    disables it)."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("NAT_TPU_NO_NATIVE"):
        return None
    src = _NATIVE_DIR / "nat_codecs.cpp"
    stale = (not _LIB_PATH.exists()
             or (src.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as exc:
        logger.debug(f"codec shim load failed: {exc}")
        return None
    lib.nat_decode_audio.restype = ctypes.c_int
    lib.nat_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p, ctypes.c_int]
    lib.nat_encode_audio.restype = ctypes.c_int
    lib.nat_encode_audio.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int]
    lib.nat_codecs_free.restype = None
    lib.nat_codecs_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode compressed audio bytes → (mono float32, sample_rate).

    Raises ValueError when the shim is unavailable or the stream is
    undecodable — compressed formats must never silently degrade to
    raw-PCM noise.
    """
    lib = get_lib()
    if lib is None:
        raise ValueError(
            "Compressed-audio decoding requires the FFmpeg codec shim "
            "(libnat_codecs.so); it is unavailable on this system")
    out = ctypes.POINTER(ctypes.c_float)()
    out_n = ctypes.c_int64(0)
    out_sr = ctypes.c_int(0)
    err = ctypes.create_string_buffer(256)
    rc = lib.nat_decode_audio(data, len(data), ctypes.byref(out),
                              ctypes.byref(out_n), ctypes.byref(out_sr),
                              err, len(err))
    if rc != 0:
        raise ValueError(
            f"Compressed-audio decode failed: "
            f"{err.value.decode(errors='replace') or rc}")
    try:
        samples = np.ctypeslib.as_array(
            out, shape=(out_n.value,)).astype(np.float32, copy=True)
    finally:
        lib.nat_codecs_free(out)
    return samples, int(out_sr.value)


def encode_file(samples: np.ndarray, sample_rate: int, path: str,
                codec: str, container: Optional[str] = None) -> None:
    """Encode float32 ``samples`` (``[n]`` mono or ``[n, ch]`` interleaved)
    to ``path`` (fixture generation).

    codec/container pairs: ("flac","flac"), ("libmp3lame","mp3"),
    ("libvorbis","ogg"), ("aac","ipod" → .m4a).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("codec shim unavailable")
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    frames = samples.shape[0]
    err = ctypes.create_string_buffer(256)
    rc = lib.nat_encode_audio(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, sample_rate, channels, codec.encode(),
        (container or codec).encode(), str(path).encode(), err, len(err))
    if rc != 0:
        raise RuntimeError(
            f"encode failed: {err.value.decode(errors='replace') or rc}")

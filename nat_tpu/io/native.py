"""ctypes bindings to the C++ host runtime (``native/libnat_host.so``).

Builds the shared library on first use (g++, ~1 s) and caches it next to
the source; every entry point degrades to the pure-Python implementation
when the toolchain is unavailable, so the native layer is a transparent
accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.logging import logger

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnat_host.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as exc:
        logger.debug(f"native build failed: {exc}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first call; None when unavailable
    (or when NAT_TPU_NO_NATIVE=1)."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("NAT_TPU_NO_NATIVE"):
        return None
    # Always run make: a stale .so (older than the source) would silently
    # diverge from the ctypes ABI declared below.  make is a no-op when the
    # library is fresh.
    src = _NATIVE_DIR / "nat_host.cpp"
    stale = (not _LIB_PATH.exists()
             or (src.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
    if stale and not _build():
        return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.serialize_dense_frames.restype = ctypes.c_void_p
        lib.serialize_dense_frames.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.nat_free.argtypes = [ctypes.c_void_p]
        lib.pcm16_to_float_mono.restype = ctypes.c_int64
        lib.pcm16_to_float_mono.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.pcm24_to_float_mono.restype = ctypes.c_int64
        lib.pcm24_to_float_mono.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.change_mask.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32)]
        lib.serialize_rle_frames.restype = ctypes.c_void_p
        lib.serialize_rle_frames.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_double,
            ctypes.c_char_p, ctypes.POINTER(RleCarry),
            ctypes.POINTER(ctypes.c_size_t)]
        _bind_flac(lib)
        _lib = lib
        logger.debug(f"native host runtime loaded: {_LIB_PATH}")
    except Exception as exc:
        logger.debug(f"native load failed: {exc}")
    return _lib


class RleCarry(ctypes.Structure):
    """Numeric-only cross-chunk RLE state (native NatRleCarry, nat_host.cpp):
    the streamer's buffered "tokens" event plus change/keyframe context.
    Field order/types must mirror the C struct exactly."""

    _fields_ = [
        ("has_buffered", ctypes.c_int32), ("pad0", ctypes.c_int32),
        ("fi", ctypes.c_int64), ("dur", ctypes.c_double),
        ("sem_mask", ctypes.c_uint32), ("acc_mask", ctypes.c_uint32),
        ("last_fi", ctypes.c_int64), ("last_keyframe_ms", ctypes.c_double),
        ("has_prev", ctypes.c_int32), ("pad1", ctypes.c_int32),
        ("sem_vals", ctypes.c_int32 * 32), ("acc_vals", ctypes.c_int32 * 32),
        ("prev_sem", ctypes.c_int32 * 32), ("prev_acc", ctypes.c_int32 * 32),
    ]


def serialize_rle_frames(sem: np.ndarray, acc: np.ndarray,
                         frame_dur_ms: float, dur_rounded: float,
                         fi_base: int, sem_rle_mask: int, acc_rle_mask: int,
                         keyframe_interval_ms: float, carry: RleCarry,
                         keyframe_mask: Optional[np.ndarray] = None,
                         ) -> Optional[str]:
    """C++ RLE NDJSON serialization for one chunk; None → Python path.

    ``carry`` is updated in place (buffered event + prev column + keyframe
    state) so consecutive chunks — and the Python end-of-stream flush —
    continue byte-identically.  When ``keyframe_mask`` is given it overrides
    the interval rule (the batch path's precomputed schedule)."""
    lib = get_lib()
    if lib is None or sem.shape[0] > 32 or acc.shape[0] > 32:
        return None
    t = int(min(sem.shape[1], acc.shape[1]))
    # %.3f fixed-point formatting (and Python repr) diverge only beyond
    # ~1e15 ms timestamps (repr switches to exponent form at 1e16); no real
    # stream gets there, but guard anyway.
    if (fi_base + t) * frame_dur_ms >= 1e15:
        return None
    sem = np.ascontiguousarray(sem[:, :t], dtype=np.int32)
    acc = np.ascontiguousarray(acc[:, :t], dtype=np.int32)
    kf_arg = None
    if keyframe_mask is not None:
        kf = np.ascontiguousarray(keyframe_mask[:t], dtype=np.uint8)
        kf_arg = kf.ctypes.data_as(ctypes.c_char_p)
    out_len = ctypes.c_size_t()
    ptr = lib.serialize_rle_frames(
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sem.shape[0],
        acc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), acc.shape[0],
        t, float(frame_dur_ms), float(dur_rounded), int(fi_base),
        sem_rle_mask, acc_rle_mask, float(keyframe_interval_ms),
        kf_arg, ctypes.byref(carry), ctypes.byref(out_len))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value).decode()
    finally:
        lib.nat_free(ptr)


def serialize_dense_frames(sem: np.ndarray, acc: np.ndarray,
                           frame_dur_ms: float,
                           fi_base: int = 0) -> Optional[str]:
    """C++ dense-frame NDJSON serialization; None → use the Python path."""
    lib = get_lib()
    if lib is None:
        return None
    sem = np.ascontiguousarray(sem, dtype=np.int32)
    acc = np.ascontiguousarray(acc, dtype=np.int32)
    num_frames = int(min(sem.shape[1], acc.shape[1]))
    out_len = ctypes.c_size_t()
    ptr = lib.serialize_dense_frames(
        sem.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sem.shape[0],
        acc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), acc.shape[0],
        num_frames, float(frame_dur_ms), int(fi_base), ctypes.byref(out_len))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value).decode()
    finally:
        lib.nat_free(ptr)


def serialize_dense_frames_offset(sem: np.ndarray, acc: np.ndarray,
                                  frame_dur_ms: float,
                                  fi_base: int) -> Optional[str]:
    return serialize_dense_frames(sem, acc, frame_dur_ms, fi_base=fi_base)


def pcm_to_float_mono(data, bits: int, channels: int) -> Optional[np.ndarray]:
    """C++ PCM mixdown for 16/24-bit streams; None → Python path.

    ``data`` is any bytes-like object: memoryview payloads pass through
    zero-copy (long-file loads would otherwise duplicate the whole data
    chunk just to cross this boundary)."""
    lib = get_lib()
    if lib is None or bits not in (16, 24):
        return None
    bytes_per = bits // 8
    frames = len(data) // (bytes_per * channels)
    out = np.empty(frames, dtype=np.float32)
    fn = lib.pcm16_to_float_mono if bits == 16 else lib.pcm24_to_float_mono
    if isinstance(data, bytes):
        src = data
    else:  # buffer protocol, no copy
        src = (np.frombuffer(data, dtype=np.uint8)
               .ctypes.data_as(ctypes.c_char_p))
    n = fn(src, len(data), channels,
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:n]


def change_mask(codes: np.ndarray) -> Optional[np.ndarray]:
    """Per-frame changed-layer bitmask for RLE; None → numpy path."""
    lib = get_lib()
    if lib is None or codes.shape[0] > 32:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    out = np.empty(codes.shape[1], dtype=np.uint32)
    lib.change_mask(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    codes.shape[0], codes.shape[1],
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def _bind_flac(lib) -> None:
    lib.flac_decode_residual.restype = ctypes.c_int
    lib.flac_decode_residual.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    lib.flac_read_signed_array.restype = ctypes.c_int
    lib.flac_read_signed_array.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    lib.flac_restore_lpc.restype = None
    lib.flac_restore_lpc.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int]
    lib.flac_crc8.restype = ctypes.c_uint8
    lib.flac_crc8.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.flac_crc16.restype = ctypes.c_uint16
    lib.flac_crc16.argtypes = [ctypes.c_char_p, ctypes.c_int64]


def flac_decode_residual(data: bytes, bitpos: int, block_size: int,
                         order: int) -> Optional[tuple]:
    """C++ rice-residual decode → (int64 residual array, new bitpos)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(block_size - order, dtype=np.int64)
    pos = ctypes.c_int64(bitpos)
    rc = lib.flac_decode_residual(
        data, len(data), ctypes.byref(pos), block_size, order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError(f"FLAC residual decode failed ({rc})")
    return out, pos.value


def flac_read_signed_array(data: bytes, bitpos: int, count: int,
                           bits: int) -> Optional[tuple]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.int64)
    pos = ctypes.c_int64(bitpos)
    rc = lib.flac_read_signed_array(
        data, len(data), ctypes.byref(pos), count, bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError("FLAC bitstream truncated")
    return out, pos.value


def flac_restore_lpc(warmup: np.ndarray, residual: np.ndarray,
                     coeffs, shift: int) -> Optional[np.ndarray]:
    """Predictor restore (fixed = integer coeffs with shift 0)."""
    lib = get_lib()
    if lib is None:
        return None
    order = len(warmup)
    n = len(residual)
    samples = np.empty(order + n, dtype=np.int64)
    samples[:order] = warmup
    residual = np.ascontiguousarray(residual, dtype=np.int64)
    carr = np.ascontiguousarray(coeffs, dtype=np.int32)
    lib.flac_restore_lpc(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        residual.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        carr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), order, shift)
    return samples


def flac_crc8(data: bytes) -> Optional[int]:
    lib = get_lib()
    return int(lib.flac_crc8(data, len(data))) if lib else None


def flac_crc16(data: bytes) -> Optional[int]:
    lib = get_lib()
    return int(lib.flac_crc16(data, len(data))) if lib else None

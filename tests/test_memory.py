"""Host-memory bounds on long-file loads (VERDICT r4 #6).

The reference admits files up to a 10x-bytes heuristic
(`neural_audio_tokenizer.py:430-445`); nat-tpu instead bounds the loader
itself: decode writes straight into one preallocated float32 buffer (no
full-size astype/divide temporaries), the int16 sidecar is a zero-copy
view over the file bytes, and peak-normalize divides in place.  A 600 s
mono PCM16 WAV must load + normalize within ~3x its file size of extra
RSS (raw bytes pinned by the sidecar view + the 2x-raw float32 audio):
before the fix the same path peaked at ~5x (measured).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO_ROOT = Path(__file__).resolve().parent.parent

_PROBE = r"""
import os, resource, struct, sys
import numpy as np

path = sys.argv[1]
sr, seconds = 22050, 600
n = sr * seconds
if not os.path.exists(path):
    # Write the WAV in 10 s blocks so fixture creation itself never
    # holds a full-size array (it would mask the loader's peak).
    with open(path, "wb") as f:
        pcm_len = n * 2
        f.write(struct.pack(
            "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + pcm_len, b"WAVE",
            b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16, b"data", pcm_len))
        for b in range(60):
            t = (np.arange(sr * 10, dtype=np.float64) + b * sr * 10) / sr
            f.write((np.sin(2 * np.pi * 220.0 * t) * 0.5 * 32767.0)
                    .astype("<i2").tobytes())

raw = os.path.getsize(path)
from nat_tpu.io import audio as audio_io  # noqa: E402 (before baseline)

base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
audio, sr2, pcm16 = audio_io.load_audio_file_ex(path)
audio, div = audio_io.peak_normalize_ex(audio, inplace=True)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024

assert sr2 == sr and audio.size == n, (sr2, audio.size)
assert pcm16 is not None and div is not None, "sidecar must survive"
assert pcm16.base is not None, "sidecar must be a zero-copy view"
print(f"RATIO {(peak - base) / raw:.3f}")
"""


def test_long_file_load_peak_rss(tmp_path):
    """Extra RSS of load+normalize on a 600 s file stays under ~3x file
    size (raw bytes + float32 audio; no hidden full-size temporaries).

    Runs in a subprocess so ru_maxrss (a lifetime high-water mark) is not
    polluted by whatever earlier tests allocated."""
    wav = tmp_path / "long600.wav"
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE, str(wav)],
        capture_output=True, text=True, timeout=300, cwd=str(REPO_ROOT))
    assert proc.returncode == 0, proc.stderr[-2000:]
    ratio_lines = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("RATIO ")]
    assert ratio_lines, proc.stdout
    ratio = float(ratio_lines[-1].split()[1])
    # 3.0x expected (1x raw pinned by the sidecar view + 2x float32);
    # headroom for allocator slack.  The pre-fix loader measured 5.0x.
    assert ratio < 3.5, f"load path peaked at {ratio:.2f}x file bytes"

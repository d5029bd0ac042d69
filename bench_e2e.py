"""End-to-end product benchmark: CLI-path throughput.

Where ``bench.py`` measures the jitted forward alone, this measures what a
user actually gets: audio decode → chunk orchestration → dual-encoder
forward → incremental NDJSON serialization to /dev/null, via the same
``AudioTokenizationPipeline.stream_audio`` the CLI default path uses —
plus the data-parallel batch path over multiple files.

Prints one JSON line per measured path:
  {"metric": "e2e_stream_x_realtime", ...}
  {"metric": "e2e_batch_x_realtime", ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def _make_wav(path: str, seconds: float, sr: int, seed: int) -> None:
    from nat_tpu.io.audio import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    write_wav(path, x, sr)


def main() -> None:
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    sr = 22050
    seconds = 30.0
    n_files = 32  # one full MAX_ROWS batch for the dp/batched runner

    # Honest FLOPs: force the full wav2vec2-architecture semantic encoder
    # (random-init without a checkpoint), like bench.py.
    pipe = AudioTokenizationPipeline(
        model_config={"codebook_size": 4096, "semantic_arch": "wav2vec2"},
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    if pipe.compat_mode:
        print(json.dumps({"metric": "e2e_stream_x_realtime", "value": 0,
                          "unit": "x_realtime", "vs_baseline": 0,
                          "error": "neural path unavailable"}))
        return

    with tempfile.TemporaryDirectory() as tmp:
        paths = []
        for i in range(n_files):
            p = os.path.join(tmp, f"bench_{i}.wav")
            _make_wav(p, seconds, sr, i)
            paths.append(p)

        sink = open(os.devnull, "w")

        # Warm-up: compile the bucket graph + evaluator paths.
        pipe.stream_audio(paths[0], sink.write)

        # Path 1: single-file incremental streaming (the CLI default).
        start = time.perf_counter()
        pipe.stream_audio(paths[1], sink.write)
        stream_elapsed = time.perf_counter() - start
        stream_rtf = seconds / stream_elapsed

        # Path 2: batch tokenization (dp-sharded when >1 device; on one
        # chip a stacked [B, bucket] forward per group).  Warm up the
        # batched shape first — the steady-state number is the metric,
        # not the one-time XLA compile.
        pipe._tokenize_many(paths, want_features=False)
        start = time.perf_counter()
        prepared = pipe._tokenize_many(paths, want_features=False)
        errors = [p for p in prepared if isinstance(p, Exception)]
        batch_elapsed = time.perf_counter() - start
        batch_rtf = (n_files * seconds) / batch_elapsed

        # Path 3: the streaming daemon (FS-delimited multi-file pipe) —
        # per-file NDJSON streams, compiled forwards reused across files.
        import io

        n_daemon = 4
        blobs = [open(p, "rb").read() for p in paths[:n_daemon]]
        pipe_bytes = b"\x1c".join(blobs)
        start = time.perf_counter()
        pipe.stream_stdin(io.BytesIO(pipe_bytes), sink.write)
        daemon_elapsed = time.perf_counter() - start
        daemon_rtf = (n_daemon * seconds) / daemon_elapsed

    if errors:
        raise SystemExit(f"batch path failed: {errors[0]}")

    print(json.dumps({
        "metric": "e2e_stream_x_realtime",
        "value": round(stream_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(stream_rtf / 100.0, 3),
    }))
    print(json.dumps({
        "metric": "e2e_batch_x_realtime",
        "value": round(batch_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(batch_rtf / 100.0, 3),
    }))
    print(json.dumps({
        "metric": "e2e_daemon_x_realtime",
        "value": round(daemon_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(daemon_rtf / 100.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())

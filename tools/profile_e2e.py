#!/usr/bin/env python3
"""Host-side wall-time decomposition of the e2e streaming path.

``tools/bench_components.py`` decomposes the DEVICE forward; this
decomposes the PRODUCT path ``AudioTokenizationPipeline.stream_audio``
(what bench.py's e2e phase times) into its annotated host stages —
load/decode, sha256, dispatch (prepare+upload), device_get (fetch),
NDJSON serialization, evaluation — using the wall timers that
``nat_tpu.utils.profiling.annotate`` accumulates.

Prints one JSON object per run (warm run discarded by default).

Usage: python tools/profile_e2e.py [--seconds 600] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--group", type=int, default=0,
                    help="override NAT_TPU_STREAM_GROUP (0 = default)")
    args = ap.parse_args()
    if args.group:
        os.environ["NAT_TPU_STREAM_GROUP"] = str(args.group)

    from nat_tpu.io.audio import write_wav
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
    from nat_tpu.utils import profiling

    sr = 22050
    pipe = AudioTokenizationPipeline(
        model_config={"codebook_size": 4096, "semantic_arch": "wav2vec2"},
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * args.seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "profile_e2e.wav")
        write_wav(path, x, sr)
        sink = lambda line: None  # noqa: E731
        pipe.stream_audio(path, sink)          # warm (compiles)
        for run in range(args.runs):
            profiling.reset_timings()
            start = time.perf_counter()
            pipe.stream_audio(path, sink)
            wall = time.perf_counter() - start
            stages = {k: round(v, 4)
                      for k, v in sorted(profiling.stage_timings.items())}
            accounted = sum(
                v for k, v in profiling.stage_timings.items()
                if k in ("nat/load_audio", "nat/sha256", "nat/evaluate"))
            # tokenize contains dispatch/device_get/serialize; count the
            # outer bucket once for the unaccounted figure.
            accounted += profiling.stage_timings.get("nat/tokenize", 0.0)
            print(json.dumps({
                "run": run,
                "wall_s": round(wall, 4),
                "x_realtime": round(args.seconds / wall, 1),
                "stages_s": stages,
                "other_s": round(wall - accounted, 4),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

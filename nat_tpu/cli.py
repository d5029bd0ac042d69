"""Command-line interface.

Flag-compatible with the reference CLI (neural_audio_tokenizer.py:5234-5831;
man/neural_audio_tokenizer.1): same flag names, same default-mode
stdout/stderr discipline (stdout carries only NDJSON unless other formats are
requested; stderr is empty unless verbosity is raised), same input routing
(files, --stdin path lists with binary tolerance, piped raw bytes,
interactive read-to-EOF, ASCII-FS-delimited multi-file splitting), and the
same three execution cases (batch-to-dir, multi-file sequential streaming,
single file).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
from dataclasses import asdict
from pathlib import Path
from typing import Dict, List, Optional

from .io.stdinio import (chunks_to_temp_files, cleanup_temp_files,
                         has_piped_stdin, looks_like_text, read_stdin_bytes,
                         split_fs_chunks)
from .utils.logging import (LogLevel, StreamLock, configure_quiet_external,
                            logger, set_default_mode, set_log_level)
from .version import VERSION, VERSION_TAG

BANNER = f"Enhanced Neural Audio-to-LLM Tokenizer {VERSION_TAG} (TPU-native)"


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="nat-tpu",
        description=f"{BANNER} - MERT music-optimized codebook initialization",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  %(prog)s song.wav --output tokens.txt
  %(prog)s --stdin --format interleaved > tokens.txt
  %(prog)s *.wav --batch --output-dir results/ --format hierarchical
  %(prog)s song.wav --evaluate --metrics metrics.json
  %(prog)s song.wav --ndjson-streaming > tokens.ndjson
  %(prog)s song.wav --rle --encoding "S=rle,A=dense"
  %(prog)s song.wav --deterministic
  cat a.wav $'\\x1c' b.wav | %(prog)s > tokens.ndjson
        """,
    )

    # Input/Output
    parser.add_argument("input_files", nargs="*", help="Input audio files")
    parser.add_argument("--stdin", action="store_true",
                        help="Read file paths from stdin")
    parser.add_argument("--stream-stdin", action="store_true",
                        help="Tokenize piped WAV audio incrementally as "
                             "bytes arrive (frames emit before EOF; no "
                             "global peak normalization, header "
                             "audio_sha256 is null — raw digest lands in "
                             "end.stats)")
    parser.add_argument("--serve", metavar="ADDR",
                        help="Run as a long-lived tokenizer server on ADDR "
                             "(unix:/path, HOST:PORT, or :PORT). Each "
                             "connection speaks the --stream-stdin protocol: "
                             "client streams audio bytes (FS-delimited "
                             "multi-file ok), half-closes, reads NDJSON "
                             "back; frames emit before EOF")
    parser.add_argument("--health", metavar="ADDR",
                        help="Probe a --serve daemon at ADDR and print its "
                             "status JSON (uptime, connections, batching) "
                             "to stdout; exit 0 when healthy. Works "
                             "without the NAT_TPU_SERVE_AUTH token")
    parser.add_argument("--decode-tokens", action="store_true",
                        help="Inverse mode: treat inputs as lam_audio_tokens "
                             "NDJSON streams and decode them back to audio "
                             "(RVQ decode + reconstruction decoder); writes "
                             "WAV to --output or <stem>_decoded.wav")
    parser.add_argument("--output", "-o", help="Output file (default: stdout)")
    parser.add_argument("--output-dir", help="Output directory for all outputs mode")
    parser.add_argument("--all-outputs", action="store_true",
                        help="Generate all output formats")

    # Tokenization format
    parser.add_argument("--format", choices=["hierarchical", "interleaved", "structured"],
                        default="hierarchical", help="Token format (default: hierarchical)")
    parser.add_argument("--streaming", action="store_true",
                        help="Use streaming protocol output")
    parser.add_argument("--ndjson-streaming", action="store_true",
                        help="Use NDJSON streaming (LAM v0.1)")
    parser.add_argument("--rle", action="store_true",
                        help="Use RLE mode for more efficient NDJSON streaming")
    parser.add_argument("--chunk-size", type=int, default=8192,
                        help="Streaming chunk size")
    parser.add_argument("--model-id", default=f"tims-ears-{VERSION}.mert",
                        help="Model identifier for token semantics stability")

    # Advanced RLE and encoding options
    parser.add_argument("--keyframe-interval", type=float, default=5.0,
                        help="Keyframe interval in seconds for RLE mode (default: 5.0)")
    parser.add_argument("--encoding",
                        help='Per-layer encoding, e.g. "S0=rle,A0=dense" or "S=rle,A=dense"')
    parser.add_argument("--rle-semantic", action="store_true",
                        help="Force RLE encoding for all semantic layers")
    parser.add_argument("--dense-acoustic", action="store_true",
                        help="Force dense encoding for all acoustic layers")
    parser.add_argument("--no-legend", action="store_true",
                        help="Omit legend from NDJSON header to save tokens")

    # Codebook initialization
    parser.add_argument("--codebook-init",
                        choices=["mert", "encodec", "encodec-kmeans",
                                 "kmeans", "random"],
                        default="mert",
                        help="Codebook initialization method (default: mert)")
    parser.add_argument("--codebook-cache-dir",
                        help="Directory for codebook caching")
    parser.add_argument("--no-codebook-cache", action="store_true",
                        help="Disable codebook caching")
    parser.add_argument("--force-reinit-codebooks", action="store_true",
                        help="Force re-initialization of codebooks")

    # Reconstruction and legacy options
    parser.add_argument("--no-reconstruction", action="store_true",
                        help="Disable audio reconstruction decoder")
    parser.add_argument("--use-encodec", action="store_true",
                        help="DEPRECATED: use --codebook-init=encodec")
    parser.add_argument("--encodec-model", default="facebook/encodec_24khz",
                        help="Encodec model to use")

    # Time-base control (extension over the reference; see man page)
    parser.add_argument("--timebase", choices=["compat", "frame"],
                        default="compat",
                        help="Token time base: 'compat' reproduces the "
                             "reference (min of encoder stream rates, "
                             "dominated by the acoustic /16 conv stack); "
                             "'frame' emits at the header-advertised sr/hop "
                             "rate (default: compat)")

    # Deterministic mode
    parser.add_argument("--deterministic", action="store_true",
                        help="Enable deterministic mode for reproducible results")
    parser.add_argument("--seed", type=int, default=42,
                        help="Random seed for deterministic mode (default: 42)")
    parser.add_argument("--stochastic", action="store_true",
                        help="Sample tokens from a temperature softmax over "
                             "codebook distances (the reference's implicit "
                             "behavior) instead of argmin")
    parser.add_argument("--temperature", type=float, default=0.5,
                        help="Sampling temperature for --stochastic "
                             "(default: 0.5)")
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="Encoder compute precision (default: bfloat16 "
                             "on TPU, float32 on CPU)")

    # Audio processing
    parser.add_argument("--resample", type=int, nargs="?", const=22050, default=None,
                        help="Resample audio to specified Hz")
    parser.add_argument("--hop-length", type=int, default=512, help="STFT hop length")
    parser.add_argument("--n-mels", type=int, default=128, help="Number of mel bands")

    # Model architecture
    parser.add_argument("--semantic-dim", type=int, default=512,
                        help="Semantic feature dimension")
    parser.add_argument("--acoustic-dim", type=int, default=512,
                        help="Acoustic feature dimension")
    parser.add_argument("--codebook-size", type=int, default=4096,
                        help="Quantizer codebook size (default: 4096)")
    parser.add_argument("--num-quantizers", type=int, default=8,
                        help="Number of quantizer layers")

    # Deprecated audio options
    parser.add_argument("--sample-rate", type=int, default=22050,
                        help="DEPRECATED: use --resample instead")

    # Evaluation
    parser.add_argument("--evaluate", action="store_true",
                        help="Run comprehensive evaluation")
    parser.add_argument("--metrics", help="Output metrics to JSON file")
    parser.add_argument("--reconstruction", action="store_true",
                        help="DEPRECATED: reconstruction is on by default")
    parser.add_argument("--budget-report", action="store_true",
                        help="Show detailed token budget report")
    parser.add_argument("--seq-vis", action="store_true",
                        help="Sequential visualization generation (lower memory)")

    # Processing options
    parser.add_argument("--batch", action="store_true", help="Batch processing mode")
    parser.add_argument("--device", default="auto",
                        help="Processing device (auto/tpu/cpu)")
    parser.add_argument("--max-length", type=int,
                        help="Maximum audio length in samples")
    parser.add_argument("--compat-fallback", action="store_true",
                        help="Enable compatibility fallback mode")

    # Advanced options
    parser.add_argument("--model-path", help="Path to pre-trained model weights")
    parser.add_argument("--config", help="Model configuration JSON file")
    parser.add_argument(
        "--prewarm", nargs="?", const="default", metavar="SECONDS",
        help="Compile + cache the forward programs up front (the 30 s "
             "streaming bucket at batch rows [1] and [group], plus the "
             "first-frame ramp bucket) and exit, so no later run pays a "
             "cold compile. Optional comma-separated durations select "
             "other buckets, e.g. --prewarm 1,4,30")
    parser.add_argument(
        "--fetch", nargs="?", const="default", metavar="MODELS",
        help="Download pretrained checkpoints (sha256-verified) into the "
             "local HF cache and exit. Default set: wav2vec2-base, "
             "MERT-v1-95M, encodec_24khz; or a comma-separated repo list. "
             "Honors HF_ENDPOINT.")
    parser.add_argument(
        "--fetch-on-demand", action="store_true",
        help="Download missing checkpoints automatically before "
             "tokenizing (the reference's first-run behavior). Default "
             "is offline-first: missing checkpoints degrade to fallback "
             "encoders with a warning naming `nat --fetch`.")

    # Logging
    parser.add_argument("--log-level", choices=["DEBUG", "INFO", "WARN", "ERROR"],
                        default="WARN", help="Logging verbosity level (default: WARN)")
    parser.add_argument("--verbose", "-v", action="store_true",
                        help="Verbose output (equivalent to --log-level INFO)")
    return parser


def parse_encoding_spec(spec: Optional[str], num_quantizers: int) -> Optional[Dict[str, str]]:
    """Parse the per-layer encoding mini-DSL.

    Supports shorthand ``S=rle,A=dense`` (expanded over all layers) and
    explicit specs like ``S0=rle,S1=rle,A0=dense`` (reference 5412-5447).
    """
    if not spec:
        return None
    per_layer: Dict[str, str] = {}
    half = num_quantizers // 2
    for part in spec.split(","):
        if "=" not in part:
            continue
        name, enc = (s.strip() for s in part.split("=", 1))
        if enc not in ("rle", "dense"):
            continue
        if name in ("S", "A"):  # shorthand: apply to every layer of the group
            for i in range(half):
                per_layer[f"{name}{i}"] = enc
        else:
            per_layer[name] = enc
    return per_layer or None


def run_decode_tokens(args, pipeline, parser) -> int:
    """``--decode-tokens``: lam_audio_tokens NDJSON stream(s) → WAV.

    The inverse of the default mode — parses the stream with
    :func:`nat_tpu.stream.reader.parse_ndjson_stream`, decodes through the
    model's RVQ codebooks + reconstruction decoder (``decode_tokens``),
    applies the same DC-removal + tanh soft-limit post-processing the
    forward reconstruction gets, and writes one WAV per input stream.
    """
    import numpy as np

    from .io import audio as audio_io
    from .stream.reader import parse_ndjson_stream

    if pipeline.compat_mode:
        parser.error("--decode-tokens is unavailable in compat mode "
                     "(no decoder exists)")

    sources: List[tuple] = []  # (label, text, default_out)
    if args.input_files:
        for path in args.input_files:
            stem = Path(path).stem
            with open(path) as f:
                sources.append((path, f.read(), f"{stem}_decoded.wav"))
    elif has_piped_stdin():
        if not args.output:
            parser.error("--decode-tokens from stdin requires --output")
        sources.append(("<stdin>", sys.stdin.read(), None))
    else:
        parser.error("--decode-tokens needs NDJSON input files or a "
                     "piped stream")
    if args.output and len(sources) > 1:
        parser.error("--output with a single file only; omit it to get "
                     "per-input <stem>_decoded.wav files")

    tok = pipeline.tokenizer
    tok.ensure_initialized()
    for label, text, default_out in sources:
        ts = parse_ndjson_stream(text)
        if ts.num_frames == 0:
            parser.error(f"{label}: stream contains no token frames")
        n_sem, n_acc = ts.semantic.shape[0], ts.acoustic.shape[0]
        if (n_sem != tok.num_semantic_layers
                or n_acc != tok.num_acoustic_layers):
            parser.error(
                f"{label}: stream has {n_sem}+{n_acc} token layers but the "
                f"model expects {tok.num_semantic_layers}+"
                f"{tok.num_acoustic_layers} (match --num-quantizers)")
        hi = tok.codebook_size - 1
        if ts.semantic.max(initial=0) > hi or ts.acoustic.max(initial=0) > hi:
            logger.warn(f"{label}: token ids exceed codebook size "
                        f"{tok.codebook_size}; clipping (check "
                        "--codebook-size matches the encoder)")
        sem = np.clip(ts.semantic, 0, hi)
        acc = np.clip(ts.acoustic, 0, hi)

        recon = tok.decode_tokens(
            [sem[i][None, :] for i in range(n_sem)],
            [acc[i][None, :] for i in range(n_acc)]).reshape(-1)
        recon = recon - np.mean(recon)          # reference post-processing
        recon = np.tanh(recon * 0.95) * 0.95    # (5003-5009)

        sr = int(ts.header.get("sr", tok.sample_rate))
        out_path = args.output or default_out
        audio_io.write_wav(out_path, recon.astype(np.float32), sr)
        logger.info(f"{label}: decoded {ts.num_frames} frames → {out_path} "
                    f"({len(recon) / sr:.2f}s @ {sr} Hz)")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    log_level = LogLevel(args.log_level)
    if args.verbose:
        log_level = LogLevel.INFO

    # Default mode: pure NDJSON on stdout, empty stderr (reference 5349-5372).
    default_mode = (
        not args.all_outputs
        and not args.evaluate
        and not args.budget_report
        and not args.verbose
        and args.log_level == "WARN"
        and not args.streaming
    )
    if not args.streaming and not args.ndjson_streaming:
        args.ndjson_streaming = True

    set_log_level(log_level)
    set_default_mode(default_mode)
    configure_quiet_external(default_mode)

    if args.sample_rate != 22050 and args.resample is None:
        logger.warn("--sample-rate is deprecated. Use --resample instead.")
    if args.reconstruction:
        logger.warn("--reconstruction is deprecated; reconstruction is enabled "
                    "by default. Use --no-reconstruction to disable.")

    logger.info(f"{BANNER} - MERT music-optimized codebook initialization")
    logger.debug(f"Log level: {log_level.value}; default mode: {default_mode}")

    # Provisioning mode: download checkpoints and exit (reference
    # self-provisions lazily on first run, 2320-2335/1988/2523-2543;
    # nat-tpu makes it an explicit, verified step).
    if args.fetch:
        from .io.fetch import FetchError, fetch_models

        # Provisioning is diagnostics-first, not an NDJSON stream: progress
        # and errors must reach stderr regardless of default-mode detection.
        set_default_mode(False)
        if log_level == LogLevel.WARN:
            set_log_level(LogLevel.INFO)
        models = (None if args.fetch in ("default", "all")
                  else [m.strip() for m in args.fetch.split(",") if m.strip()])
        try:
            fetched = fetch_models(models)
        except FetchError as exc:
            logger.error(str(exc))
            return 1
        for name, path in fetched.items():
            logger.stdout(f"{name}\t{path}")
        return 0

    # Opt-in first-run auto-provisioning (reference behavior, 2320-2335/
    # 1988): fetch whatever the requested configuration needs and is not
    # already local, then proceed.  Failure degrades exactly like an
    # offline run — fallback encoders plus the usual warning.
    if args.fetch_on_demand and not args.compat_fallback:
        from .io.fetch import FetchError, fetch_models
        from .quant.checkpoint_io import find_local_checkpoint

        wanted = ["facebook/wav2vec2-base"]
        if args.codebook_init == "mert":
            wanted.append("m-a-p/MERT-v1-95M")
        if (args.codebook_init in ("encodec", "encodec-kmeans")
                or args.use_encodec):
            wanted.append(args.encodec_model)
        missing = [m for m in wanted if find_local_checkpoint(m) is None]
        if missing:
            logger.info("--fetch-on-demand: provisioning "
                        + ", ".join(missing))
            try:
                fetch_models(missing)
            except FetchError as exc:
                logger.warn(f"--fetch-on-demand could not provision "
                            f"{', '.join(missing)} ({exc}); continuing "
                            "with fallback encoders")

    # Cheap flag validation BEFORE the (expensive) pipeline construction.
    if args.prewarm is not None:
        if (args.input_files or args.stdin or args.stream_stdin
                or args.batch or args.decode_tokens or args.serve):
            parser.error("--prewarm is a standalone maintenance mode "
                         "(no inputs or other modes)")
        if args.compat_fallback:
            parser.error("--prewarm needs the neural path "
                         "(drop --compat-fallback)")
        if args.prewarm == "default":
            # Bare --prewarm: prewarm_forwards' default shape set (30 s
            # bucket at rows [1]/[group] + the first-frame ramp bucket).
            prewarm_seconds = None
        else:
            try:
                prewarm_seconds = [float(s)
                                   for s in args.prewarm.split(",") if s]
            except ValueError:
                parser.error(f"--prewarm expects comma-separated seconds, "
                             f"got {args.prewarm!r}")
            if not prewarm_seconds:
                parser.error("--prewarm needs at least one duration")
    if args.decode_tokens and args.no_reconstruction:
        parser.error("--decode-tokens requires the reconstruction decoder "
                     "(drop --no-reconstruction)")
    if args.serve:
        if (args.input_files or args.stdin or args.stream_stdin
                or args.batch or args.decode_tokens):
            parser.error("--serve runs a standalone daemon (no file "
                         "arguments, --stdin, --stream-stdin, --batch, or "
                         "--decode-tokens)")
        from .runtime.server import parse_address

        try:
            parse_address(args.serve)
        except ValueError as exc:
            parser.error(str(exc))
    if args.health:
        # Standalone ops probe: no pipeline, no jax — must answer fast and
        # from any box that can reach the daemon socket.
        if (args.input_files or args.stdin or args.stream_stdin
                or args.batch or args.decode_tokens or args.serve):
            parser.error("--health is a standalone probe (no inputs or "
                         "other modes)")
        from .client import health as probe_health

        try:
            status = probe_health(args.health)
        except (OSError, ValueError) as exc:
            logger.error(f"health probe failed: {exc}")
            return 1
        logger.stdout(json.dumps(status))
        return 0 if status.get("status") == "ok" else 1

    # Model configuration: config file < CLI flags.
    model_config: Dict = {}
    if args.config:
        with open(args.config) as f:
            model_config = json.load(f)
    model_config.update({
        "semantic_dim": args.semantic_dim,
        "acoustic_dim": args.acoustic_dim,
        "codebook_size": args.codebook_size,
        "num_quantizers": args.num_quantizers,
        "n_mels": args.n_mels,
        "hop_length": args.hop_length,
    })

    resample_rate = None
    if args.resample is not None:
        resample_rate = args.resample if args.resample > 0 else 22050

    per_layer_encoding = parse_encoding_spec(args.encoding, args.num_quantizers)
    if args.rle_semantic or args.dense_acoustic:
        per_layer_encoding = per_layer_encoding or {}
        half = args.num_quantizers // 2
        if args.rle_semantic:
            per_layer_encoding.update({f"S{i}": "rle" for i in range(half)})
        if args.dense_acoustic:
            per_layer_encoding.update({f"A{i}": "dense" for i in range(half)})

    enable_reconstruction = not args.no_reconstruction
    codebook_init_method = args.codebook_init
    if args.use_encodec:
        logger.warn("--use-encodec is deprecated. Use --codebook-init=encodec.")
        codebook_init_method = "encodec"

    from .runtime.pipeline import AudioTokenizationPipeline

    pipeline = AudioTokenizationPipeline(
        sample_rate=args.sample_rate,
        model_config=model_config,
        device=args.device,
        enable_compat_fallback=args.compat_fallback,
        resample_rate=resample_rate,
        rle_mode=args.rle,
        model_id=args.model_id,
        per_layer_encoding=per_layer_encoding,
        keyframe_interval_seconds=args.keyframe_interval,
        include_legend=not args.no_legend,
        enable_reconstruction=enable_reconstruction,
        deterministic=args.deterministic,
        deterministic_seed=args.seed,
        codebook_cache_dir=args.codebook_cache_dir,
        enable_codebook_cache=not args.no_codebook_cache,
        force_reinit_codebooks=args.force_reinit_codebooks,
        codebook_init_method=codebook_init_method,
        encodec_model=args.encodec_model,
        max_length=args.max_length,
        model_path=args.model_path,
        timebase=args.timebase,
        stochastic=args.stochastic,
        temperature=args.temperature,
        compute_dtype=args.compute_dtype,
    )

    if args.prewarm is not None:
        # Maintenance mode: progress must be visible regardless of
        # default-mode detection (same rationale as --fetch).
        set_default_mode(False)
        if log_level == LogLevel.WARN:
            set_log_level(LogLevel.INFO)
        if pipeline.compat_mode:
            logger.error("Neural path unavailable; nothing to prewarm")
            return 1
        from .runtime.prewarm import prewarm_forwards

        done = prewarm_forwards(pipeline.tokenizer, pipeline.sample_rate,
                                seconds=prewarm_seconds)
        logger.info(f"Prewarm complete: {len(done)} forward program(s) "
                    "compiled/cached")
        return 0

    if args.decode_tokens:
        return run_decode_tokens(args, pipeline, parser)

    if args.serve:
        from .runtime.server import run_server

        return run_server(pipeline, args.serve)

    # -- input routing (reference 5482-5582) -------------------------------
    input_files: List[str] = []
    stdin_bytes: Optional[bytes] = None

    if args.stream_stdin:
        if args.input_files or args.stdin:
            parser.error("--stream-stdin reads piped audio only (no file "
                         "arguments / --stdin)")
        if not has_piped_stdin():
            parser.error("--stream-stdin requires audio piped on stdin")
        # Sniff before committing: WAV/AIFF/AU/FLAC streams decode
        # incrementally; anything else falls back to buffered stdin with
        # no bytes lost.
        from .io.stream_reader import (PrefixedStream, make_stream_reader,
                                       read_sniff)

        # First-available-block sniff: a greedy read(64K) would add up to
        # 64 KB of producer latency before the header even emits on a live
        # (real-time) pipe.
        head = read_sniff(sys.stdin.buffer)
        # iter_fs_streams drops leading FS separators itself; sniff past
        # them so FS-prefixed pipes still stream.
        if make_stream_reader(head.lstrip(b"\x1c")) is not None:
            pipeline.stream_stdin(PrefixedStream(head, sys.stdin.buffer),
                                  logger.stdout)
            return 0
        logger.warn("--stream-stdin: input is not an incrementally "
                    "decodable stream; falling back to buffered stdin")
        stdin_bytes = head + read_stdin_bytes()

    if args.stdin and stdin_bytes is None:
        raw = read_stdin_bytes()
        if looks_like_text(raw):
            text = raw.decode(errors="ignore")
            input_files = [ln.strip() for ln in text.splitlines() if ln.strip()]
            logger.debug(f"Read {len(input_files)} file paths from stdin")
        else:
            stdin_bytes = raw
            logger.debug(f"Read {len(stdin_bytes)} bytes from stdin (binary fallback)")
    elif stdin_bytes is None and has_piped_stdin():
        stdin_bytes = read_stdin_bytes()
        logger.debug(f"Read {len(stdin_bytes) if stdin_bytes else 0} bytes from stdin")

    if args.input_files:
        input_files.extend(args.input_files)

    if not input_files and stdin_bytes is None:
        logger.info("No input provided. Entering interactive mode...")
        logger.info("Paste/enter data, press Ctrl+D to process (Ctrl+C to cancel)")

        def _sigint(_signum, _frame):
            logger.info("Cancelled by user")
            sys.exit(0)

        signal.signal(signal.SIGINT, _sigint)
        try:
            stdin_bytes = read_stdin_bytes()
        except KeyboardInterrupt:
            logger.info("Cancelled by user")
            return 0
        except EOFError:
            stdin_bytes = b""

    if not input_files and not stdin_bytes:
        parser.error("No input provided. Specify input files as arguments, pipe "
                     "data to stdin, or use --stdin for file paths.")

    temp_files: List[str] = []
    if stdin_bytes:
        chunks = split_fs_chunks(stdin_bytes)
        logger.debug(f"Prepared {len(chunks)} chunk(s) from stdin (FS-aware)")
        temp_files = chunks_to_temp_files(chunks)
        input_files.extend(temp_files)

    try:
        return _execute(args, parser, pipeline, input_files,
                        default_mode, enable_reconstruction)
    finally:
        cleanup_temp_files(temp_files)


def _execute(args, parser, pipeline, input_files: List[str],
             default_mode: bool, enable_reconstruction: bool) -> int:
    multi_input = len(input_files) > 1

    # Case A: batch save-to-dir (explicit --all-outputs / --output-dir).
    # On a multi-host pod (or with NAT_TPU_PROCESS_INDEX/COUNT overrides)
    # each host processes a disjoint stride of the file list; metric
    # aggregates merge across hosts over DCN (parallel/fanout.py).
    if (args.batch or multi_input) and (args.all_outputs or args.output_dir):
        if not args.output_dir:
            parser.error("--output-dir is required when using --all-outputs "
                         "with multiple inputs")
        from .parallel import fanout

        proc_idx, proc_count = fanout.process_topology()
        local_files = fanout.shard_paths(input_files)
        if proc_count > 1:
            logger.info(f"Multi-host fan-out: host {proc_idx}/{proc_count} "
                        f"processing {len(local_files)}/{len(input_files)} "
                        "file(s)")
        results = pipeline.batch_process(
            local_files, args.output_dir, args.format,
            sequential_vis=args.seq_vis)
        successful = [r for r in results if "error" not in r]
        if args.metrics and (successful or proc_count > 1):
            from .eval.budget import TokenBudgetMetrics
            from .eval.metrics import TokenizationMetrics
            import dataclasses

            per_file = [{**asdict(r["metrics"]), **asdict(r["budget_metrics"])}
                        for r in successful]
            canonical = [f.name for f in
                         dataclasses.fields(TokenizationMetrics)
                         + dataclasses.fields(TokenBudgetMetrics)]
            merged = fanout.gather_stats(fanout.local_stats(per_file),
                                         keys=canonical)
            agg: Dict[str, float] = fanout.finalize_stats(merged)
            if agg and pipeline.compat_mode:
                agg["compat_mode"] = True
                agg["warning"] = ("Metrics from compatibility mode - tokens not "
                                  "from trained quantizers")
            if agg and proc_idx == 0:
                Path(args.metrics).write_text(json.dumps(agg, indent=2))
        return 0

    # Incremental emission applies when NDJSON goes straight to stdout and
    # no buffered artifacts are requested: frames stream out while later
    # chunks are still tokenizing (byte-identical to the buffered path).
    incremental = (args.ndjson_streaming and not args.streaming
                   and not args.output
                   and not (args.all_outputs and args.output_dir)
                   and args.format == "hierarchical"
                   and not args.metrics and not args.evaluate
                   and not args.budget_report)

    # Case B: multi-file streaming to stdout.  Non-incremental runs
    # tokenize all files first (data-parallel across local devices when
    # >1 device; see pipeline._tokenize_many), then serialize in order.
    if multi_input:
        prepared = (None if incremental
                    else pipeline._tokenize_many(input_files,
                                                 want_features=False))
        for file_idx, path in enumerate(input_files):
            if incremental:
                # No StreamLock here: stdout purity is guaranteed by the
                # logger routing (diagnostics never touch stdout), and
                # locking would silence stderr for the whole processing
                # phase, not just emission.
                pipeline.stream_audio(path, logger.stdout)
                continue
            prep = prepared[file_idx]
            if isinstance(prep, Exception):
                raise prep  # same contract as sequential: first failure aborts
            audio, sr, tok_result, encoding_time = prep
            result = pipeline.process_audio(
                path, output_format=args.format,
                enable_reconstruction=enable_reconstruction,
                streaming_mode=args.streaming,
                ndjson_streaming=args.ndjson_streaming,
                _preloaded=(audio, sr),
                _pretokenized=(tok_result, encoding_time))
            if args.ndjson_streaming and result["ndjson_output"]:
                output_text = result["ndjson_output"]
            elif args.streaming and result["streaming_output"]:
                output_text = result["streaming_output"]
            else:
                output_text = result["text_tokens"]
            if output_text is not None:
                if args.ndjson_streaming and not default_mode:
                    with StreamLock(lock_stderr=True):
                        logger.stdout(output_text)
                else:
                    logger.stdout(output_text)
        return 0

    # Case C: single input
    if incremental:
        # See Case B note: the logger already guarantees stdout purity.
        pipeline.stream_audio(input_files[0], logger.stdout)
        return 0

    result = pipeline.process_audio(
        input_files[0], output_format=args.format,
        enable_reconstruction=enable_reconstruction,
        streaming_mode=args.streaming,
        ndjson_streaming=args.ndjson_streaming,
        # Feature maps feed only the visualization/analysis exports below;
        # skip their device→host fetch on every other invocation.
        want_features=bool(args.all_outputs and args.output_dir))

    output_text: Optional[str] = None
    if args.all_outputs and args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        base = Path(input_files[0]).stem
        out = Path(args.output_dir)
        out.joinpath(f"{base}_tokens.txt").write_text(result["text_tokens"])
        out.joinpath(f"{base}_tokens.json").write_text(result["json_tokens"])
        if result["streaming_output"]:
            out.joinpath(f"{base}_stream.txt").write_text(result["streaming_output"])
        if result["ndjson_output"]:
            out.joinpath(f"{base}_tokens.ndjson").write_text(result["ndjson_output"])
        if result["reconstructed_audio"] is not None:
            from .io.audio import write_wav

            write_wav(str(out / f"{base}_reconstructed.wav"),
                      result["reconstructed_audio"],
                      result["metadata"]["sample_rate"])
        logger.progress("Generating visualizations...")
        try:
            from .eval.visualize import generate_visualizations

            viz = generate_visualizations(
                result["original_audio"], result["tokenizer_result"],
                args.output_dir, base,
                sample_rate=result["metadata"]["sample_rate"],
                sequential=args.seq_vis)
            logger.info(f"Generated {len(viz)} visualization files")
        except Exception as exc:
            logger.warn(f"Visualization failed: {exc}")
        logger.progress("Saving detailed analysis...")
        try:
            from .eval.analysis import save_detailed_analysis

            analysis = save_detailed_analysis(
                result["original_audio"], result["tokenizer_result"],
                result["metrics"], args.output_dir, base,
                sample_rate=result["metadata"]["sample_rate"])
            logger.info(f"Generated {len(analysis)} analysis files")
        except Exception as exc:
            logger.warn(f"Analysis export failed: {exc}")
        logger.info(f"All outputs saved to: {args.output_dir}")
    elif args.ndjson_streaming and result["ndjson_output"]:
        output_text = result["ndjson_output"]
    elif args.streaming and result["streaming_output"]:
        output_text = result["streaming_output"]
    else:
        output_text = result["text_tokens"]

    if args.output:
        if output_text is not None:
            Path(args.output).write_text(output_text)
    elif output_text is not None:
        if args.ndjson_streaming and not default_mode:
            with StreamLock(lock_stderr=True):
                logger.stdout(output_text)
        else:
            logger.stdout(output_text)

    if args.metrics:
        metrics_data = {
            **asdict(result["metrics"]),
            **asdict(result["budget_metrics"]),
        }
        if pipeline.compat_mode:
            metrics_data["compat_mode"] = True
            metrics_data["warning"] = ("Metrics from compatibility mode - tokens "
                                       "not from trained quantizers")
        Path(args.metrics).write_text(json.dumps(metrics_data, indent=2))

    if args.budget_report:
        b = result["budget_metrics"]
        logger.info("Token Budget Report:")
        logger.info(f"  Total Tokens: {b.total_tokens}")
        logger.info(f"  Semantic Tokens: {b.semantic_tokens}")
        logger.info(f"  Acoustic Tokens: {b.acoustic_tokens}")
        logger.info(f"  Audio Tokens/Second: {b.audio_tokens_per_second:.1f}")
        logger.info(f"  Audio Frames/Second: {b.audio_frames_per_second:.1f}")
        logger.info(f"  Processing Tokens/Second: {b.processing_tokens_per_second:.1f}")
        logger.info(f"  Processing Frames/Second: {b.processing_frames_per_second:.1f}")
        logger.info(f"  Compression Ratio: {b.compression_ratio:.1f}x")
        if pipeline.compat_mode:
            logger.warn("Compatibility mode - tokens are exploratory only")

    if args.evaluate:
        m = result["metrics"]
        logger.info("Evaluation Results:")
        logger.info(f"  Compression Ratio: {m.compression_ratio:.2f}x")
        logger.info(f"  Token Diversity: {m.token_diversity:.3f}")
        logger.info(f"  Semantic Entropy: {m.semantic_entropy:.3f}")
        logger.info(f"  Acoustic Entropy: {m.acoustic_entropy:.3f}")
        if enable_reconstruction and result["reconstructed_audio"] is not None:
            logger.info(f"  MSE Loss: {m.mse_loss:.6f}")
            logger.info(f"  Spectral Loss: {m.spectral_loss:.6f}")
            logger.info(f"  MR-STFT Loss: {m.mr_stft_loss:.6f}")
            logger.info(f"  Log Spectral Distance: {m.log_spectral_distance:.6f}")
            logger.info(f"  Pitch Accuracy: {m.pitch_accuracy:.3f}")
            logger.info(f"  Rhythm Accuracy: {m.rhythm_accuracy:.3f}")
            logger.info(f"  Timbral Similarity: {m.timbral_similarity:.3f}")
        if pipeline.compat_mode:
            logger.warn("Evaluation in compatibility mode - results are "
                        "exploratory only")
    return 0


def entrypoint() -> None:
    sys.exit(main())


if __name__ == "__main__":
    entrypoint()

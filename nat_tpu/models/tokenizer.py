"""The neural audio tokenizer: dual-encoder → dual-RVQ → token layers.

Counterpart of reference `NeuralAudioTokenizer` (neural_audio_tokenizer.py:
2927-3311), rebuilt as a functional JAX model:

* parameters are an explicit pytree created in :meth:`ensure_initialized`
  (no lazy init inside forward — codebook seeding, weight conversion, and
  compilation all happen in the init phase);
* the jitted forward is pure and static-shaped; host code buckets/pads the
  waveform (:mod:`nat_tpu.runtime.bucketing`) and slices valid frames out;
* both RVQ stacks run the fused Pallas kernel on TPU (argmin mode) or the
  XLA path (stochastic / CPU);
* time-base alignment preserves the reference's behavior by default
  (``timebase='compat'``: both streams interpolated to
  ``min(T_semantic, T_acoustic)``, which the acoustic /16 conv stack
  dominates — the documented frame-rate quirk, SURVEY.md §2.6), with
  ``timebase='frame'`` emitting tokens at the header-advertised
  ``sr/hop`` rate instead;
* long inputs are processed in fixed 30 s chunks and concatenated
  (SURVEY.md §5.7) so attention cost stays bounded and shapes static.
"""

from __future__ import annotations

import functools
import os
import threading
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.resample import resample_jax, resample_output_length
from ..dsp.stft import num_frames as stft_num_frames
from ..ops.interp import interp_linear
from ..quant import seeding
from ..quant.rvq import RVQState, rvq_decode, rvq_encode
from ..utils.logging import logger
from ..utils.profiling import annotate
from ..runtime.bucketing import bucket_length, chunk_spans
from .decoder import ReconstructionDecoder
from .encoders import MelResidualEncoder, MultiScaleTemporalEncoder
from .semantic import (SemanticAudioEncoder, SpectralFallbackEncoder,
                      feature_extractor_output_length,
                      load_pretrained_semantic_params)

SEMANTIC_SR = 16000

# Codebook-init methods that k-means features of the input audio (the
# reference's legacy EnCodec path, fixed and generalized).
FEATURE_INIT_METHODS = ("encodec-kmeans", "kmeans")


class SpanMeta(NamedTuple):
    """Geometry of one overlap-extended chunk span (see ``iter_chunks``)."""

    ext_start: int   # first sample of the extended span in the full signal
    start: int       # first sample the span is responsible for
    length: int      # samples the span is responsible for
    overlap: int     # overlap margin in samples (0 = single-span signal)
    sr: int
    ext_len: int     # true (pre-padding) extended-span length
    bucket: int      # padded bucket length


class _AotForwardDispatch:
    """Shape-specialized executable dispatch for one (sr, bucket) forward.

    The wrapped ``jax.jit`` function is the compile path; when the
    cross-process AOT executable cache is enabled
    (:mod:`nat_tpu.runtime.aotcache`), each batch shape resolves to a
    deserialized precompiled executable instead — skipping minutes of XLA
    compile on warm cold-starts.  Any cache failure falls back to the jit
    path transparently.
    """

    def __init__(self, jitted, config: Dict[str, Any]) -> None:
        self.jitted = jitted
        self.config = config
        self._compiled: Dict[tuple, Any] = {}
        self._seen_shapes: set = set()

    def _shape_desc(self, wave) -> str:
        bucket = self.config.get("bucket")
        what = self.config.get("program", "forward")
        where = f"{what} program (bucket={bucket}, rows={wave.shape[0]})" \
            if bucket else f"{what} program {tuple(wave.shape)}"
        return f"preparing {where}"

    def __call__(self, params, sem_rvq, acc_rvq, wave, rng):
        from ..runtime import aotcache
        from ..utils.heartbeat import heartbeat

        # Key on both data args: the forward varies in wave shape, the
        # decode program in both token-matrix shapes.
        shape = (tuple(wave.shape), tuple(getattr(rng, "shape", ())))
        first = shape not in self._seen_shapes
        self._seen_shapes.add(shape)
        if not aotcache.cache_enabled():
            if not first:
                return self.jitted(params, sem_rvq, acc_rvq, wave, rng)
            # First dispatch of this shape = trace + XLA compile inside the
            # call: minutes of silence on a cold accelerator without the
            # verbose heartbeat.
            with heartbeat(self._shape_desc(wave), announce=(
                    self._shape_desc(wave) + " — first run compiles "
                    "(can take minutes); subsequent runs reuse it "
                    "(tip: `nat --prewarm` pays this cost up front)")):
                return self.jitted(params, sem_rvq, acc_rvq, wave, rng)
        exe = self._compiled.get(shape)
        if exe is None:
            try:
                with heartbeat(self._shape_desc(wave), announce=(
                        self._shape_desc(wave) + " — loading the cached "
                        "executable, or compiling on a cold cache (minutes; "
                        "cached for subsequent runs — `nat --prewarm` pays "
                        "this up front)")):
                    exe = aotcache.load_or_compile(
                        self.jitted, self.config,
                        (params, sem_rvq, acc_rvq, wave, rng))
            except Exception as exc:
                from ..utils.logging import logger

                logger.debug(f"AOT path failed ({exc}); using jit")
                exe = self.jitted
            self._compiled[shape] = exe
        return exe(params, sem_rvq, acc_rvq, wave, rng)


def _locked(fn):
    """Serialize tokenizer-mutating entry points (init, seeding, span
    dispatch) on ``self._device_lock`` so concurrent serving sessions
    (runtime/server.py) can share one tokenizer: the RNG split, the lazy
    compile caches, and codebook seeding are the only mutable state, and
    each is confined to a decorated method.  Reentrant — dispatch paths
    call each other — and free when uncontended (single-session CLI)."""
    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._device_lock:
            return fn(self, *args, **kwargs)
    return wrapper


class NeuralAudioTokenizer:
    """Dual-path neural tokenizer with explicit init / pure forward."""

    def __init__(
        self,
        sample_rate: int = 22050,
        semantic_dim: int = 512,
        acoustic_dim: int = 512,
        codebook_size: int = 4096,
        num_quantizers: int = 8,
        n_mels: int = 128,
        hop_length: int = 512,
        enable_reconstruction: bool = True,
        codebook_init_method: str = "mert",
        encodec_model: str = "facebook/encodec_24khz",
        codebook_cache_dir: Optional[str] = None,
        enable_codebook_cache: bool = True,
        force_reinit_codebooks: bool = False,
        deterministic: bool = True,
        seed: int = 42,
        stochastic: bool = False,
        temperature: float = 0.5,
        timebase: str = "compat",
        use_pretrained_semantic: bool = True,
        semantic_arch: str = "auto",
        use_pallas: Optional[bool] = None,
        compute_dtype: Optional[str] = None,
        semantic_arch_config: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.semantic_dim = semantic_dim
        self.acoustic_dim = acoustic_dim
        self.codebook_size = codebook_size
        self.num_quantizers = num_quantizers
        # Both groups get num_quantizers//2 layers (reference 2996-3002):
        # an odd count rounds DOWN on both sides so the pipeline/NDJSON
        # header layer counts always match the emitted token layers.
        self.num_semantic_layers = num_quantizers // 2
        self.num_acoustic_layers = num_quantizers // 2
        self.n_mels = n_mels
        self.hop_length = hop_length
        self.enable_reconstruction = enable_reconstruction
        self.codebook_init_method = codebook_init_method
        self.encodec_model = encodec_model
        self.codebook_cache_dir = codebook_cache_dir
        self.enable_codebook_cache = enable_codebook_cache
        self.force_reinit_codebooks = force_reinit_codebooks
        self.deterministic = deterministic
        self.seed = seed
        self.stochastic = stochastic
        self.temperature = temperature
        self.timebase = timebase
        self.use_pretrained_semantic = use_pretrained_semantic
        # semantic_arch: "auto" = wav2vec2 when a checkpoint is available,
        # else spectral fallback; "wav2vec2" = full transformer regardless
        # (random-init without a checkpoint — honest-FLOPs benchmarking);
        # "spectral" = force the light fallback.
        self.semantic_arch = semantic_arch
        # Optional Wav2Vec2Encoder size overrides (hidden/num_layers/...);
        # None = the base config every real checkpoint uses.  Lets sharding
        # dryruns compile a structurally identical tiny transformer.
        self.semantic_arch_config = semantic_arch_config
        on_accelerator = any(d.platform not in ("cpu",) for d in jax.devices())
        if use_pallas is None:
            use_pallas = on_accelerator
        # The fused kernel covers argmin AND in-kernel Gumbel sampling, but
        # its PRNG primitive only lowers on real TPUs.
        self.use_pallas = use_pallas and (
            not stochastic or on_accelerator)
        # bf16 compute on the MXU roughly doubles encoder throughput; params
        # stay float32 and RVQ distances are always float32, so only feature
        # values (not token determinism within a config) are affected.
        if compute_dtype is None:
            compute_dtype = "bfloat16" if on_accelerator else "float32"
        self.compute_dtype = compute_dtype
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

        # Modules (architecture only; params live in self.params)
        self.mel_encoder = MelResidualEncoder(
            output_dim=acoustic_dim, n_mels=n_mels, hop_length=hop_length,
            sample_rate=sample_rate, dtype=dtype)
        self.temporal_semantic = MultiScaleTemporalEncoder(
            input_dim=semantic_dim, dtype=dtype)
        self.temporal_acoustic = MultiScaleTemporalEncoder(
            input_dim=acoustic_dim, dtype=dtype)
        self.decoder = ReconstructionDecoder()
        self.semantic_encoder: Any = None   # chosen in ensure_initialized
        self.semantic_fallback = False

        self.params: Optional[Dict] = None
        self.sem_rvq: Optional[RVQState] = None
        self.acc_rvq: Optional[RVQState] = None
        self._forward_cache: Dict[Any, Any] = {}
        self._decode_jit = None  # jitted decode_tokens (lazy)
        self._pcm16_cvt = None   # jitted int16-wire converter (lazy)
        self._pcm16_table_cache: Dict[Any, Any] = {}  # device conv tables
        self._needs_audio_seeding = False
        self._rng = jax.random.PRNGKey(seed)
        self._device_lock = threading.RLock()
        self._first_fetch_done = False

    # ------------------------------------------------------------------
    # Initialization phase
    # ------------------------------------------------------------------
    def _init_cache_config(self, use_w2v2: bool) -> Dict[str, Any]:
        """Everything the init params depend on (for the param cache key)."""
        return dict(
            seed=self.seed, sample_rate=self.sample_rate,
            semantic_dim=self.semantic_dim, acoustic_dim=self.acoustic_dim,
            n_mels=self.n_mels, hop_length=self.hop_length,
            reconstruction=self.enable_reconstruction,
            compute_dtype=self.compute_dtype,
            arch="wav2vec2" if use_w2v2 else "spectral",
            arch_config=self.semantic_arch_config,
        )

    def _build_semantic_encoder(self, use_w2v2: bool) -> None:
        if use_w2v2:
            self.semantic_encoder = SemanticAudioEncoder(
                output_dim=self.semantic_dim,
                dtype=(jnp.bfloat16 if self.compute_dtype == "bfloat16"
                       else jnp.float32),
                arch=self.semantic_arch_config)
        else:
            self.semantic_encoder = SpectralFallbackEncoder(
                output_dim=self.semantic_dim)
            self.semantic_fallback = True

    @_locked
    def ensure_initialized(self) -> None:
        if self.params is not None:
            return
        from ..utils.warmup import start_backend_warmup

        # Overlap the backend's first-use handshake (tens of seconds on
        # tunneled drivers) with the host-side init work below.
        start_backend_warmup()

        # Cheap architecture resolution: checkpoint *presence* decides the
        # encoder (parsing/conversion happens only on a param-cache miss).
        from ..runtime import paramcache

        ckpt_path = None
        if self.semantic_arch != "spectral" and self.use_pretrained_semantic:
            try:
                from ..quant import checkpoint_io

                ckpt_path = checkpoint_io.find_local_checkpoint(
                    "facebook/wav2vec2-base")
            except Exception:
                ckpt_path = None
        predicted_w2v2 = (
            self.semantic_arch == "wav2vec2"
            or (self.semantic_arch == "auto" and ckpt_path is not None))

        cache_key = None
        if paramcache.cache_enabled():
            cache_key = paramcache.params_key(
                self._init_cache_config(predicted_w2v2),
                paramcache.checkpoint_identity(ckpt_path))
            cached = paramcache.load_params(cache_key)
            if cached is not None:
                self._build_semantic_encoder(predicted_w2v2)
                if predicted_w2v2 and ckpt_path is not None:
                    logger.info("Semantic encoder: pretrained wav2vec2-base "
                                "weights (cached init)")
                elif predicted_w2v2:
                    logger.warn("Semantic encoder: wav2vec2 architecture "
                                "with random-init weights (no checkpoint "
                                "available — run `nat --fetch` once on a "
                                "networked machine to install it)")
                elif (self.semantic_arch == "auto"
                      and self.use_pretrained_semantic):
                    logger.warn("wav2vec2 checkpoint unavailable; using "
                                "spectral fallback semantic encoder (run "
                                "`nat --fetch` once on a networked machine "
                                "for real semantic tokens)")
                # device_put: cached params are host numpy; left as-is,
                # EVERY jitted forward would re-upload the full pytree
                # (~430 MB for wav2vec2-base — measured 9 s/call through
                # the tunneled backend vs 0.09 s with device-resident
                # params).  Transfer once here instead.
                self.params = jax.device_put(cached)
                self._seed_initial_codebooks()
                return

        rng = jax.random.PRNGKey(self.seed)
        r_mel, r_sem, r_ts, r_ta, r_dec, r_fb = jax.random.split(rng, 6)
        # Minimal init shapes: params are shape-independent of the time axis,
        # and jitting each init compiles one program instead of dozens of
        # eager per-op programs (init was ~30× slower unjitted).
        init_samples = max(4 * 2048, 8192)
        dummy = jnp.zeros((1, init_samples), dtype=jnp.float32)
        dummy16 = jnp.zeros(
            (1, resample_output_length(init_samples, self.sample_rate,
                                       SEMANTIC_SR)), dtype=jnp.float32)

        params: Dict[str, Any] = {}
        params["mel_encoder"] = jax.jit(self.mel_encoder.init)(
            r_mel, dummy)["params"]

        pretrained = None
        if self.semantic_arch != "spectral" and self.use_pretrained_semantic:
            pretrained = load_pretrained_semantic_params()
        use_w2v2 = (self.semantic_arch == "wav2vec2"
                    or (self.semantic_arch == "auto" and pretrained is not None))
        self._build_semantic_encoder(use_w2v2)
        if use_w2v2:
            init_params = jax.jit(self.semantic_encoder.init)(
                r_sem, dummy16)["params"]
            if pretrained is not None:
                init_params.update(pretrained)
                logger.info("Semantic encoder: pretrained wav2vec2-base weights")
            else:
                logger.warn("Semantic encoder: wav2vec2 architecture with "
                            "random-init weights (no checkpoint available — "
                            "run `nat --fetch` once on a networked machine "
                            "to install it)")
            params["semantic_encoder"] = init_params
        else:
            if self.semantic_arch == "auto" and self.use_pretrained_semantic:
                logger.warn("wav2vec2 checkpoint unavailable; using spectral "
                            "fallback semantic encoder (run `nat --fetch` "
                            "once on a networked machine for real semantic "
                            "tokens)")
            params["semantic_encoder"] = jax.jit(self.semantic_encoder.init)(
                r_fb, dummy16)["params"]

        t_dummy = jnp.zeros((1, 64, self.semantic_dim), dtype=jnp.float32)
        params["temporal_semantic"] = jax.jit(self.temporal_semantic.init)(
            r_ts, t_dummy)["params"]
        params["temporal_acoustic"] = jax.jit(self.temporal_acoustic.init)(
            r_ta, t_dummy)["params"]
        if self.enable_reconstruction:
            d_dummy = jnp.zeros(
                (1, 64, self.semantic_dim + self.acoustic_dim), jnp.float32)
            params["decoder"] = jax.jit(
                self.decoder.init, static_argnums=2)(
                    r_dec, d_dummy, 256)["params"]
        # device_put: jit-init leaves are already device-resident (no-op),
        # but checkpoint-converted pretrained weights are host numpy and
        # must not be re-uploaded on every forward call.
        self.params = jax.device_put(params)
        if cache_key is not None and use_w2v2 == predicted_w2v2:
            paramcache.save_params(cache_key, params)
        self._seed_initial_codebooks()

    def _seed_initial_codebooks(self) -> None:
        # Codebook seeding (explicit, cached; reference seeds 42 / 123).
        # Feature-driven methods ("encodec-kmeans", "kmeans") need input
        # audio: probe the cache here, defer actual seeding to the first
        # maybe_seed_from_audio call (reference does this lazily inside
        # forward, 3210-3214; our init stays explicit).
        if self.codebook_init_method in FEATURE_INIT_METHODS:
            cached = self._load_cached_feature_codebooks()
            if cached is not None:
                sem_cb, acc_cb = cached
            else:
                self._needs_audio_seeding = True
                sem_cb = self._random_codebooks(
                    self.num_semantic_layers, self.semantic_dim, self.seed)
                acc_cb = self._random_codebooks(
                    self.num_acoustic_layers, self.acoustic_dim,
                    self.seed + 81)
        else:
            common = dict(
                method=self.codebook_init_method,
                model_name=(self.encodec_model
                            if self.codebook_init_method == "encodec"
                            else None),
                codebook_size=self.codebook_size,
                cache_dir=self.codebook_cache_dir,
                use_cache=self.enable_codebook_cache,
                force_reinit=self.force_reinit_codebooks,
            )
            sem_cb = seeding.seed_codebooks(
                extraction_type="semantic",
                num_layers=self.num_semantic_layers,
                input_dim=self.semantic_dim, seed=self.seed, **common)
            acc_cb = seeding.seed_codebooks(
                extraction_type="acoustic",
                num_layers=self.num_acoustic_layers,
                input_dim=self.acoustic_dim, seed=self.seed + 81, **common)
        self._set_codebooks(sem_cb, acc_cb)

    def _set_codebooks(self, sem_cb, acc_cb) -> None:
        self.sem_rvq = RVQState(
            jnp.asarray(sem_cb), jnp.zeros(sem_cb.shape[:2]),
            jnp.asarray(sem_cb).copy())
        self.acc_rvq = RVQState(
            jnp.asarray(acc_cb), jnp.zeros(acc_cb.shape[:2]),
            jnp.asarray(acc_cb).copy())

    def _random_codebooks(self, num_layers: int, dim: int,
                          seed: int) -> np.ndarray:
        cb = np.empty((num_layers, self.codebook_size, dim), np.float32)
        for i in range(num_layers):
            cb[i] = np.random.default_rng(seed + i * 123).standard_normal(
                (self.codebook_size, dim)).astype(np.float32)
        return cb

    def _feature_seed_kwargs(self, extraction_type: str) -> Dict[str, Any]:
        sem = extraction_type == "semantic"
        return dict(
            method=self.codebook_init_method,
            extraction_type=extraction_type,
            num_layers=(self.num_semantic_layers if sem
                        else self.num_acoustic_layers),
            codebook_size=self.codebook_size,
            input_dim=self.semantic_dim if sem else self.acoustic_dim,
            seed=self.seed if sem else self.seed + 81,
            cache_dir=self.codebook_cache_dir,
            use_cache=self.enable_codebook_cache,
            force_reinit=self.force_reinit_codebooks,
        )

    def _load_cached_feature_codebooks(self):
        """Cache-only probe (no writes) for the feature-driven methods."""
        from ..quant import cache as cb_cache

        if not self.enable_codebook_cache or self.force_reinit_codebooks:
            return None
        cache_dir = (Path(self.codebook_cache_dir) if self.codebook_cache_dir
                     else cb_cache.get_default_codebook_cache_dir())
        out = []
        for extraction_type in ("semantic", "acoustic"):
            kw = self._feature_seed_kwargs(extraction_type)
            key = cb_cache.get_codebook_cache_key(
                f"{kw['method']}_nat-tpu", kw["codebook_size"],
                kw["num_layers"], kw["input_dim"], extraction_type)
            cached = cb_cache.load_codebooks(
                cache_dir, key, expect_shape=(
                    kw["num_layers"], kw["codebook_size"], kw["input_dim"]))
            if cached is None:
                return None
            out.append(cached[0])
        return tuple(out)

    # ------------------------------------------------------------------
    # Feature-driven seeding (needs input audio)
    # ------------------------------------------------------------------
    @_locked
    def maybe_seed_from_audio(self, audio, sample_rate: int) -> None:
        """Seed codebooks by k-means over features of the *input audio* —
        the working version of the reference's legacy EnCodec init
        (crashes upstream, :3126; here: EnCodec latents via the JAX bridge
        for 'encodec-kmeans', or this model's own encoder features for
        'kmeans').  No-op unless a feature method is configured and the
        cache missed at init."""
        if not getattr(self, "_needs_audio_seeding", False):
            return
        self.ensure_initialized()
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        sr = sample_rate or self.sample_rate
        # Window: 30 s for the EnCodec bridge (bounds its compile), up to
        # 4×30 s for 'kmeans' — the acoustic feature rate after the /16
        # strided convs is only ~2.7 rows/s; longer audio rides the same
        # 30 s bucket batched on the leading axis, and the stride-phase
        # augmentation below multiplies the acoustic row count up to 16×
        # when the codebook still outnumbers the rows.
        max_samples = int(30.0 * sr)
        if self.codebook_init_method == "kmeans":
            # 8×30 s of SPREAD coverage: semantic features run at ~50
            # rows/s, so 240 s gives ~12k rows (≥3 per cluster of a
            # 4096-way codebook) instead of the 1.5/cluster a 4×30 s
            # head window provided.  Crucially the chunks are sampled
            # evenly across the WHOLE file, not its first minutes: on
            # evolving content (sweeps, movements) a head-only codebook
            # never sees the later feature regions and the stream's
            # token diversity collapses exactly where the content goes
            # somewhere new.
            max_samples *= 8
            if len(audio) > max_samples:
                chunk = int(30.0 * sr)
                starts = np.linspace(
                    0, len(audio) - chunk, max_samples // chunk)
                audio = np.concatenate(
                    [audio[int(s):int(s) + chunk] for s in starts])
        audio = audio[:max_samples]

        if self.codebook_init_method == "encodec-kmeans":
            from .encodec import EncodecFeatureBridge

            bridge = EncodecFeatureBridge(self.encodec_model)
            if not bridge.available:
                logger.warn("encodec-kmeans init requested but no local "
                            "EnCodec checkpoint; keeping deterministic "
                            "random codebooks")
                self._needs_audio_seeding = False
                return
            feats = bridge.extract_features_for_initialization(audio, sr)
            f_sem = f_acc = feats
        else:  # "kmeans": cluster in the quantizer's OWN feature space
            # Features are the temporal-encoder outputs — exactly what the
            # RVQs see at inference (minus time-alignment, which doesn't
            # change the per-frame vectors' distribution).  Clustering in
            # the true space, unwhitened, is what makes the centroids
            # usable as codebooks; the reference clusters whitened
            # foreign-space (EnCodec) features and its feature-seeded
            # codebooks collapse at inference.
            #
            # Long audio rides as BATCHED rows of one bucket shape; each
            # row's padding frames are trimmed with the exact per-stream
            # frame arithmetic so silence padding never skews the
            # clusters.
            bucket = bucket_length(min(len(audio), int(30.0 * sr)), sr)
            n_rows = max(1, -(-len(audio) // bucket))
            wave_np = np.zeros((n_rows, bucket), np.float32)
            fills = []
            for i in range(n_rows):
                row = audio[i * bucket:(i + 1) * bucket]
                wave_np[i, :len(row)] = row
                fills.append(len(row))
            wave = jnp.asarray(wave_np)

            # Acoustic features come out of the mel encoder's four
            # stride-2 convs at 1/16th the mel frame rate (~2.7 rows/s) —
            # far too few rows to seed a 4096-way codebook from minutes
            # of audio.  The /16 grid has 16 distinct phases: shifting
            # the waveform by whole mel hops re-bins the same audio into
            # new stride windows, so each shift is a genuine sample of
            # the inference-time feature distribution (span boundaries
            # place real streams at arbitrary grid phases), not a
            # jittered replica.  Batch as many phases as the codebook
            # needs (≤16) through one mel+temporal apply.
            frames_per_row = [self._acoustic_frames(f) for f in fills]
            rows_per_pass = max(1, sum(frames_per_row))
            n_shift = int(min(16, max(
                1, -(-self.codebook_size // rows_per_pass))))
            if n_shift > 1:
                acc_in = jnp.asarray(np.concatenate(
                    [np.roll(wave_np, -s * self.hop_length, axis=1)
                     for s in range(n_shift)], axis=0))
            else:
                acc_in = wave
            acc_f = self.mel_encoder.apply(
                {"params": self.params["mel_encoder"]}, acc_in)
            acc_f = self.temporal_acoustic.apply(
                {"params": self.params["temporal_acoustic"]}, acc_f)
            wave16 = resample_jax(wave, sr, SEMANTIC_SR)
            sem_f = self.semantic_encoder.apply(
                {"params": self.params["semantic_encoder"]}, wave16)
            sem_f = self.temporal_semantic.apply(
                {"params": self.params["temporal_semantic"]}, sem_f)
            sem_np = np.asarray(sem_f, np.float32)
            acc_np = np.asarray(acc_f, np.float32)
            f_sem = np.concatenate([
                sem_np[i, :min(self._semantic_frames(fills[i], sr),
                               sem_np.shape[1])]
                for i in range(n_rows)], axis=0)
            acc_parts = []
            for s in range(n_shift):
                for i in range(n_rows):
                    # Shifted content [s·hop, fill) lands at [0, fill−s·hop);
                    # the roll wraps head samples into the tail, so one
                    # trailing post-/16 frame (16 mel frames ≫ the STFT
                    # window half-width) is dropped as a purity guard.
                    valid = self._acoustic_frames(
                        max(fills[i] - s * self.hop_length, 0))
                    if s:
                        valid -= 1
                    if valid > 0:
                        acc_parts.append(
                            acc_np[s * n_rows + i,
                                   :min(valid, acc_np.shape[1])])
            f_acc = np.concatenate(acc_parts, axis=0)

        whiten = self.codebook_init_method != "kmeans"
        sem_cb = seeding.seed_codebooks(
            features=f_sem, whiten_features=whiten,
            **self._feature_seed_kwargs("semantic"))
        acc_cb = seeding.seed_codebooks(
            features=f_acc, whiten_features=whiten,
            **self._feature_seed_kwargs("acoustic"))
        self._set_codebooks(sem_cb, acc_cb)
        self._needs_audio_seeding = False
        logger.info(f"Codebooks seeded from input audio "
                    f"({self.codebook_init_method})")

    # ------------------------------------------------------------------
    # Shape arithmetic (host-side, exact)
    # ------------------------------------------------------------------
    def _acoustic_frames(self, samples: int) -> int:
        t_mel = stft_num_frames(samples, 2048, self.hop_length, center=True)
        return -(-t_mel // 16)  # four stride-2 convs with SAME padding

    def _semantic_frames(self, samples: int,
                         sample_rate: Optional[int] = None) -> int:
        sr = sample_rate or self.sample_rate
        t16 = resample_output_length(samples, sr, SEMANTIC_SR)
        if self.semantic_fallback:
            return t16 // 320 + 1
        conv_layers = (self.semantic_arch_config or {}).get("conv_layers")
        if conv_layers is not None:
            return feature_extractor_output_length(t16, conv_layers)
        return feature_extractor_output_length(t16)

    def _target_frames(self, samples: int,
                       sample_rate: Optional[int] = None) -> int:
        if self.timebase == "frame":
            return max(samples // self.hop_length, 1)
        return max(min(self._semantic_frames(samples, sample_rate),
                       self._acoustic_frames(samples)), 1)

    def _mel_encoder_for(self, sample_rate: int):
        """Mel encoder retuned to ``sample_rate`` (params are SR-independent;
        only the constant filterbank changes)."""
        if sample_rate == self.sample_rate:
            return self.mel_encoder
        return MelResidualEncoder(
            output_dim=self.acoustic_dim, n_mels=self.n_mels,
            hop_length=self.hop_length, sample_rate=sample_rate,
            dtype=(jnp.bfloat16 if self.compute_dtype == "bfloat16"
                   else jnp.float32))

    # ------------------------------------------------------------------
    # Jitted forward (per bucket length)
    # ------------------------------------------------------------------
    def _build_forward(self, bucket: int, sample_rate: Optional[int] = None):
        sr = sample_rate or self.sample_rate
        t_target = self._target_frames(bucket, sr)
        out_samples = t_target * self.hop_length
        reconstruct = self.enable_reconstruction
        stochastic = self.stochastic
        use_pallas = self.use_pallas
        mel_encoder = self._mel_encoder_for(sr)

        # DSP precision follows the compute dtype (see MelResidualEncoder).
        dsp_precision = (jax.lax.Precision.DEFAULT
                         if self.compute_dtype == "bfloat16"
                         else jax.lax.Precision.HIGHEST)

        @jax.jit
        def forward(params, sem_rvq: RVQState, acc_rvq: RVQState,
                    waveform: jnp.ndarray, rng: jax.Array):
            wave16 = resample_jax(waveform, sr, SEMANTIC_SR,
                                  precision=dsp_precision)
            sem_feats = self.semantic_encoder.apply(
                {"params": params["semantic_encoder"]}, wave16)  # [B, Ts, D]
            acc_feats = mel_encoder.apply(
                {"params": params["mel_encoder"]}, waveform)     # [B, Ta, D]

            sem_feats = self.temporal_semantic.apply(
                {"params": params["temporal_semantic"]}, sem_feats)
            acc_feats = self.temporal_acoustic.apply(
                {"params": params["temporal_acoustic"]}, acc_feats)

            # Align both streams to the target time base ([B, T, D] →
            # interpolate along T via the channel-last transpose trick).
            def align(f):
                return jnp.swapaxes(
                    interp_linear(jnp.swapaxes(f, 1, 2), t_target), 1, 2)

            sem_a, acc_a = align(sem_feats), align(acc_feats)

            rng_s, rng_a = jax.random.split(rng)
            if use_pallas:
                from ..ops.rvq_pallas import rvq_encode_pallas

                if stochastic:
                    temp = self.temperature
                    seed_s = jax.random.randint(rng_s, (), 0, 2**31 - 1)
                    seed_a = jax.random.randint(rng_a, (), 0, 2**31 - 1)
                else:
                    temp, seed_s, seed_a = None, None, None
                sem_codes, sem_q, sem_losses = rvq_encode_pallas(
                    sem_rvq, sem_a, temperature=temp, seed=seed_s,
                    per_row=True)
                acc_codes, acc_q, acc_losses = rvq_encode_pallas(
                    acc_rvq, acc_a, temperature=temp, seed=seed_a,
                    per_row=True)
            else:
                sem_codes, sem_q, sem_losses = rvq_encode(
                    sem_rvq, sem_a, temperature=self.temperature,
                    stochastic=stochastic, rng=rng_s, per_row=True)
                acc_codes, acc_q, acc_losses = rvq_encode(
                    acc_rvq, acc_a, temperature=self.temperature,
                    stochastic=stochastic, rng=rng_a, per_row=True)
            # Losses are per-ROW [B] vectors: batched span groups are
            # independent rows, so a batch-mean would mix spans and count
            # the zero-padding rows (grouped vs sequential runs of the
            # same input would then report different losses).  finalize
            # slices each span's own row.
            losses = {
                "semantic_vq_loss": sem_losses["total_vq_loss"],
                "acoustic_vq_loss": acc_losses["total_vq_loss"],
                "total_vq_loss": (sem_losses["total_vq_loss"]
                                  + acc_losses["total_vq_loss"]),
            }

            # Token IDs travel device→host on every streamed group; int16
            # halves those bytes (tunnelled backends are transfer-bound).
            # Lossless whenever the codebook fits — IDs are < codebook_size.
            if self.codebook_size <= 32767:
                sem_codes = sem_codes.astype(jnp.int16)
                acc_codes = acc_codes.astype(jnp.int16)

            reconstructed = None
            if reconstruct:
                joint = jnp.concatenate([sem_q, acc_q], axis=-1)
                reconstructed = self.decoder.apply(
                    {"params": params["decoder"]}, joint, out_samples)
                recon_loss = jnp.mean(
                    (reconstructed - waveform[:, :out_samples]) ** 2,
                    axis=1)                                       # [B]
                losses = dict(losses, reconstruction_loss=recon_loss)

            return {
                "semantic_codes": sem_codes,      # [N, B, Tt]
                "acoustic_codes": acc_codes,
                "semantic_features": jnp.swapaxes(sem_a, 1, 2),  # [B, D, Tt]
                "acoustic_features": jnp.swapaxes(acc_a, 1, 2),
                "reconstructed": reconstructed,
                "losses": losses,
            }

        return forward, t_target

    def _aot_config(self, sr: int, bucket: int) -> Dict[str, Any]:
        """Everything the compiled forward depends on beyond arg shapes
        (cache key input for :mod:`nat_tpu.runtime.aotcache`)."""
        return dict(
            sr=sr, bucket=bucket, sample_rate=self.sample_rate,
            semantic_dim=self.semantic_dim, acoustic_dim=self.acoustic_dim,
            n_mels=self.n_mels, hop_length=self.hop_length,
            reconstruction=self.enable_reconstruction,
            timebase=self.timebase, stochastic=self.stochastic,
            temperature=self.temperature, use_pallas=self.use_pallas,
            compute_dtype=self.compute_dtype,
            arch=type(self.semantic_encoder).__name__,
            arch_config=self.semantic_arch_config,
        )

    def _forward_for(self, bucket: int, sample_rate: Optional[int] = None):
        key = (sample_rate or self.sample_rate, bucket)
        if key not in self._forward_cache:
            fwd, t_target = self._build_forward(bucket, key[0])
            self._forward_cache[key] = (
                _AotForwardDispatch(fwd, self._aot_config(key[0], bucket)),
                t_target)
        return self._forward_cache[key]

    # ------------------------------------------------------------------
    # Public host API (reference-shaped result dict)
    # ------------------------------------------------------------------
    def iter_chunks(self, waveform, actual_sample_rate: Optional[int] = None,
                    want_features: bool = True, pcm16_hint=None):
        """Tokenize incrementally: yields one dict per chunk with
        ``semantic_codes``/``acoustic_codes`` ``[N, B, t]``, optional
        ``reconstructed`` ``[B, samples]``, ``losses``, and features.

        This is the streaming producer: consumers can serialize each chunk's
        frames while later chunks are still on the device.

        ``want_features=False`` skips the device→host fetch of the
        ``[B, D, Tt]`` feature maps (tens of MB per span group — dwarfs the
        token payload; on a remote-tunnel backend the transfer dominates the
        whole forward).  Token/loss outputs are unaffected; feature entries
        come back ``None``.
        """
        self.ensure_initialized()
        wave = np.atleast_2d(np.asarray(waveform, dtype=np.float32))
        # Non-mutating SR handling: graphs are cached per (sr, bucket), so
        # alternating-SR inputs reuse their compiled programs instead of
        # thrashing the cache (and tokenizer state stays order-independent).
        sr = actual_sample_rate or self.sample_rate

        total = wave.shape[-1]
        # Overlap-discard margins (SURVEY.md §5.7): extend each interior
        # chunk by ~1 s of real neighbor audio so conv receptive fields and
        # center padding see true context, then keep only the frames whose
        # centers fall inside the chunk's own span.  Spans partition the
        # signal, so every frame is kept exactly once.  chunk_spans reserves
        # the margin so extended chunks still fit the largest bucket.
        #
        # Dispatch is pipelined with lookahead 1: span k+1 is enqueued on
        # the device BEFORE span k's tokens are fetched/serialized, so host
        # serialization overlaps device compute (JAX dispatch is async; the
        # fetch in finalize_span is the only synchronization point).
        overlap = int(sr)
        spans = chunk_spans(total, sr, overlap=overlap)
        if len(spans) == 1:
            overlap = 0

        # Span-group batching: after the first span (kept single for
        # first-frame latency), consecutive same-bucket spans are stacked
        # into ONE padded [G, bucket] forward call.  Long files thus pay
        # per-dispatch tunnel/host overhead once per GROUP instead of once
        # per span — the single-file streaming path approaches the batched
        # forward's throughput.  Rows are independent (batch-elementwise
        # programs; asserted byte-identical to sequential in
        # tests/test_streaming_emission.py), zero rows pad the tail group
        # to the next power of two ≤ G, bounding program shapes per bucket
        # at log2(G)+2 (all AOT-cached) without shipping whole zero
        # buckets over the wire.  Argmin mode only: stochastic mode keeps
        # the per-span rng stream.
        group_size = self._stream_group_size()
        if self.stochastic or wave.shape[0] != 1:
            group_size = 1
        plan = self._plan_span_groups(spans, overlap, sr, total, group_size)

        # int16 wire transport: when the wave is provably PCM16-derived
        # (dsp/pcm.py recovers the exact integers + divisor and the device
        # conversion is proven bitwise-exact), spans ride the link at half
        # the bytes — uploads dominate chunked tokenization on
        # bandwidth-limited backends.  Token streams are bit-identical.
        src, divisor = wave, None
        with annotate("nat/pcm16_wire"):
            wire = self._pcm16_wire(wave, hint=pcm16_hint)
        if wire is not None:
            src, divisor = wire

        # Dispatch lookahead: keep up to N dispatched items in flight
        # before blocking on the oldest one's fetch.  Depth 2 (vs round
        # 3's 1) keeps a program queued behind the running one even while
        # the host is blocked in device_get + serialization, so the
        # device never idles between groups (VERDICT r3 #4).
        #
        # Upload double-buffering (VERDICT r4 #2): host prep + host→device
        # copy of item k+1 runs on a dedicated uploader thread WHILE item
        # k computes on the device and the main thread serializes item
        # k-lookahead.  On tunneled backends ``device_put`` blocks until
        # the bytes cross the link (H2D ≈ 52 MB/s measured), so without
        # the thread every upload serializes with both compute and fetch.
        lookahead = self._stream_lookahead()
        stage_ahead = self._stage_ahead()
        pending: List[Any] = []  # ('single'|'group', raw output, meta(s))
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        uploader = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="nat-upload")
        try:
            staged: deque = deque()
            plan_iter = iter(plan)

            def submit_next() -> bool:
                item = next(plan_iter, None)
                if item is None:
                    return False
                staged.append(uploader.submit(
                    self._stage_plan_item, item, src, divisor, overlap,
                    sr, total, group_size))
                return True

            for _ in range(1 + stage_ahead):
                if not submit_next():
                    break
            while staged:
                kind, dev, meta = staged.popleft().result()
                with annotate("nat/dispatch"):
                    dispatched = (kind,
                                  self._dispatch_staged(kind, dev, meta),
                                  meta)
                submit_next()
                # Start the device→host copies NOW (async, ordered after
                # the compute): by finalize time the token arrays are
                # already on the wire instead of starting their round
                # trip there.
                self._prefetch_outputs(dispatched[1], want_features)
                pending.append(dispatched)
                while len(pending) > lookahead:
                    # Coalesced fetch: pop the forced oldest item plus
                    # every further pending item the device has ALREADY
                    # computed — one device_get round trip instead of one
                    # per item.  On tunnelled backends per-fetch latency
                    # rivals the payload itself, and compute typically
                    # runs ahead of transfers; coalescing only takes
                    # items whose results exist, so no frame waits on a
                    # later group's compute.
                    batch = [pending.pop(0)]
                    while pending and self._outputs_ready(pending[0][1]):
                        batch.append(pending.pop(0))
                    yield from self._finalize_plan_items(batch,
                                                         want_features)
            if pending:
                # End of stream: everything left is due now — one fetch.
                yield from self._finalize_plan_items(pending, want_features)
        finally:
            uploader.shutdown(wait=True, cancel_futures=True)

    @staticmethod
    def _outputs_ready(out) -> bool:
        """True when a dispatched forward's results exist on device (or are
        host arrays already).  Used only as a coalescing heuristic."""
        leaf = out.get("semantic_codes")
        ready = getattr(leaf, "is_ready", None)
        if ready is None:
            return True
        try:
            return bool(ready())
        except Exception:
            return True

    def _fetch_tree(self, out: Dict, want_features: bool) -> Dict:
        """The leaves finalize will need, as one pytree (device or host)."""
        keys = ["semantic_codes", "acoustic_codes", "reconstructed"]
        if want_features:
            keys += ["semantic_features", "acoustic_features"]
        return {**{k: out.get(k) for k in keys}, "losses": out["losses"]}

    def _finalize_plan_items(self, items, want_features: bool = True):
        if len(items) > 1:
            reqs = [self._fetch_tree(out, want_features)
                    for _, out, _ in items]
            fetched = self._device_get(reqs)
            items = [(kind, dict(out, **host), meta)
                     for (kind, out, meta), host in zip(items, fetched)]
        for item in items:
            yield from self._finalize_plan_item(item, want_features)

    def _finalize_plan_item(self, item, want_features: bool = True):
        kind, out, meta = item
        if kind == "single":
            yield self.finalize_span(out, meta, want_features=want_features)
        else:
            yield from self.finalize_span_group(out, meta,
                                                want_features=want_features)

    def _stream_lookahead(self) -> int:
        """Dispatched-but-unfetched items kept in flight on the chunked
        streaming path (NAT_TPU_STREAM_LOOKAHEAD overrides; min 1)."""
        env = os.environ.get("NAT_TPU_STREAM_LOOKAHEAD")
        if env:
            try:
                return max(1, int(env))
            except ValueError:
                pass
        return 2

    def _stage_ahead(self) -> int:
        """Plan items staged (host-prepped + uploaded) beyond the one
        being dispatched (NAT_TPU_STREAM_STAGE_AHEAD overrides; min 1).
        Depth 2 keeps one upload in flight behind the staged-and-ready
        item, so a fetch stall on the main thread never starves the
        uploader.  Each staged item holds one [G, bucket] f32 buffer on
        device (~46 MB at G=8/30 s/22.05 kHz) — depth stays small."""
        env = os.environ.get("NAT_TPU_STREAM_STAGE_AHEAD")
        if env:
            try:
                return max(1, int(env))
            except ValueError:
                pass
        return 2

    def _stage_plan_item(self, item, src, pcm_divisor, overlap, sr,
                         total, group_size):
        """Host prep + host→device upload for ONE plan item, WITHOUT
        dispatching the forward.  Runs on the uploader thread (see
        ``iter_chunks``), so it must not take the tokenizer lock or touch
        ``self._rng``; everything here is pure host math plus
        ``device_put``/the bit-exact int16→f32 device conversion.
        Returns ``('single', dev, SpanMeta)`` or
        ``('group', dev, List[SpanMeta])`` for :meth:`_dispatch_staged`.
        Prep math is identical to :meth:`dispatch_span` /
        :meth:`dispatch_prepared_group`, keeping the staged path
        byte-identical to the sequential one
        (tests/test_streaming_emission.py)."""
        if len(item) == 1:
            start, length = item[0]
            ext_start = max(0, start - overlap)
            ext_end = min(total, start + length + overlap)
            chunk, meta = self.prepare_span(src[:, ext_start:ext_end],
                                            ext_start, start, length,
                                            overlap, sr)
            return "single", self._to_device_f32(chunk, pcm_divisor), meta
        chunks, metas = [], []
        for start, length in item:
            ext_start = max(0, start - overlap)
            ext_end = min(total, start + length + overlap)
            chunk, meta = self.prepare_span(src[:, ext_start:ext_end],
                                            ext_start, start, length,
                                            overlap, sr)
            chunks.append(chunk)
            metas.append(meta)
        stacked = self._pad_group_rows(np.concatenate(chunks, axis=0),
                                       group_size)
        return "group", self._to_device_f32(stacked, pcm_divisor), metas

    @_locked
    def _dispatch_staged(self, kind, dev, meta):
        """Enqueue the forward for an already-uploaded plan item (main
        thread: owns the rng stream and the forward caches)."""
        metas = meta if kind == "group" else [meta]
        forward, _ = self._forward_for(metas[0].bucket, metas[0].sr)
        self._rng, rng = jax.random.split(self._rng)
        return forward(self.params, self.sem_rvq, self.acc_rvq, dev, rng)

    @staticmethod
    def _pad_group_rows(stacked: np.ndarray, group_size: int,
                        dp: Optional[int] = None) -> np.ndarray:
        """Pad a stacked [G, bucket] batch to the next power of two
        ≤ ``group_size`` (and to a ``dp`` multiple for sharded serving)
        rather than always to ``group_size``: zero rows ride the wire
        too, and a 3-span tail padded to 8 uploads 5 buckets of zeros.
        Program-shape count stays bounded at log2(G)+1 per bucket (all
        AOT-cached)."""
        target = 1
        while target < stacked.shape[0]:
            target *= 2
        target = min(target, max(group_size, 1))
        if dp is not None:                   # even dp shards
            target = -(-max(target, dp) // dp) * dp
        if stacked.shape[0] < target:
            stacked = np.pad(
                stacked, ((0, target - stacked.shape[0]), (0, 0)))
        return stacked

    def _prefetch_outputs(self, out: Dict, want_features: bool) -> None:
        """Enqueue async device→host copies for the leaves finalize will
        fetch.  ``copy_to_host_async`` is ordered after the producing
        compute, so this overlaps the transfer with the next group's
        dispatch/compute instead of serializing it inside device_get.
        Best-effort: arrays without the method (numpy, trace aborts) are
        skipped."""
        keys = ["semantic_codes", "acoustic_codes", "reconstructed"]
        if want_features:
            keys += ["semantic_features", "acoustic_features"]
        leaves = [out.get(k) for k in keys]
        losses = out.get("losses")
        if isinstance(losses, dict):
            leaves.extend(losses.values())
        with annotate("nat/prefetch"):
            for v in leaves:
                if v is not None and hasattr(v, "copy_to_host_async"):
                    try:
                        v.copy_to_host_async()
                    except Exception:
                        continue

    def _stream_group_size(self) -> int:
        """Spans per batched dispatch on the chunked streaming path.
        Default 8 on accelerators (dispatch-overhead amortization), 1 on
        CPU (padded rows are not free there); NAT_TPU_STREAM_GROUP
        overrides."""
        env = os.environ.get("NAT_TPU_STREAM_GROUP")
        if env:
            try:
                return max(1, int(env))
            except ValueError:
                pass
        try:
            if any(d.platform != "cpu" for d in jax.devices()):
                return 8
        except Exception:
            pass
        return 1

    @staticmethod
    def _plan_span_groups(spans, overlap, sr, total, group_size,
                          first_single: bool = True):
        """Partition spans into dispatch items: the first span alone (first
        frames reach the consumer after one single-row forward; skip with
        ``first_single=False`` when all data is already in hand), then runs
        of same-bucket spans in groups of ≤ ``group_size``; runs of one
        stay single-row (no padding waste, no extra program shape)."""
        def span_bucket(start, length):
            ext = (min(total, start + length + overlap)
                   - max(0, start - overlap))
            return bucket_length(ext, sr)

        items = []
        i = 0
        if first_single and group_size > 1 and len(spans) > 1:
            items.append([spans[0]])
            i = 1
        while i < len(spans):
            if group_size == 1:
                items.append([spans[i]])
                i += 1
                continue
            b = span_bucket(*spans[i])
            j = i
            while (j < len(spans) and j - i < group_size
                   and span_bucket(*spans[j]) == b):
                j += 1
            items.append(list(spans[i:j]) if j - i > 1 else [spans[i]])
            i = j
        return items

    def _pcm16_wire(self, wave: np.ndarray, hint=None):
        """int16 transport handle for PCM16-derived waves (see dsp/pcm.py);
        None = float32 transport.  Off on CPU backends (no wire to save)
        unless NAT_TPU_PCM16_WIRE=1 forces it; =0 disables everywhere.

        ``hint=(i16, divisor)`` — a loader-built sidecar (pipeline
        ``_load_audio_ex``) — skips the full-array recovery scan: it is
        probe-verified and used directly when it checks out."""
        env = os.environ.get("NAT_TPU_PCM16_WIRE")
        if env == "0":
            return None
        if env != "1":
            try:
                if all(d.platform == "cpu" for d in jax.devices()):
                    return None
            except Exception:
                return None
        from ..dsp import pcm

        if hint is not None:
            i16, divisor = hint
            i16 = np.atleast_2d(np.asarray(i16))
            if (i16.shape == wave.shape
                    and pcm.verify_hint(wave, i16, divisor)
                    and pcm.device_conversion_exact(divisor)):
                return i16, np.float32(divisor)
        rec = pcm.recover_pcm16(wave)
        if rec is None:
            return None
        if not pcm.device_conversion_exact(rec[1]):
            return None
        return rec

    def _pcm16_table(self, pcm_divisor, mesh=None):
        """Device-resident conversion table for one divisor (dsp/pcm.py
        conversion_table), uploaded once per (divisor, mesh) and reused by
        every chunk program — the gather reproduces host float32 bitwise
        on any backend."""
        from ..dsp import pcm

        key = (float(pcm_divisor),
               None if mesh is None else tuple(sorted(mesh.shape.items())))
        table = self._pcm16_table_cache.get(key)
        if table is None:
            host = pcm.conversion_table(np.float32(pcm_divisor))
            if mesh is None:
                table = jax.device_put(host)
            else:
                from ..parallel.mesh import replicated

                table = jax.device_put(host, replicated(mesh))
            if len(self._pcm16_table_cache) > 32:
                self._pcm16_table_cache.clear()
            self._pcm16_table_cache[key] = table
        return table

    def _to_device_f32(self, chunk: np.ndarray, pcm_divisor):
        """Upload one prepared chunk; int16 wire chunks are converted to
        the pipeline's exact float32 by a tiny device gather program."""
        dev = jnp.asarray(chunk)
        if chunk.dtype == np.int16:
            from ..dsp import pcm

            if self._pcm16_cvt is None:
                self._pcm16_cvt = jax.jit(pcm.convert_on_device)
            dev = self._pcm16_cvt(dev, self._pcm16_table(pcm_divisor))
        return dev

    @_locked
    def dispatch_span_group(self, wave, group, overlap, sr, total,
                            group_size, pcm_divisor=None):
        """Enqueue one batched forward over ``group``'s spans (all the same
        bucket; zero rows pad to ``group_size``).  Returns
        ``(raw_output, List[SpanMeta])`` for :meth:`finalize_span_group`."""
        chunks, metas = [], []
        for start, length in group:
            ext_start = max(0, start - overlap)
            ext_end = min(total, start + length + overlap)
            chunk, meta = self.prepare_span(wave[:, ext_start:ext_end],
                                            ext_start, start, length,
                                            overlap, sr)
            chunks.append(chunk)
            metas.append(meta)
        return self.dispatch_prepared_group(chunks, metas, group_size,
                                            pcm_divisor=pcm_divisor)

    @_locked
    def dispatch_prepared_group(self, chunks, metas, group_size,
                                pcm_divisor=None, mesh=None,
                                state_override=None):
        """Stack already-prepared [1, bucket] chunks (all the same bucket/sr,
        e.g. spans of one file or concurrent serving requests) into ONE
        padded batched forward.  Returns ``(raw_output, List[SpanMeta])``
        for :meth:`finalize_span_group`.

        ``mesh``: shard the batch dimension over the mesh's ``dp`` axis
        (multi-chip serving; rows pad to a dp multiple so the shard is
        even).  ``state_override`` supplies mesh-replicated
        ``(params, sem_rvq, acc_rvq)`` so single-device-committed state
        never mixes with a sharded batch."""
        stacked = self._pad_group_rows(
            np.concatenate(chunks, axis=0), group_size,
            dp=None if mesh is None else mesh.shape["dp"])
        forward, _ = self._forward_for(metas[0].bucket, metas[0].sr)
        self._rng, rng = jax.random.split(self._rng)
        params, sem_rvq, acc_rvq = (
            state_override if state_override is not None
            else (self.params, self.sem_rvq, self.acc_rvq))
        if mesh is None:
            dev = self._to_device_f32(stacked, pcm_divisor)
        else:
            from ..parallel.mesh import batch_sharding, replicated

            dev = jax.device_put(stacked, batch_sharding(mesh))
            if stacked.dtype == np.int16:
                from ..dsp import pcm

                if self._pcm16_cvt is None:
                    self._pcm16_cvt = jax.jit(pcm.convert_on_device)
                dev = self._pcm16_cvt(dev,
                                      self._pcm16_table(pcm_divisor, mesh))
            rng = jax.device_put(rng, replicated(mesh))
            # Sharded dispatch must bypass the AOT executable cache: its
            # entries are keyed/compiled from shape-only avals, so a
            # single-device executable (possibly prewarmed for this exact
            # shape) would reject dp-sharded inputs.  The raw jit path
            # retraces per input sharding and partitions correctly.
            if isinstance(forward, _AotForwardDispatch):
                forward = forward.jitted
        out = forward(params, sem_rvq, acc_rvq, dev, rng)
        return out, metas

    def _device_get(self, tree):
        """``jax.device_get`` with a verbose-mode heartbeat on the FIRST
        fetch: on tunneled backends the first host↔device round trip of a
        process can take minutes (handshake + remote compile completion),
        and it blocks here — not in the async dispatch."""
        if self._first_fetch_done:
            with annotate("nat/device_get"):
                return jax.device_get(tree)
        from ..utils.heartbeat import heartbeat

        with heartbeat(
                "waiting for first device results", announce=(
                    "waiting for first device results (a cold backend "
                    "handshake can take minutes; later fetches are fast)")):
            fetched = jax.device_get(tree)
        self._first_fetch_done = True
        return fetched

    @staticmethod
    def row_losses(losses: Dict, row: int) -> Dict[str, float]:
        """Slice one batch row's losses to floats.  Forward losses are
        per-ROW ``[B]`` vectors (batched spans are independent; a batch
        mean would mix spans and count zero-padding rows); scalars (e.g.
        compat paths) broadcast to every row."""
        out = {}
        for k, v in losses.items():
            a = np.asarray(v).reshape(-1)
            out[k] = float(a[row] if a.size > 1 else a[0])
        return out

    def finalize_span_group(self, out: Dict, metas: List["SpanMeta"],
                            want_features: bool = True):
        """Fetch one group's stacked outputs (single device→host transfer
        per key) and finalize each real row in span order.
        ``want_features=False`` leaves the feature maps on device (entries
        ``None``) — the big win for token-only consumers, since features
        are ~99% of a group's output bytes."""
        keys = ["semantic_codes", "acoustic_codes", "reconstructed"]
        if want_features:
            keys += ["semantic_features", "acoustic_features"]
        # One device_get over the whole group: async host copies start for
        # every leaf before the first blocking read, so the tunnel's
        # per-transfer latency is paid once, not once per key.
        fetched = self._device_get({**{k: out.get(k) for k in keys},
                                    "losses": out["losses"]})
        fetched.setdefault("semantic_features", None)
        fetched.setdefault("acoustic_features", None)
        losses = fetched.pop("losses")
        for g, meta in enumerate(metas):
            row = {
                "semantic_codes": fetched["semantic_codes"][:, g:g + 1],
                "acoustic_codes": fetched["acoustic_codes"][:, g:g + 1],
                "reconstructed": (None if fetched["reconstructed"] is None
                                  else fetched["reconstructed"][g:g + 1]),
                "losses": self.row_losses(losses, g),
                "semantic_features": (
                    None if fetched["semantic_features"] is None
                    else fetched["semantic_features"][g:g + 1]),
                "acoustic_features": (
                    None if fetched["acoustic_features"] is None
                    else fetched["acoustic_features"][g:g + 1]),
            }
            yield self.finalize_span(row, meta)

    def prepare_span(self, chunk: np.ndarray, ext_start: int, start: int,
                     length: int, overlap: int, sr: int):
        """Bucket-pad one overlap-extended span; returns
        ``(padded_chunk [B, bucket], SpanMeta)``.  Pure host-side prep —
        the data-parallel runner uses it to build cross-file batches whose
        rows are bit-identical to the sequential path's inputs."""
        chunk = np.atleast_2d(np.asarray(chunk))
        if chunk.dtype != np.int16:    # int16 = wire transport (dsp/pcm.py)
            chunk = chunk.astype(np.float32, copy=False)
        ext_len = chunk.shape[-1]
        bucket = bucket_length(ext_len, sr)
        if ext_len < bucket:
            chunk = np.pad(chunk, ((0, 0), (0, bucket - ext_len)))
        return chunk, SpanMeta(ext_start, start, length, overlap, sr,
                               ext_len, bucket)

    def finalize_span(self, out: Dict, meta: "SpanMeta",
                      want_features: bool = True) -> Dict:
        """Slice one span's raw forward output (host numpy arrays, shapes
        ``codes [N, B, Tt]`` / ``reconstructed [B, S]``) down to the frames
        whose centers fall inside the span's own extent.
        ``want_features=False`` skips fetching the feature maps."""
        # Single batched device_get (async copies overlap the tunnel's
        # per-transfer latency); rows arriving from finalize_span_group are
        # already numpy and pass through untouched.
        feat_keys = (("semantic_features", "acoustic_features")
                     if want_features else ())
        out = dict(out, **self._device_get(
            {k: out.get(k)
             for k in ("semantic_codes", "acoustic_codes", "reconstructed",
                       "losses", *feat_keys)}))
        valid_t = self._target_frames(meta.ext_len, meta.sr)
        sem = np.asarray(out["semantic_codes"])[:, :, :valid_t]
        acc = np.asarray(out["acoustic_codes"])[:, :, :valid_t]
        if meta.overlap:
            # Frame f covers samples centered at (f+0.5)*ext_len/valid_t
            # (relative to ext_start); keep centers inside [start, end).
            centers = meta.ext_start + (np.arange(valid_t) + 0.5) * (
                meta.ext_len / max(valid_t, 1))
            keep = (centers >= meta.start) & (centers < meta.start + meta.length)
            sem, acc = sem[:, :, keep], acc[:, :, keep]
        reconstructed = None
        if out.get("reconstructed") is not None:
            valid_samples = min(valid_t * self.hop_length, meta.ext_len)
            recon = np.asarray(out["reconstructed"])[:, :valid_samples]
            if meta.overlap:
                lo = meta.start - meta.ext_start
                recon = recon[:, lo:lo + meta.length]
            reconstructed = recon
        def _feat(key):
            f = out.get(key) if want_features else None
            return None if f is None else np.asarray(f)

        return {
            "semantic_codes": sem,
            "acoustic_codes": acc,
            "reconstructed": reconstructed,
            "losses": self.row_losses(out["losses"], 0),
            "semantic_features": _feat("semantic_features"),
            "acoustic_features": _feat("acoustic_features"),
        }

    @_locked
    def dispatch_span(self, chunk: np.ndarray, ext_start: int, start: int,
                      length: int, overlap: int, sr: int,
                      pcm_divisor=None):
        """Enqueue one span's forward on the device WITHOUT fetching;
        returns ``(raw_output, SpanMeta)`` for a later
        :meth:`finalize_span`.  JAX dispatch is asynchronous, so callers
        can overlap the device compute with host work (serialization of
        earlier spans, reading more input)."""
        chunk, meta = self.prepare_span(chunk, ext_start, start, length,
                                        overlap, sr)
        forward, _ = self._forward_for(meta.bucket, sr)
        self._rng, rng = jax.random.split(self._rng)
        out = forward(self.params, self.sem_rvq, self.acc_rvq,
                      self._to_device_f32(chunk, pcm_divisor), rng)
        return out, meta

    def tokenize_span(self, chunk: np.ndarray, ext_start: int, start: int,
                      length: int, overlap: int, sr: int,
                      want_features: bool = True, pcm_divisor=None) -> Dict:
        """Tokenize one overlap-extended span (``chunk`` = samples
        ``[ext_start : start+length+overlap]``); returns the per-chunk dict
        :meth:`iter_chunks` yields.  Also the building block of the
        streaming-stdin path, which produces spans incrementally."""
        return self.finalize_span(*self.dispatch_span(
            chunk, ext_start, start, length, overlap, sr,
            pcm_divisor=pcm_divisor),
            want_features=want_features)

    def __call__(self, waveform, actual_sample_rate: Optional[int] = None,
                 want_features: bool = True, pcm16_hint=None) -> Dict:
        sem_parts: List[np.ndarray] = []
        acc_parts: List[np.ndarray] = []
        recon_parts: List[np.ndarray] = []
        losses: Dict[str, float] = {}
        last_out: Dict = {"semantic_features": None, "acoustic_features": None}
        for out in self.iter_chunks(waveform, actual_sample_rate,
                                    want_features=want_features,
                                    pcm16_hint=pcm16_hint):
            sem_parts.append(out["semantic_codes"])
            acc_parts.append(out["acoustic_codes"])
            if out["reconstructed"] is not None:
                recon_parts.append(out["reconstructed"])
            losses = out["losses"]
            last_out = out

        sem_codes = np.concatenate(sem_parts, axis=-1)
        acc_codes = np.concatenate(acc_parts, axis=-1)
        reconstructed = (np.concatenate(recon_parts, axis=-1)
                         if recon_parts else None)
        t_total = sem_codes.shape[-1]
        return {
            "semantic_codes": [sem_codes[i] for i in range(sem_codes.shape[0])],
            "acoustic_codes": [acc_codes[i] for i in range(acc_codes.shape[0])],
            "losses": losses,
            "reconstructed": reconstructed,
            "semantic_features": last_out["semantic_features"],
            "acoustic_features": last_out["acoustic_features"],
            "num_frames": int(t_total),
        }

    def eval(self) -> "NeuralAudioTokenizer":
        return self

    # -- encode/decode API parity (reference 3291-3311) -----------------
    def encode(self, waveform, actual_sample_rate: Optional[int] = None) -> Dict:
        return self(waveform, actual_sample_rate)

    def decode_tokens(self, semantic_codes: List, acoustic_codes: List):
        """Token layers → waveform via RVQ decode + reconstruction decoder.

        Jitted (specialized per token-matrix shape): the decode is a chain
        of small ops whose eager per-op dispatch latency would dominate on
        a remote accelerator."""
        self.ensure_initialized()
        if not self.enable_reconstruction:
            raise ValueError("decode_tokens requires enable_reconstruction")
        if self._decode_jit is None:
            hop = self.hop_length

            @jax.jit
            def decode(params, sem_rvq, acc_rvq, sem, acc):
                sem_q = rvq_decode(sem_rvq, sem)
                acc_q = rvq_decode(acc_rvq, acc)
                joint = jnp.concatenate([sem_q, acc_q], axis=-1)
                return self.decoder.apply(
                    {"params": params["decoder"]}, joint,
                    sem.shape[-1] * hop)

            self._decode_jit = _AotForwardDispatch(
                decode, dict(self._aot_config(self.sample_rate, 0),
                             program="decode_tokens"))
        sem = jnp.stack([jnp.asarray(c) for c in semantic_codes])
        acc = jnp.stack([jnp.asarray(c) for c in acoustic_codes])
        return np.asarray(self._decode_jit(
            self.params, self.sem_rvq, self.acc_rvq, sem, acc))

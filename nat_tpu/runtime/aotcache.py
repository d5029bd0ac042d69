"""Cross-process AOT-compiled executable cache.

Cold-start killer: XLA compiles of the per-(sr, bucket) forward programs
dominate a fresh process's time-to-first-frame (minutes for the wav2vec2
path).  The generic JAX persistent compilation cache is unusable on this
project's driver backend (warm reads hang — see runtime/pipeline.py:41),
so nat-tpu serializes the compiled executables itself via
``jax.experimental.serialize_executable`` and reloads them with
``deserialize_and_load`` — measured ~0.5 s load + first dispatch vs
minutes of compile on the same backend.

Cache safety: the key hashes (a) the SOURCE of every module that defines
the forward computation — any code edit auto-invalidates, (b) the jax
version and backend platform/device kind, (c) the caller's config dict,
and (d) the flattened shapes/dtypes of the example arguments (batch size,
bucket length, parameter tree).  Any load/deserialize failure falls back
silently to the regular jit path (and rewrites the entry).

No reference counterpart (the reference has no compilation step); this is
TPU-native runtime infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from pathlib import Path
from typing import Any, Callable, Optional

from ..utils.logging import logger

# Modules whose source defines the traced forward computation.  Hashing
# their bytes auto-invalidates cached executables on any code change.
_SOURCE_MODULES = (
    "nat_tpu.models.tokenizer",
    "nat_tpu.models.encoders",
    "nat_tpu.models.semantic",
    "nat_tpu.models.decoder",
    "nat_tpu.models.encodec",
    "nat_tpu.quant.rvq",
    "nat_tpu.ops.rvq_pallas",
    "nat_tpu.ops.interp",
    "nat_tpu.dsp.stft",
    "nat_tpu.dsp.mel",
    "nat_tpu.dsp.resample",
)

_source_hash_cache: Optional[str] = None


def _source_hash() -> str:
    global _source_hash_cache
    if _source_hash_cache is None:
        import importlib

        h = hashlib.sha256()
        for name in _SOURCE_MODULES:
            try:
                mod = importlib.import_module(name)
                h.update(Path(mod.__file__).read_bytes())
            except Exception:
                h.update(name.encode())
        _source_hash_cache = h.hexdigest()[:16]
    return _source_hash_cache


def cache_enabled() -> bool:
    """Default: enabled on accelerator backends only (CPU compiles are
    cheap and tests run there); NAT_TPU_AOT_CACHE=1/0 overrides."""
    env = os.environ.get("NAT_TPU_AOT_CACHE")
    if env is not None:
        return env == "1"
    try:
        import jax

        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


def cache_dir() -> Path:
    env = os.environ.get("NAT_TPU_AOT_CACHE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "neural_audio_tokenizer" / "executables"


def _backend_tag() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}_{getattr(d, 'device_kind', '?')}_{jax.__version__}"


def executable_key(config: Any, example_args: Any) -> str:
    """Deterministic cache key for one compiled forward."""
    import jax

    h = hashlib.sha256()
    h.update(_source_hash().encode())
    h.update(_backend_tag().encode())
    h.update(repr(config).encode())
    leaves, treedef = jax.tree.flatten(example_args)
    h.update(str(treedef).encode())
    for leaf in leaves:
        h.update(f"{getattr(leaf, 'shape', ())}:"
                 f"{getattr(leaf, 'dtype', type(leaf).__name__)};".encode())
    return h.hexdigest()[:32]


def load(key: str) -> Optional[Callable]:
    """Deserialize a cached executable; None on miss or failure."""
    path = cache_dir() / f"{key}.natx"
    if not path.exists():
        return None
    try:
        from jax.experimental.serialize_executable import deserialize_and_load

        payload, in_tree, out_tree = pickle.loads(path.read_bytes())
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        logger.debug(f"AOT executable cache hit: {key}")
        return compiled
    except Exception as exc:
        logger.debug(f"AOT cache load failed for {key} "
                     f"({type(exc).__name__}: {exc}); recompiling")
        try:
            path.unlink()
        except OSError:
            pass
        return None


def compile_and_store(jitted: Callable, key: str, example_args: tuple,
                      store: bool = True) -> Callable:
    """AOT-compile ``jitted`` for ``example_args``' avals; serialize the
    executable to the cache (best-effort) and return it."""
    import jax

    avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_args)
    compiled = jitted.lower(*avals).compile()
    if store:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            d = cache_dir()
            d.mkdir(parents=True, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f,
                            protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, d / f"{key}.natx")
            logger.debug(f"AOT executable cached: {key} "
                         f"({len(payload) / 1e6:.1f} MB)")
        except Exception as exc:
            logger.debug(f"AOT cache store failed ({exc}); continuing")
    return compiled


def load_or_compile(jitted: Callable, config: Any,
                    example_args: tuple) -> Callable:
    """The one-call API: cached executable if present, else AOT-compile
    (and cache).  With caching disabled, returns ``jitted`` unchanged —
    the normal jit path compiles on first call."""
    if not cache_enabled():
        return jitted
    key = executable_key(config, example_args)
    compiled = load(key)
    if compiled is not None:
        return compiled
    return compile_and_store(jitted, key, example_args)

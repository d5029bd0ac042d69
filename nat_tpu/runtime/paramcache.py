"""Cross-process parameter-pytree cache.

``ensure_initialized`` spends tens of seconds compiling + running the flax
``init`` programs on the device (measured ~37 s on the driver backend) to
produce parameters that are fully determined by (seed, architecture,
checkpoint identity).  This cache persists the resulting pytree as numpy
arrays so warm processes skip every init jit: load + one device transfer
is ~1 s.  Callers MUST ``jax.device_put`` the restored tree before use —
jitted functions do NOT cache host→device transfers across calls, so
numpy params would re-upload the full tree (~430 MB for wav2vec2-base)
on every forward (measured 9 s/call through the tunneled backend).

Invalidation mirrors :mod:`nat_tpu.runtime.aotcache`: the key hashes the
model-defining module sources, the backend platform (init numerics can
differ slightly across backends), the full architecture config, and the
identity (path, size, mtime) of any pretrained checkpoint that was merged
into the init — so a checkpoint appearing on disk or any code change
re-initializes.  Load failures fall back silently to the normal init path.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

from ..utils.logging import logger


def cache_enabled() -> bool:
    env = os.environ.get("NAT_TPU_PARAM_CACHE")
    if env is not None:
        return env == "1"
    return True


def cache_dir() -> Path:
    env = os.environ.get("NAT_TPU_PARAM_CACHE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "neural_audio_tokenizer" / "params"


def checkpoint_identity(path: Optional[Path]) -> str:
    if path is None:
        return "none"
    try:
        st = path.stat()
        return f"{path}:{st.st_size}:{int(st.st_mtime)}"
    except OSError:
        return f"{path}:unstat"


def params_key(config: Dict[str, Any], ckpt_identity: str) -> str:
    from .aotcache import _backend_tag, _source_hash

    h = hashlib.sha256()
    h.update(_source_hash().encode())
    h.update(_backend_tag().encode())
    h.update(repr(sorted(config.items())).encode())
    h.update(ckpt_identity.encode())
    return h.hexdigest()[:32]


def load_params(key: str) -> Optional[Dict]:
    path = cache_dir() / f"{key}.pkl"
    if not path.exists():
        return None
    try:
        with open(path, "rb") as f:
            params = pickle.load(f)
        logger.debug(f"Param cache hit: {key}")
        return params
    except Exception as exc:
        logger.debug(f"Param cache load failed ({exc}); re-initializing")
        try:
            path.unlink()
        except OSError:
            pass
        return None


def save_params(key: str, params: Dict) -> None:
    try:
        import jax
        import numpy as np

        host = jax.tree.map(lambda x: np.asarray(x), params)
        d = cache_dir()
        d.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, d / f"{key}.pkl")
        logger.debug(f"Param cache stored: {key}")
    except Exception as exc:
        logger.debug(f"Param cache store failed ({exc}); continuing")

"""Codebook persistence (the framework's checkpoint subsystem).

Counterpart of reference neural_audio_tokenizer.py:457-606.  Native format is
``.npz`` (stacked arrays, no arbitrary-code unpickling); a compatibility
reader/writer handles the reference's ``.pkl`` layout (dict of per-layer
``codebooks``/``ema_counts``/``ema_weights`` lists + config, version '1.4')
so cached codebooks seeded by the reference tool can be reused directly.
Timestamped backups before forced reinit, and config verification on load.
"""

from __future__ import annotations

import datetime
import os
import pickle
import shutil
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..utils.logging import logger

CACHE_VERSION = "1.4"   # wire-compatible with the reference's pickle payload


def get_default_codebook_cache_dir() -> Path:
    if "HOME" in os.environ:
        cache_dir = Path.home() / ".cache" / "neural_audio_tokenizer" / "codebooks"
    else:
        cache_dir = Path("./codebooks")
    cache_dir.mkdir(parents=True, exist_ok=True)
    return cache_dir


def get_codebook_cache_key(model_id: str, codebook_size: int,
                           num_quantizers: int, input_dim: int,
                           layer_type: str, ext: str = ".npz") -> str:
    base = "_".join([model_id, f"size{codebook_size}", f"nq{num_quantizers}",
                     f"dim{input_dim}", layer_type])
    return base + ext


def backup_existing_codebooks(cache_file: Path) -> bool:
    if not cache_file.exists():
        return True
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    backup = cache_file.with_suffix(f".backup_{timestamp}{cache_file.suffix}")
    try:
        shutil.copy2(cache_file, backup)
        return backup.exists() and backup.stat().st_size > 0
    except Exception as exc:
        logger.warn(f"Failed to backup existing codebooks: {exc}")
        return False


def save_codebooks(
    cache_dir: Path,
    cache_key: str,
    codebook: np.ndarray,      # [N, K, D]
    ema_count: np.ndarray,     # [N, K]
    ema_weight: np.ndarray,    # [N, K, D]
    force_reinit: bool = False,
) -> bool:
    """Persist stacked codebook state; `.pkl` keys write reference format."""
    try:
        cache_dir = Path(cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        cache_file = cache_dir / cache_key
        if force_reinit and cache_file.exists():
            backup_existing_codebooks(cache_file)

        n, k, d = codebook.shape
        if cache_file.suffix == ".pkl":
            payload = {
                "codebooks": [np.asarray(codebook[i]) for i in range(n)],
                "ema_counts": [np.asarray(ema_count[i]) for i in range(n)],
                "ema_weights": [np.asarray(ema_weight[i]) for i in range(n)],
                "input_dim": d,
                "codebook_size": k,
                "num_quantizers": n,
                "version": CACHE_VERSION,
            }
            with open(cache_file, "wb") as f:
                pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        else:
            np.savez_compressed(
                cache_file,
                codebook=np.asarray(codebook, dtype=np.float32),
                ema_count=np.asarray(ema_count, dtype=np.float32),
                ema_weight=np.asarray(ema_weight, dtype=np.float32),
                version=CACHE_VERSION,
            )
        logger.debug(f"Saved codebooks to: {cache_file}")
        return True
    except Exception as exc:
        logger.warn(f"Failed to save codebooks: {exc}")
        return False


def load_codebooks(
    cache_dir: Path,
    cache_key: str,
    expect_shape: Optional[Tuple[int, int, int]] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Load ``(codebook, ema_count, ema_weight)`` or None.

    Tries the requested key, then the alternate extension (so a reference
    `.pkl` cache satisfies an `.npz` request and vice versa).  Verifies
    shape compatibility like the reference (573-577).
    """
    cache_dir = Path(cache_dir)
    stem = Path(cache_key).stem
    candidates = [cache_dir / cache_key,
                  cache_dir / f"{stem}.npz",
                  cache_dir / f"{stem}.pkl"]
    for cache_file in candidates:
        if not cache_file.exists():
            continue
        try:
            if cache_file.suffix == ".pkl":
                with open(cache_file, "rb") as f:
                    data = pickle.load(f)
                codebook = np.stack([np.asarray(c, dtype=np.float32)
                                     for c in data["codebooks"]])
                ema_count = np.stack([np.asarray(c, dtype=np.float32)
                                      for c in data["ema_counts"]])
                ema_weight = np.stack([np.asarray(c, dtype=np.float32)
                                       for c in data["ema_weights"]])
            else:
                with np.load(cache_file) as data:
                    codebook = data["codebook"].astype(np.float32)
                    ema_count = data["ema_count"].astype(np.float32)
                    ema_weight = data["ema_weight"].astype(np.float32)
            if expect_shape is not None and tuple(codebook.shape) != tuple(expect_shape):
                logger.warn(
                    f"Cached codebooks at {cache_file} have shape "
                    f"{codebook.shape}, expected {expect_shape}; ignoring")
                continue
            logger.info(f"Loaded cached codebooks from: {cache_file}")
            return codebook, ema_count, ema_weight
        except Exception as exc:
            logger.warn(f"Failed to load codebooks from {cache_file}: {exc}")
    return None

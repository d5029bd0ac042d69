"""Direct pretrained-checkpoint parsing — no model instantiation, no remote
code execution.

The reference loads MERT with ``AutoModel.from_pretrained(...,
trust_remote_code=True)`` (neural_audio_tokenizer.py:1988) — executing
repo-supplied Python just to read weight matrices.  Codebook seeding only
needs the raw tensors, so this module reads checkpoint *files* directly:

* ``.safetensors`` — parsed natively (8-byte little-endian header length,
  JSON tensor table, raw buffer); zero dependencies, zero code execution.
* ``.bin`` / ``.pt`` — ``torch.load(weights_only=True)``, torch's
  restricted unpickler (tensors only, no arbitrary objects).

Checkpoints are located in HF-hub cache layout
(``~/.cache/huggingface/hub/models--ORG--NAME/snapshots/*/``), in a plain
local directory, or as a direct file path.
"""

from __future__ import annotations

import json
import os
import struct
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils.logging import logger

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 has no numpy dtype; widened to float32 via a uint16 view below.
    "BF16": None,
}

_WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin",
                 "model.bin", "weights.safetensors")


def parse_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Read a .safetensors file into name → numpy array (native parser)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        data = f.read()
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype_code = meta["dtype"]
        if dtype_code not in _SAFETENSORS_DTYPES:
            logger.debug(f"safetensors: skipping {name} (dtype {dtype_code})")
            continue
        start, end = meta["data_offsets"]
        raw = data[start:end]
        shape = tuple(meta["shape"])
        if dtype_code == "BF16":
            bits = np.frombuffer(raw, dtype=np.uint16).astype(np.uint32) << 16
            arr = bits.view(np.float32).reshape(shape)
        else:
            arr = np.frombuffer(
                raw, dtype=_SAFETENSORS_DTYPES[dtype_code]).reshape(shape)
        out[name] = arr
    return out


def _load_torch_bin(path: Path) -> Optional[Dict[str, np.ndarray]]:
    try:
        import torch

        state = torch.load(str(path), map_location="cpu", weights_only=True)
        if not isinstance(state, dict):
            return None
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in state.items()
                if hasattr(v, "shape")}
    except Exception as exc:
        logger.debug(f"torch checkpoint load failed for {path}: {exc}")
        return None


def _hub_cache_dirs() -> Iterator[Path]:
    # huggingface_hub semantics: an explicit cache env var REPLACES the
    # default location (it does not union with it) — anything else leaks
    # the user-level cache into environments that deliberately pointed
    # elsewhere (e.g. tests hiding checkpoints behind a tmp dir).
    explicit = False
    for env in ("HF_HUB_CACHE", "HUGGINGFACE_HUB_CACHE"):
        if os.environ.get(env):
            explicit = True
            yield Path(os.environ[env])
    if explicit:
        return
    home = Path(os.environ.get("HF_HOME",
                               Path.home() / ".cache" / "huggingface"))
    yield home / "hub"


def find_local_checkpoint(model_name: str) -> Optional[Path]:
    """Resolve ``model_name`` (repo id, directory, or file) to a weight file
    without any network access."""
    direct = Path(model_name)
    if direct.is_file():
        return direct
    if direct.is_dir():
        for fname in _WEIGHT_FILES:
            if (direct / fname).exists():
                return direct / fname
        hits = sorted(direct.glob("*.safetensors")) or sorted(
            direct.glob("*.bin"))
        return hits[0] if hits else None

    repo_dir = "models--" + model_name.replace("/", "--")
    for cache in _hub_cache_dirs():
        snapshots = cache / repo_dir / "snapshots"
        if not snapshots.is_dir():
            continue
        for snap in sorted(snapshots.iterdir(), reverse=True):
            found = find_local_checkpoint(str(snap))
            if found:
                return found
    return None


def load_state_dict_file(path: Path) -> Optional[Dict[str, np.ndarray]]:
    path = Path(path)
    if path.suffix == ".safetensors":
        try:
            return parse_safetensors(path)
        except Exception as exc:
            logger.debug(f"safetensors parse failed for {path}: {exc}")
            return None
    return _load_torch_bin(path)


def load_local_state_dict(model_name: str) -> Optional[Dict[str, np.ndarray]]:
    """name → numpy state dict for a locally available checkpoint, else None.

    This is the no-remote-code MERT/EnCodec path: reading weights never
    requires the repo's custom modeling code (reference :1988 runs it
    anyway via trust_remote_code=True).
    """
    path = find_local_checkpoint(model_name)
    if path is None:
        return None
    state = load_state_dict_file(path)
    if state:
        logger.info(f"Loaded {len(state)} tensors from {path} "
                    "(direct parse, no remote code)")
    return state

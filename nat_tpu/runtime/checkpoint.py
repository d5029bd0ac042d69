"""Model checkpointing (params + RVQ codebook state + config).

The reference advertises ``--model-path`` but never implements it (SURVEY.md
§2.8 dead flags); here it is a real feature.  Format: a single msgpack file
(flax.serialization) holding the parameter pytree, both RVQ states, and the
architecture config used to validate compatibility on load.  Training-state
checkpoints (optimizer state included) use the same mechanism.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..utils.logging import logger

FORMAT_KEY = "nat_tpu_checkpoint"
FORMAT_VERSION = 1


def _to_numpy_tree(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_model(path: str, tokenizer) -> None:
    """Persist an initialized tokenizer's weights + codebooks."""
    from flax import serialization

    tokenizer.ensure_initialized()
    payload = {
        "format": FORMAT_KEY,
        "version": FORMAT_VERSION,
        "config": {
            "sample_rate": tokenizer.sample_rate,
            "semantic_dim": tokenizer.semantic_dim,
            "acoustic_dim": tokenizer.acoustic_dim,
            "codebook_size": tokenizer.codebook_size,
            "num_quantizers": tokenizer.num_quantizers,
            "n_mels": tokenizer.n_mels,
            "hop_length": tokenizer.hop_length,
            "semantic_fallback": tokenizer.semantic_fallback,
        },
        "params": _to_numpy_tree(tokenizer.params),
        "sem_rvq": _to_numpy_tree(tokenizer.sem_rvq._asdict()),
        "acc_rvq": _to_numpy_tree(tokenizer.acc_rvq._asdict()),
    }
    data = serialization.msgpack_serialize(payload)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(data)
    logger.info(f"Saved model checkpoint to {path} ({len(data)} bytes)")


def load_model(path: str, tokenizer) -> bool:
    """Restore weights + codebooks into an initialized tokenizer.

    Returns False (with a warning) on incompatibility rather than raising —
    the pipeline's graceful-degradation ladder continues with seeded state.
    """
    from flax import serialization
    import jax.numpy as jnp

    from ..quant.rvq import RVQState

    try:
        payload = serialization.msgpack_restore(Path(path).read_bytes())
    except Exception as exc:
        logger.warn(f"Could not read model checkpoint {path}: {exc}")
        return False
    if payload.get("format") != FORMAT_KEY:
        logger.warn(f"{path} is not a nat-tpu checkpoint")
        return False
    config = payload.get("config", {})
    tokenizer.ensure_initialized()
    for key in ("semantic_dim", "acoustic_dim", "codebook_size",
                "num_quantizers", "n_mels", "hop_length"):
        if config.get(key) != getattr(tokenizer, key):
            logger.warn(
                f"Checkpoint {path} incompatible: {key}="
                f"{config.get(key)} vs {getattr(tokenizer, key)}")
            return False
    if bool(config.get("semantic_fallback")) != tokenizer.semantic_fallback:
        logger.warn("Checkpoint semantic-encoder variant differs; skipping")
        return False
    # device_put: the pickled pytree is host numpy; device-resident params
    # keep jitted forwards from re-uploading the full tree every call.
    tokenizer.params = jax.device_put(payload["params"])
    tokenizer.sem_rvq = RVQState(**{
        k: jnp.asarray(v) for k, v in payload["sem_rvq"].items()})
    tokenizer.acc_rvq = RVQState(**{
        k: jnp.asarray(v) for k, v in payload["acc_rvq"].items()})
    tokenizer._forward_cache.clear()
    logger.info(f"Loaded model checkpoint from {path}")
    return True

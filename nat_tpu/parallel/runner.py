"""Data-parallel inference runner.

Scale-out path for batch tokenization (SURVEY.md §2.9's TPU-native DP plan):
files/chunks are grouped by bucket length, stacked into ``[B, S]`` batches,
the batch dimension is sharded over the mesh's ``dp`` axis, and the jitted
forward runs once per group — XLA splits the batch across chips over ICI.
Per-file token streams are sliced back out on host.  Single-chip execution
is the degenerate 1-device mesh (no code difference).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..runtime.bucketing import bucket_length
from ..utils.logging import logger
from .mesh import batch_sharding, make_mesh, replicated


class DataParallelRunner:
    """Runs an initialized tokenizer over many waveforms, dp-sharded."""

    def __init__(self, tokenizer, mesh=None) -> None:
        import jax

        self.tokenizer = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(
            (len(jax.devices()), 1))
        self.dp = self.mesh.shape["dp"]

    def tokenize_many(
        self, waveforms: Sequence[np.ndarray],
        sample_rates: Optional[Sequence[int]] = None,
    ) -> List[Dict]:
        """Tokenize a list of mono waveforms; returns per-file result dicts
        (reference shape: semantic_codes/acoustic_codes lists, num_frames).

        Waveforms must fit a single chunk (``bucket_length`` max); callers
        route longer files through the sequential chunked path.  Files are
        grouped by (sample_rate, bucket) so each group runs one compiled
        program.
        """
        import jax
        import jax.numpy as jnp

        tok = self.tokenizer
        tok.ensure_initialized()

        rates = (list(sample_rates) if sample_rates is not None
                 else [tok.sample_rate] * len(waveforms))

        groups: Dict[tuple, List[int]] = defaultdict(list)
        for idx, wave in enumerate(waveforms):
            groups[(rates[idx],
                    bucket_length(len(wave), rates[idx]))].append(idx)

        results: List[Optional[Dict]] = [None] * len(waveforms)
        for (sr, bucket), indices in sorted(groups.items()):
            forward, t_target = tok._forward_for(bucket, sr)
            # Pad the group to a multiple of dp so the shard is even.
            padded_n = -(-len(indices) // self.dp) * self.dp
            batch = np.zeros((padded_n, bucket), dtype=np.float32)
            for row, idx in enumerate(indices):
                wave = waveforms[idx]
                batch[row, :len(wave)] = wave[:bucket]
            logger.debug(
                f"DP group: bucket={bucket} files={len(indices)} "
                f"batch={padded_n} dp={self.dp}")

            batch_dev = jax.device_put(jnp.asarray(batch),
                                       batch_sharding(self.mesh))
            rng = jax.device_put(jax.random.PRNGKey(0), replicated(self.mesh))
            out = forward(tok.params, tok.sem_rvq, tok.acc_rvq,
                          batch_dev, rng)
            sem = np.asarray(out["semantic_codes"])   # [N, B, Tt]
            acc = np.asarray(out["acoustic_codes"])
            for row, idx in enumerate(indices):
                valid_t = tok._target_frames(len(waveforms[idx]), sr)
                results[idx] = {
                    "semantic_codes": [sem[l, row:row + 1, :valid_t]
                                       for l in range(sem.shape[0])],
                    "acoustic_codes": [acc[l, row:row + 1, :valid_t]
                                       for l in range(acc.shape[0])],
                    "losses": {k: float(v) for k, v in out["losses"].items()},
                    "reconstructed": None,
                    "num_frames": int(valid_t),
                }
        return results  # type: ignore[return-value]

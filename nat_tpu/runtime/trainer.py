"""Training loop driver (the reference has no training at all; this is the
TPU-native trainable mode built on :mod:`nat_tpu.parallel.train`).

Responsibilities: bucket-batched data feeding, the jitted (optionally
dp/tp-sharded) train step, metric logging, periodic checkpointing of the
full TrainState (params + optimizer + RVQ codebooks + step), and writing
trained weights back into a tokenizer for inference/`--model-path` use.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import numpy as np

from ..utils.logging import logger
from .bucketing import bucket_length


class Trainer:
    def __init__(
        self,
        tokenizer,
        optimizer=None,
        mesh=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 100,
        log_every: int = 10,
        seed: int = 0,
    ) -> None:
        import optax

        from ..parallel.train import make_train_state, make_train_step

        self.tokenizer = tokenizer
        self.optimizer = optimizer or optax.adamw(1e-4)
        self.mesh = mesh
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.seed = seed

        tokenizer.ensure_initialized()
        self.state = make_train_state(tokenizer, self.optimizer, mesh=mesh)
        self.step_fn = make_train_step(tokenizer, self.optimizer, mesh=mesh)
        self.history: List[dict] = []

    # ------------------------------------------------------------------
    def _batches(self, waveforms: Sequence[np.ndarray], batch_size: int,
                 num_steps: int) -> Iterable[np.ndarray]:
        """Bucket-padded batches, shuffled per epoch; one bucket per batch
        (grouped by bucket to keep shapes static)."""
        rng = np.random.default_rng(self.seed)
        sr = self.tokenizer.sample_rate
        by_bucket: dict = {}
        for w in waveforms:
            by_bucket.setdefault(bucket_length(len(w), sr), []).append(w)
        produced = 0
        while produced < num_steps:
            for bucket, group in sorted(by_bucket.items()):
                order = rng.permutation(len(group))
                for lo in range(0, len(group), batch_size):
                    rows = [group[i] for i in order[lo:lo + batch_size]]
                    batch = np.zeros((len(rows), bucket), dtype=np.float32)
                    for r, w in enumerate(rows):
                        batch[r, :len(w)] = w[:bucket]
                    yield batch
                    produced += 1
                    if produced >= num_steps:
                        return

    # ------------------------------------------------------------------
    def fit(self, waveforms: Sequence[np.ndarray], num_steps: int,
            batch_size: int = 4) -> List[dict]:
        """Run ``num_steps`` optimization steps over the waveform corpus."""
        import jax

        rng = jax.random.PRNGKey(self.seed)
        for batch in self._batches(waveforms, batch_size, num_steps):
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self.step_fn(self.state, batch, step_rng)
            step = int(self.state.step)
            record = {"step": step,
                      **{k: float(v) for k, v in metrics.items()}}
            self.history.append(record)
            if step % self.log_every == 0 or step == 1:
                logger.info(
                    f"step {step}: loss={record['loss']:.4f} "
                    f"recon={record['reconstruction_loss']:.4f} "
                    f"commit={record['commitment_loss']:.4f}")
            if (self.checkpoint_dir is not None
                    and step % self.checkpoint_every == 0):
                self.save_checkpoint()
        return self.history

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: Optional[str] = None) -> str:
        from flax import serialization

        if path is None:
            assert self.checkpoint_dir is not None
            self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
            path = str(self.checkpoint_dir
                       / f"train_state_{int(self.state.step):08d}.msgpack")
        payload = {
            "format": "nat_tpu_train_state",
            "state": serialization.to_state_dict(self.state),
        }
        Path(path).write_bytes(serialization.msgpack_serialize(payload))
        logger.info(f"Saved training checkpoint: {path}")
        return path

    def restore_checkpoint(self, path: str) -> None:
        from flax import serialization

        payload = serialization.msgpack_restore(Path(path).read_bytes())
        if payload.get("format") != "nat_tpu_train_state":
            raise ValueError(f"{path} is not a nat-tpu training checkpoint")
        self.state = serialization.from_state_dict(self.state,
                                                   payload["state"])
        logger.info(f"Restored training checkpoint: {path} "
                    f"(step {int(self.state.step)})")

    # ------------------------------------------------------------------
    def apply_to_tokenizer(self) -> None:
        """Write trained params + codebooks back into the tokenizer so
        inference (and checkpoint.save_model) uses them."""
        import jax

        # Copy out of the TrainState: a future donated step would delete
        # aliased arrays from under the tokenizer.
        self.tokenizer.params = jax.tree_util.tree_map(
            lambda x: np.array(x), self.state.params)
        self.tokenizer.sem_rvq = jax.tree_util.tree_map(
            lambda x: np.array(x), self.state.sem_rvq)
        self.tokenizer.acc_rvq = jax.tree_util.tree_map(
            lambda x: np.array(x), self.state.acc_rvq)
        self.tokenizer._forward_cache.clear()

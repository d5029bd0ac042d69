"""Data-parallel inference runner.

Scale-out path for batch tokenization (SURVEY.md §2.9's TPU-native DP plan):
every file is split into its overlap-extended chunk spans (one span for
short files — the same spans the sequential path uses), spans from ALL
files are grouped by (sample_rate, bucket) and stacked into ``[B, S]``
batches, the batch dimension is sharded over the mesh's ``dp`` axis, and
the jitted forward runs once per group — XLA splits the batch across chips
over ICI.  Per-span frames are sliced back out on host and reassembled per
file, mirroring ``NeuralAudioTokenizer.__call__``'s sequential chunk loop.
Single-chip execution is the degenerate 1-device mesh (no code difference).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..runtime.bucketing import chunk_spans
from ..utils.logging import logger
from .mesh import batch_sharding, make_mesh, replicated


class DataParallelRunner:
    """Runs an initialized tokenizer over many waveforms, dp-sharded.

    On a single device this is still the right execution shape: spans are
    stacked into one ``[B, S]`` forward, amortizing the fixed per-dispatch
    host overhead and feeding the MXU a full batch (the difference between
    ~90 ms/file dispatch-bound and throughput-bound execution).
    """

    # Rows per forward call: bounds activation memory AND the number of
    # distinct batch shapes XLA compiles (rows are padded to powers of two
    # up to this cap).
    MAX_ROWS = 32

    def __init__(self, tokenizer, mesh=None) -> None:
        import jax

        self.tokenizer = tokenizer
        self.mesh = mesh if mesh is not None else make_mesh(
            (len(jax.devices()), 1))
        self.dp = self.mesh.shape["dp"]

    def _padded_rows(self, n: int) -> int:
        """Smallest power-of-two ≥ n that is a multiple of dp, ≤ cap."""
        rows = 1
        while rows < n:
            rows *= 2
        rows = -(-rows // self.dp) * self.dp
        cap = -(-self.MAX_ROWS // self.dp) * self.dp
        return min(rows, max(cap, self.dp))

    def tokenize_many(
        self, waveforms: Sequence[np.ndarray],
        sample_rates: Optional[Sequence[int]] = None,
        want_features: bool = True,
    ) -> List[Dict]:
        """Tokenize a list of mono waveforms; returns per-file result dicts
        (reference shape: semantic_codes/acoustic_codes lists, num_frames).

        Long files are chunked exactly as the sequential path chunks them
        (``chunk_spans`` + overlap-discard), and their spans join the same
        dp batches as whole short files — chunk-level data parallelism.
        ``want_features=False`` skips the device→host fetch of the
        [B, D, T] feature maps (only visualization consumers need them).
        """
        import jax

        tok = self.tokenizer
        tok.ensure_initialized()

        rates = (list(sample_rates) if sample_rates is not None
                 else [tok.sample_rate] * len(waveforms))

        # One work item per (file, span); short files have a single span.
        items: List[tuple] = []   # (file_idx, span_order, row [bucket], meta)
        for idx, wave in enumerate(waveforms):
            wave2d = np.atleast_2d(np.asarray(wave, dtype=np.float32))
            sr = rates[idx]
            total = wave2d.shape[-1]
            overlap = int(sr)
            spans = chunk_spans(total, sr, overlap=overlap)
            ov = overlap if len(spans) > 1 else 0
            for order, (start, length) in enumerate(spans):
                ext_start = max(0, start - ov)
                ext_end = min(total, start + length + ov)
                chunk, meta = tok.prepare_span(
                    wave2d[:, ext_start:ext_end], ext_start, start, length,
                    ov, sr)
                items.append((idx, order, chunk[0], meta))

        groups: Dict[tuple, List[int]] = defaultdict(list)
        for j, (_, _, _, meta) in enumerate(items):
            groups[(meta.sr, meta.bucket)].append(j)

        # Dispatch every group's forward before fetching any result: JAX
        # dispatch is async, so later groups' compile/transfer/compute
        # overlaps earlier groups' device time instead of serializing with
        # the host fetches (the same pipelining bench.py uses to hide the
        # fixed per-call tunnel overhead).
        dispatched: List[tuple] = []
        for (sr, bucket), members in sorted(groups.items()):
            forward, _ = tok._forward_for(bucket, sr)
            # Sub-batch large groups; pad rows to a power of two (multiple
            # of dp) so the shard is even and batch shapes stay bounded.
            for lo in range(0, len(members), self.MAX_ROWS):
                sub = members[lo : lo + self.MAX_ROWS]
                padded_n = self._padded_rows(len(sub))
                batch = np.zeros((padded_n, bucket), dtype=np.float32)
                for row, j in enumerate(sub):
                    batch[row] = items[j][2]
                logger.debug(
                    f"DP group: bucket={bucket} spans={len(sub)} "
                    f"batch={padded_n} dp={self.dp}")

                # numpy → sharded device buffer in ONE transfer (an
                # intermediate jnp.asarray would upload to the default
                # device first, doubling host→device traffic).
                batch_dev = jax.device_put(batch, batch_sharding(self.mesh))
                rng = jax.device_put(jax.random.PRNGKey(0),
                                     replicated(self.mesh))
                dispatched.append((sub, forward(
                    tok.params, tok.sem_rvq, tok.acc_rvq, batch_dev, rng)))

        span_results: List[Optional[Dict]] = [None] * len(items)
        for members, out in dispatched:
            sem = np.asarray(out["semantic_codes"])   # [N, B, Tt]
            acc = np.asarray(out["acoustic_codes"])
            recon = (np.asarray(out["reconstructed"])
                     if out.get("reconstructed") is not None else None)
            if want_features:
                sem_f = np.asarray(out["semantic_features"])  # [B, D, Tt]
                acc_f = np.asarray(out["acoustic_features"])
            losses = out["losses"]
            for row, j in enumerate(members):
                meta = items[j][3]
                span_results[j] = tok.finalize_span({
                    "semantic_codes": sem[:, row:row + 1],
                    "acoustic_codes": acc[:, row:row + 1],
                    "reconstructed": (recon[row:row + 1]
                                      if recon is not None else None),
                    # Per-ROW loss slice: forward losses are [B] vectors
                    # (zero pad rows would skew a batch mean).
                    "losses": tok.row_losses(losses, row),
                    "semantic_features": (sem_f[row:row + 1]
                                          if want_features else None),
                    "acoustic_features": (acc_f[row:row + 1]
                                          if want_features else None),
                }, meta)

        # Reassemble per file in span order (mirrors
        # NeuralAudioTokenizer.__call__'s concat over iter_chunks).
        per_file: Dict[int, List[tuple]] = defaultdict(list)
        for j, (idx, order, _, _) in enumerate(items):
            per_file[idx].append((order, span_results[j]))
        results: List[Optional[Dict]] = [None] * len(waveforms)
        for idx, ordered in per_file.items():
            parts = [p for _, p in sorted(ordered, key=lambda t: t[0])]
            sem_codes = np.concatenate(
                [p["semantic_codes"] for p in parts], axis=-1)
            acc_codes = np.concatenate(
                [p["acoustic_codes"] for p in parts], axis=-1)
            recon_parts = [p["reconstructed"] for p in parts
                           if p["reconstructed"] is not None]
            results[idx] = {
                "semantic_codes": [sem_codes[l]
                                   for l in range(sem_codes.shape[0])],
                "acoustic_codes": [acc_codes[l]
                                   for l in range(acc_codes.shape[0])],
                "losses": parts[-1]["losses"],
                "reconstructed": (np.concatenate(recon_parts, axis=-1)
                                  if recon_parts else None),
                "semantic_features": parts[-1]["semantic_features"],
                "acoustic_features": parts[-1]["acoustic_features"],
                "num_frames": int(sem_codes.shape[-1]),
            }
        return results  # type: ignore[return-value]

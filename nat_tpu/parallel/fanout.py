"""Multi-host (DCN) file fan-out for pod-scale batch tokenization.

SURVEY.md §5.8's host-level work distribution: the workload is
embarrassingly parallel over files, so on a multi-host pod slice each
host tokenizes a disjoint stride of the input list on its own chips (DP
over ICI within the host) and only the small metric aggregates cross the
DCN — one ``process_allgather`` of a ``[num_keys, 4]`` stats matrix per
batch, not audio.

No reference counterpart (the reference is single-process,
neural_audio_tokenizer.py:4592-4595); this is TPU-native scale-out
infrastructure.  All sharding/merging logic takes explicit
``process_index``/``process_count``/``allgather`` injections so a
simulated pod is unit-testable on one machine; the env overrides
``NAT_TPU_PROCESS_INDEX``/``NAT_TPU_PROCESS_COUNT`` drive manual
multi-process fan-out without a JAX distributed runtime (each process
writes to a shared output dir; stats merge via the same code path).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# Per-key stats vector layout: [count, sum, min, max]
Stats = Dict[str, Tuple[int, float, float, float]]


def process_topology(process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> Tuple[int, int]:
    """Resolve (index, count): explicit args > env overrides > jax runtime."""
    if process_index is None:
        env = os.environ.get("NAT_TPU_PROCESS_INDEX")
        if env is not None:
            process_index = int(env)
    if process_count is None:
        env = os.environ.get("NAT_TPU_PROCESS_COUNT")
        if env is not None:
            process_count = int(env)
    if process_index is None or process_count is None:
        try:
            import jax

            process_index = (jax.process_index() if process_index is None
                             else process_index)
            process_count = (jax.process_count() if process_count is None
                             else process_count)
        except Exception:
            process_index, process_count = process_index or 0, process_count or 1
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} out of range "
                         f"for process_count {process_count}")
    return process_index, process_count


def shard_paths(paths: Sequence[str],
                process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List[str]:
    """This host's stride of the input list (disjoint across hosts, union
    = the full list, per-host sizes within 1 of each other).  Stride
    sharding balances size-sorted lists better than contiguous blocks."""
    pi, pc = process_topology(process_index, process_count)
    if pc <= 1:
        return list(paths)
    return list(paths)[pi::pc]


def local_stats(metric_dicts: Sequence[Dict[str, Any]]) -> Stats:
    """Per-key [count, sum, min, max] over this host's per-file metric
    dicts (numeric fields only)."""
    stats: Stats = {}
    for d in metric_dicts:
        for key, value in d.items():
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                continue
            v = float(value)
            if key in stats:
                n, s, lo, hi = stats[key]
                stats[key] = (n + 1, s + v, min(lo, v), max(hi, v))
            else:
                stats[key] = (1, v, v, v)
    return stats


def merge_stats(per_host: Sequence[Stats]) -> Stats:
    merged: Stats = {}
    for stats in per_host:
        for key, (n, s, lo, hi) in stats.items():
            if n == 0:
                continue
            if key in merged:
                mn, ms, mlo, mhi = merged[key]
                merged[key] = (mn + n, ms + s, min(mlo, lo), max(mhi, hi))
            else:
                merged[key] = (n, s, lo, hi)
    return merged


def finalize_stats(stats: Stats) -> Dict[str, float]:
    """Reference-shaped aggregate dict: avg_/min_/max_ per key (CLI batch
    metrics format, reference 5601-5620)."""
    out: Dict[str, float] = {}
    for key, (n, s, lo, hi) in sorted(stats.items()):
        if n == 0:
            continue
        out[f"avg_{key}"] = s / n
        out[f"min_{key}"] = lo
        out[f"max_{key}"] = hi
    return out


def _default_allgather(matrix: np.ndarray) -> np.ndarray:
    """All-hosts gather over DCN: [k, 4] -> [P, k, 4]."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(matrix))


def gather_stats(local: Stats,
                 process_count: Optional[int] = None,
                 allgather: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 keys: Optional[Sequence[str]] = None,
                 ) -> Stats:
    """Merge every host's stats.  ``keys`` fixes the key set every host
    contributes (pass the canonical metric field list — a host whose
    shard was empty, or all-errors, still participates in the collective
    with count=0 rows; the gather is collective, every host MUST call
    it).  Values cross the DCN as one dense [num_keys, 4] float64
    matrix."""
    _, pc = process_topology(None, process_count)
    if pc <= 1:
        return local
    keys = sorted(keys if keys is not None else local.keys())
    matrix = np.zeros((len(keys), 4), dtype=np.float64)
    for i, key in enumerate(keys):
        n, s, lo, hi = local.get(key, (0, 0.0, np.inf, -np.inf))
        matrix[i] = (n, s, lo if n else np.inf, hi if n else -np.inf)
    gathered = (allgather or _default_allgather)(matrix)
    per_host: List[Stats] = []
    for row in gathered:
        per_host.append({
            key: (int(row[i][0]), float(row[i][1]),
                  float(row[i][2]), float(row[i][3]))
            for i, key in enumerate(keys) if row[i][0] > 0})
    return merge_stats(per_host)

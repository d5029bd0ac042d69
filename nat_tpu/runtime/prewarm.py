"""Forward-program prewarming: compile + cache before the first request.

A cold (config, shape) pair costs minutes of XLA compile; the AOT
executable cache (:mod:`nat_tpu.runtime.aotcache`) makes that a once-per-
machine cost, but someone still has to eat the cold run.  ``nat --prewarm``
(and the serving daemon's startup prewarm, runtime/server.py) eat it
explicitly and up front, so interactive/first-client latency never includes
a compile.  No reference counterpart (the reference has no compilation
step).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

from ..utils.logging import logger


def prewarm_forwards(tokenizer, sample_rate: int,
                     seconds: Optional[Iterable[float]] = None,
                     rows: Optional[Iterable[int]] = None,
                     ) -> List[Tuple[int, int]]:
    """Compile (or load from the AOT cache) the streaming forward programs
    for each bucket covering ``seconds`` at each batch-row count in
    ``rows``; returns the (bucket, rows) pairs completed.

    Defaults: the largest (30 s) bucket — the shape every long-stream span
    uses — at [1] (first span / lone request) and [group] (the span-group
    batch size), plus the first-frame-ramp bucket (FIRST_SPAN_S) at [1]
    when the ramp is on.  Each shape compiles under the tokenizer's device
    lock so a concurrent request needing a different shape only ever waits
    for one compile, not the whole sweep.
    """
    import numpy as np

    import jax

    from .bucketing import (FIRST_SPAN_S, MAX_SINGLE_CHUNK_S, bucket_length,
                            ramp_enabled)

    tokenizer.ensure_initialized()
    if rows is None:
        group = tokenizer._stream_group_size()
        rows = sorted({1, group})
    shapes: List[Tuple[int, int]] = []   # (bucket, rows) pairs to compile
    if seconds is None:
        big = bucket_length(int(MAX_SINGLE_CHUNK_S * sample_rate),
                            sample_rate)
        shapes = [(big, int(r)) for r in sorted(set(rows))]
        if ramp_enabled():
            first = bucket_length(int(FIRST_SPAN_S * sample_rate),
                                  sample_rate)
            if first != big:
                shapes.insert(0, (first, 1))
    else:
        buckets = sorted({bucket_length(int(float(s) * sample_rate),
                                        sample_rate) for s in seconds})
        shapes = [(b, int(r)) for b in buckets
                  for r in sorted(set(int(r) for r in rows))]
    rng = jax.random.PRNGKey(0)
    done: List[Tuple[int, int]] = []
    for bucket, r in shapes:
        with tokenizer._device_lock:
            forward, _ = tokenizer._forward_for(bucket, sample_rate)
            out = forward(tokenizer.params, tokenizer.sem_rvq,
                          tokenizer.acc_rvq,
                          np.zeros((r, bucket), np.float32), rng)
        np.asarray(out["semantic_codes"])   # force completion
        done.append((bucket, r))
        logger.info(f"Prewarmed forward: bucket={bucket} rows={r}")
    return done

"""Device mesh + sharding layout.

The reference has no distributed execution at all (SURVEY.md §2.9); this is
the TPU-native scale-out layer it calls for:

* a ``Mesh`` over all chips with axes ``("dp", "tp")`` — data parallelism
  over the batch/file dimension (the workload is embarrassingly parallel
  over files/chunks) and tensor parallelism over codebook rows and FFN
  hidden dims for the training path;
* `NamedSharding` constructors for batches, parameters, and RVQ state; XLA
  inserts the ICI collectives (all-reduce for gradients/EMA stats, gather
  for sharded-codebook argmin) under `jit` — no hand-written NCCL-style
  calls anywhere;
* multi-host initialization hook (`jax.distributed`) for pod slices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Initialize multi-host JAX when running on a pod slice (no-op on a
    single host or when already initialized)."""
    try:
        if jax.process_count() > 1:
            return
        jax.distributed.initialize()
    except Exception:
        pass  # single-host


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Build a ``("dp", "tp")`` mesh over the available devices.

    Default layout: put as much as possible on ``dp`` (throughput scaling);
    ``tp`` stays 1 unless requested.  A v5e-256 pod slice would typically be
    ``(64, 4)`` with ``tp`` riding the fastest ICI dimension.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    dp, tp = shape
    if dp * tp != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp, replicate everything else."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def rvq_state_sharding(mesh: Mesh):
    """Per-leaf shardings for an :class:`~nat_tpu.quant.rvq.RVQState`:
    codebook rows (K) sharded over tp — distance matmuls become
    column-parallel and XLA all-gathers the per-shard argmin candidates;
    EMA stats follow the same row split."""
    from ..quant.rvq import RVQState

    return RVQState(
        codebook=NamedSharding(mesh, P(None, "tp", None)),
        ema_count=NamedSharding(mesh, P(None, "tp")),
        ema_weight=NamedSharding(mesh, P(None, "tp", None)),
    )


def param_sharding_rules(path_str: str, shape: Tuple[int, ...],
                         mesh: Mesh) -> NamedSharding:
    """Megatron-style layout for the training path: FFN fc1 column-parallel,
    fc2 row-parallel, attention QKV head-parallel; everything else
    replicated.  Inference at this model scale (≤95 M params) needs no TP —
    these rules exist so the *training* step demonstrates real multi-axis
    sharding and scales activation memory."""
    if mesh.shape.get("tp", 1) == 1:
        return replicated(mesh)
    if "fc1" in path_str and len(shape) == 2:
        return NamedSharding(mesh, P(None, "tp"))
    if "fc2" in path_str and len(shape) == 2:
        return NamedSharding(mesh, P("tp", None))
    if ("attention" in path_str and len(shape) == 3
            and "out" not in path_str):
        return NamedSharding(mesh, P(None, "tp", None))   # [in, heads, hd]
    if "attention" in path_str and "out" in path_str and len(shape) == 3:
        return NamedSharding(mesh, P("tp", None, None))   # [heads, hd, out]
    return replicated(mesh)


def shard_params(params, mesh: Mesh):
    """Apply :func:`param_sharding_rules` across a param pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        path_str = "/".join(str(p) for p in path)
        return jax.device_put(
            leaf, param_sharding_rules(path_str, np.shape(leaf), mesh))

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = [place(path, leaf) for path, leaf in leaves]
    return jax.tree_util.tree_unflatten(treedef, placed)

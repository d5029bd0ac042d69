"""Sharded training checkpoints (orbax) that survive mesh-shape changes.

The codebook cache covers inference state (reference parity); this module
covers the *trainable* path's state: a :class:`~nat_tpu.parallel.train
.TrainState` saved from one device mesh restores onto any other mesh —
orbax reads the on-disk global arrays and reshards to the target
``NamedSharding``s, so a run checkpointed on a (4,2) dp×tp mesh resumes on
(8,1) or (2,4) without conversion scripts.  (The reference has no training
and no checkpoints at all, SURVEY.md §5.4.)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from ..utils.logging import logger
from .mesh import rvq_state_sharding, param_sharding_rules, replicated
from .train import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(path: str, state: TrainState) -> None:
    """Write a TrainState checkpoint (works for sharded and single-device
    states alike)."""
    ckptr = _checkpointer()
    ckptr.save(str(Path(path).resolve()), state)
    ckptr.wait_until_finished()
    logger.info(f"Saved sharded train checkpoint: {path}")


def _abstract_like(state: TrainState, mesh=None) -> TrainState:
    """ShapeDtypeStructs carrying the target mesh's shardings."""
    def leaf_sharding(path_str: str, leaf):
        if mesh is None:
            return None
        return param_sharding_rules(path_str, np.shape(leaf), mesh)

    def map_params(tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = [jax.ShapeDtypeStruct(
                   np.shape(leaf), leaf.dtype,
                   sharding=leaf_sharding(
                       "/".join(str(p) for p in path), leaf))
               for path, leaf in leaves]
        return jax.tree_util.tree_unflatten(treedef, out)

    def map_rvq(rvq):
        shardings = rvq_state_sharding(mesh) if mesh is not None else None
        return type(rvq)(*[
            jax.ShapeDtypeStruct(np.shape(leaf), leaf.dtype,
                                 sharding=(getattr(shardings, name)
                                           if shardings is not None else None))
            for name, leaf in zip(rvq._fields, rvq)])

    return TrainState(
        params=map_params(state.params),
        opt_state=map_params(state.opt_state),
        sem_rvq=map_rvq(state.sem_rvq),
        acc_rvq=map_rvq(state.acc_rvq),
        step=jax.ShapeDtypeStruct(
            np.shape(state.step), state.step.dtype,
            sharding=replicated(mesh) if mesh is not None else None),
    )


def restore_sharded(path: str, like: TrainState,
                    mesh: Optional[Any] = None) -> TrainState:
    """Restore a TrainState onto ``mesh`` (resharding as needed).

    ``like`` provides the tree structure/shapes/dtypes (e.g. a freshly
    built state from ``make_train_state`` on the new mesh).
    """
    ckptr = _checkpointer()
    target = _abstract_like(like, mesh)
    state = ckptr.restore(str(Path(path).resolve()), target)
    logger.info(f"Restored sharded train checkpoint: {path} "
                f"(step {int(np.asarray(state.step))})")
    return state

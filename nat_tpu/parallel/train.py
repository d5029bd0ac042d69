"""Sharded training step (the framework's trainable mode).

The reference ships no training loop — codebooks are seeded, encoders
frozen.  This module adds the TPU-native trainable path the rebuild is
specced to have: encoders + decoder optimized against reconstruction +
commitment losses while codebooks follow synchronized EMA updates.

Parallelism (all expressed as shardings; XLA inserts the collectives):

* **dp** — batch dimension sharded; gradient all-reduce over ICI comes from
  jit + replicated-param output sharding.
* **tp** — codebook rows and transformer FFN/attention heads sharded via
  :func:`nat_tpu.parallel.mesh.param_sharding_rules`; the RVQ distance
  matmul is column-parallel and the EMA statistics reduce across tp
  automatically.

Used by `__graft_entry__.dryrun_multichip` to validate multi-chip
compilation on a virtual device mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..quant.rvq import RVQState, rvq_ema_update, rvq_encode
from .mesh import batch_sharding, replicated, rvq_state_sharding, shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    sem_rvq: RVQState
    acc_rvq: RVQState
    step: jnp.ndarray


def make_train_state(tokenizer, optimizer, mesh=None) -> TrainState:
    """Build (and optionally shard) the initial training state from an
    initialized :class:`~nat_tpu.models.tokenizer.NeuralAudioTokenizer`."""
    tokenizer.ensure_initialized()
    # Deep-copy FIRST: the train step donates its input state, and
    # device_put can share per-device buffers with the source array
    # (replicated shardings reuse the device-0 buffer), so donation would
    # delete the tokenizer's own params on the first step.
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    tokenizer.params)
    sem_rvq = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     tokenizer.sem_rvq)
    acc_rvq = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     tokenizer.acc_rvq)
    if mesh is not None:
        params = shard_params(params, mesh)
        sem_rvq = jax.device_put(sem_rvq, rvq_state_sharding(mesh))
        acc_rvq = jax.device_put(acc_rvq, rvq_state_sharding(mesh))
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, sem_rvq, acc_rvq,
                      jnp.zeros((), jnp.int32))


def make_train_step(tokenizer, optimizer, mesh=None,
                    commitment_weight: float = 0.25,
                    ema_decay: float = 0.99,
                    use_pallas_rvq: bool = False):
    """Returns a jitted ``(state, batch, rng) -> (state, metrics)`` step.

    ``batch`` is a waveform array ``[B, S]`` (bucket-padded).  With ``mesh``
    given, the batch is dp-sharded and params/codebooks follow the tp rules;
    the same step function runs unchanged on one chip.

    ``use_pallas_rvq=True`` swaps the XLA RVQ for the fused Pallas kernel
    with its analytic STE backward (:func:`~nat_tpu.ops.rvq_pallas.
    rvq_encode_pallas_train`) — single-chip/dp meshes only: under tp the
    un-partitioned ``pallas_call`` forces XLA to all-gather the sharded
    codebook, losing the column-parallel distance matmul.
    """
    bucket = None  # resolved per call shape by jit

    def loss_fn(params, sem_rvq, acc_rvq, batch, rng):
        t_target = tokenizer._target_frames(batch.shape[-1])
        out = _forward_train(tokenizer, params, sem_rvq, acc_rvq, batch,
                             rng, t_target, use_pallas_rvq=use_pallas_rvq)
        recon_loss = out["reconstruction_loss"]
        vq_loss = out["commitment_loss"] * commitment_weight
        loss = recon_loss + vq_loss
        aux = {
            "loss": loss,
            "reconstruction_loss": recon_loss,
            "commitment_loss": out["commitment_loss"],
            "sem_features": out["sem_features"],
            "acc_features": out["acc_features"],
            "sem_codes": out["sem_codes"],
            "acc_codes": out["acc_codes"],
        }
        return loss, aux

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: jnp.ndarray,
                   rng: jax.Array) -> Tuple[TrainState, Dict]:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.sem_rvq, state.acc_rvq, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        sem_rvq = rvq_ema_update(state.sem_rvq, aux["sem_features"],
                                 aux["sem_codes"], decay=ema_decay)
        acc_rvq = rvq_ema_update(state.acc_rvq, aux["acc_features"],
                                 aux["acc_codes"], decay=ema_decay)
        metrics = {
            "loss": loss,
            "reconstruction_loss": aux["reconstruction_loss"],
            "commitment_loss": aux["commitment_loss"],
        }
        return TrainState(params, opt_state, sem_rvq, acc_rvq,
                          state.step + 1), metrics

    if mesh is None:
        return train_step

    def sharded_step(state, batch, rng):
        # Inputs carry NamedShardings; jit propagates them and inserts the
        # dp/tp collectives — no explicit mesh context needed.
        batch = jax.device_put(batch, batch_sharding(mesh))
        rng = jax.device_put(rng, replicated(mesh))
        return train_step(state, batch, rng)

    return sharded_step


def _forward_train(tokenizer, params, sem_rvq, acc_rvq, batch, rng,
                   t_target: int, use_pallas_rvq: bool = False):
    """Differentiable forward shared by the train step.  The RVQ stage is
    either the XLA scan (default — jax traces its stop_gradient structure)
    or the fused Pallas kernel with its analytic STE custom_vjp
    (``use_pallas_rvq=True``); both yield identical gradients
    (tests/test_rvq.py::test_train_path_gradients_match_xla)."""
    from ..dsp.resample import resample_jax
    from ..models.tokenizer import SEMANTIC_SR
    from ..ops.interp import interp_linear

    wave16 = resample_jax(batch, tokenizer.sample_rate, SEMANTIC_SR)
    sem_feats = tokenizer.semantic_encoder.apply(
        {"params": params["semantic_encoder"]}, wave16)
    acc_feats = tokenizer.mel_encoder.apply(
        {"params": params["mel_encoder"]}, batch)
    sem_feats = tokenizer.temporal_semantic.apply(
        {"params": params["temporal_semantic"]}, sem_feats)
    acc_feats = tokenizer.temporal_acoustic.apply(
        {"params": params["temporal_acoustic"]}, acc_feats)

    def align(f):
        return jnp.swapaxes(interp_linear(jnp.swapaxes(f, 1, 2), t_target), 1, 2)

    sem_a, acc_a = align(sem_feats), align(acc_feats)
    if use_pallas_rvq:
        from ..ops.rvq_pallas import rvq_encode_pallas_train

        sem_codes, sem_q, sem_losses = rvq_encode_pallas_train(sem_rvq, sem_a)
        acc_codes, acc_q, acc_losses = rvq_encode_pallas_train(acc_rvq, acc_a)
    else:
        rng_s, rng_a = jax.random.split(rng)
        sem_codes, sem_q, sem_losses = rvq_encode(
            sem_rvq, sem_a, stochastic=False, rng=rng_s)
        acc_codes, acc_q, acc_losses = rvq_encode(
            acc_rvq, acc_a, stochastic=False, rng=rng_a)

    out_samples = t_target * tokenizer.hop_length
    joint = jnp.concatenate([sem_q, acc_q], axis=-1)
    recon = tokenizer.decoder.apply(
        {"params": params["decoder"]}, joint, out_samples)
    recon_loss = jnp.mean((recon - batch[:, :out_samples]) ** 2)

    return {
        "reconstruction_loss": recon_loss,
        "commitment_loss": (sem_losses["commitment_loss"]
                            + acc_losses["commitment_loss"]),
        "sem_features": jax.lax.stop_gradient(sem_a),
        "acc_features": jax.lax.stop_gradient(acc_a),
        "sem_codes": sem_codes,
        "acc_codes": acc_codes,
    }

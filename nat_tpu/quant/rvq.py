"""Residual vector quantization — functional JAX core.

Counterpart of the reference's `VectorQuantizer` / `ResidualVectorQuantizer`
(neural_audio_tokenizer.py:1329-2222), redesigned for XLA:

* State is an explicit pytree (:class:`RVQState`) with all layers *stacked*
  — ``codebook [N, K, D]``, ``ema_count [N, K]``, ``ema_weight [N, K, D]`` —
  so the sequential residual chain is a `lax.scan` over the leading axis
  (the N=4 chain is inherently sequential; scan keeps it one compiled loop).
* Distances are computed as ``|x|² − 2·x·cᵀ + |c|²`` — one ``[B·T, D] ×
  [D, K]`` matmul per layer that XLA tiles onto the MXU.
* Token selection modes:
  - ``argmin`` (deterministic): plain nearest-neighbor — the documented
    deterministic mode of this framework (see SURVEY.md §6: the reference's
    "deterministic" mode still samples; we define deterministic = argmin and
    keep seeded sampling as the compat behavior).
  - ``stochastic``: temperature-softmax sampling over distances via the
    Gumbel-max trick (equivalent in distribution to the reference's
    ``softmax(-d/τ)`` + multinomial, 2150-2154), driven by a JAX PRNG key.
* EMA codebook updates are a separate pure function returning a new state —
  under data parallelism the count/sum statistics are `psum`'d across the
  mesh before the update (see :mod:`nat_tpu.parallel`).

A Pallas fused kernel for the full residual chain lives in
:mod:`nat_tpu.ops.rvq_pallas`; this module is the reference implementation
and the autodiff path (straight-through estimator).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RVQState(NamedTuple):
    """Stacked codebook state for an N-layer residual quantizer."""

    codebook: jnp.ndarray    # [N, K, D]
    ema_count: jnp.ndarray   # [N, K]
    ema_weight: jnp.ndarray  # [N, K, D]

    @property
    def num_layers(self) -> int:
        return self.codebook.shape[0]

    @property
    def codebook_size(self) -> int:
        return self.codebook.shape[1]

    @property
    def dim(self) -> int:
        return self.codebook.shape[2]


def init_rvq_state(rng: jax.Array, num_layers: int, codebook_size: int,
                   dim: int, scale: float = 1.0) -> RVQState:
    """Random-normal codebooks (the reference's fallback init)."""
    codebook = jax.random.normal(
        rng, (num_layers, codebook_size, dim), dtype=jnp.float32) * scale
    return RVQState(
        codebook=codebook,
        ema_count=jnp.zeros((num_layers, codebook_size), dtype=jnp.float32),
        ema_weight=codebook.copy(),
    )


def _distances(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances ``[M, K]`` from ``x [M, D]`` to ``codebook
    [K, D]`` — expansion keeps the inner term a single MXU matmul."""
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)             # [M, 1]
    c_sq = jnp.sum(codebook * codebook, axis=-1)[None, :]     # [1, K]
    # HIGHEST: argmin identity is sensitive to matmul rounding; default TPU
    # precision feeds the MXU bf16 inputs and flips near-tie tokens.
    cross = jnp.matmul(x, codebook.T,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # [M, K]
    return x_sq - 2.0 * cross + c_sq


def _select_codes(dist: jnp.ndarray, temperature: float,
                  stochastic: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    if stochastic:
        if rng is None:
            raise ValueError("stochastic quantization requires a PRNG key")
        # Reference samples softmax(-cdist/τ) over *euclidean* distances
        # (torch.cdist, reference 2146-2154); sampling over squared
        # distances would collapse to argmin at any realistic τ.
        gumbel = jax.random.gumbel(rng, dist.shape, dtype=dist.dtype)
        euclid = jnp.sqrt(jnp.maximum(dist, 0.0))
        return jnp.argmax(-euclid / temperature + gumbel, axis=-1)
    return jnp.argmin(dist, axis=-1)


@functools.partial(jax.jit, static_argnames=("stochastic", "per_row"))
def rvq_encode(
    state: RVQState,
    x: jnp.ndarray,                 # [B, T, D]
    temperature: float = 0.5,
    stochastic: bool = False,
    rng: Optional[jax.Array] = None,
    per_row: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Quantize features through the residual chain.

    Returns ``(codes [N, B, T], quantized [B, T, D], losses)``.  ``quantized``
    carries the straight-through estimator so gradients flow to ``x``.

    ``per_row=True`` returns each loss as a ``[B]`` vector (mean over that
    row's ``T*D`` elements) instead of a batch-mean scalar — required when
    rows are independent spans batched together (span-group dispatch):
    a batch-mean would mix spans and count zero-padding rows.  The default
    scalar equals ``per_row`` values' mean (rows have equal element counts),
    and is what training objectives consume.
    """
    b, t, d = x.shape
    flat = x.reshape(b * t, d)
    n = state.num_layers
    layer_rngs = (jax.random.split(rng, n) if rng is not None
                  else jnp.zeros((n, 2), dtype=jnp.uint32))

    def layer_step(carry, inputs):
        residual, quant_sum, commit_acc, codebook_acc = carry
        codebook_n, rng_n = inputs
        dist = _distances(residual, codebook_n)
        codes_n = _select_codes(dist, temperature, stochastic,
                                rng_n if stochastic else None)
        quantized_n = codebook_n[codes_n]                    # [M, D]
        # Per-layer VQ losses — per-row mean over T*D elements, matching the
        # reference's F.mse_loss scale (2162-2167) so the 0.25 commitment
        # weight mixes correctly with per-element-mean recon losses.
        commit = jnp.mean(
            ((residual - jax.lax.stop_gradient(quantized_n)) ** 2
             ).reshape(b, t * d), axis=1)                    # [B]
        codebook_loss = jnp.mean(
            ((jax.lax.stop_gradient(residual) - quantized_n) ** 2
             ).reshape(b, t * d), axis=1)                    # [B]
        new_residual = residual - jax.lax.stop_gradient(quantized_n)
        return ((new_residual, quant_sum + quantized_n,
                 commit_acc + commit, codebook_acc + codebook_loss), codes_n)

    init = (flat, jnp.zeros_like(flat),
            jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32))
    (residual, quant_sum, commit, codebook_loss), codes = jax.lax.scan(
        layer_step, init, (state.codebook, layer_rngs))

    # Straight-through: forward value is the quantized sum, gradient is id.
    quantized = flat + jax.lax.stop_gradient(quant_sum - flat)
    if not per_row:
        commit = jnp.mean(commit)
        codebook_loss = jnp.mean(codebook_loss)
    losses = {
        "commitment_loss": commit / n,
        "codebook_loss": codebook_loss / n,
        "total_vq_loss": (0.25 * commit + codebook_loss) / n,
    }
    return codes.reshape(n, b, t), quantized.reshape(b, t, d), losses


@jax.jit
def rvq_decode(state: RVQState, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode ``codes [N, B, T]`` → summed embeddings ``[B, T, D]``."""
    def layer_step(acc, inputs):
        codebook_n, codes_n = inputs
        return acc + codebook_n[codes_n], None

    n, b, t = codes.shape
    init = jnp.zeros((b, t, state.dim), dtype=state.codebook.dtype)
    out, _ = jax.lax.scan(layer_step, init, (state.codebook, codes))
    return out


@functools.partial(jax.jit, static_argnames=("axis_name",))
def rvq_ema_update(
    state: RVQState,
    x: jnp.ndarray,          # [B, T, D] pre-quantization features
    codes: jnp.ndarray,      # [N, B, T]
    decay: float = 0.99,
    epsilon: float = 1e-5,
    axis_name: Optional[str] = None,
) -> RVQState:
    """One EMA codebook update step (training mode, reference 2205-2221).

    With ``axis_name`` set (inside `shard_map`/`pmap`), the per-code counts
    and sums are all-reduced across the data-parallel axis before updating,
    so every replica applies the identical update — the TPU-native
    equivalent of a synchronized EMA.
    """
    n, b, t = codes.shape
    k, d = state.codebook_size, state.dim
    flat = x.reshape(b * t, d)

    def layer_stats(carry, inputs):
        residual = carry
        codebook_n, codes_n = inputs
        codes_flat = codes_n.reshape(-1)
        onehot = jax.nn.one_hot(codes_flat, k, dtype=residual.dtype)  # [M, K]
        count = jnp.sum(onehot, axis=0)                                # [K]
        vec_sum = jnp.matmul(onehot.T, residual,
                             preferred_element_type=jnp.float32)       # [K, D]
        quantized_n = codebook_n[codes_flat]
        return residual - quantized_n, (count, vec_sum)

    _, (counts, vec_sums) = jax.lax.scan(
        layer_stats, flat, (state.codebook, codes))

    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        vec_sums = jax.lax.psum(vec_sums, axis_name)

    new_count = decay * state.ema_count + (1.0 - decay) * counts
    new_weight = decay * state.ema_weight + (1.0 - decay) * vec_sums
    # Laplace-smoothed normalization
    total = jnp.sum(new_count, axis=-1, keepdims=True)
    stable_count = ((new_count + epsilon)
                    / (total + state.codebook_size * epsilon) * total)
    new_codebook = new_weight / jnp.maximum(stable_count[..., None], epsilon)
    # Only move codes that were actually used this step
    used = (counts > 0)[..., None]
    new_codebook = jnp.where(used, new_codebook, state.codebook)
    return RVQState(new_codebook, new_count, new_weight)


class ResidualVectorQuantizer:
    """Object façade over the functional core (public API parity with the
    reference's `ResidualVectorQuantizer`, man/neural_audio_tokenizer.3)."""

    def __init__(self, input_dim: int = 512, codebook_size: int = 4096,
                 num_quantizers: int = 4, commitment_weight: float = 0.25,
                 ema_decay: float = 0.99, temperature: float = 0.5,
                 use_stochastic: bool = False, seed: int = 0) -> None:
        self.input_dim = input_dim
        self.codebook_size = codebook_size
        self.num_quantizers = num_quantizers
        self.commitment_weight = commitment_weight
        self.ema_decay = ema_decay
        self.temperature = temperature
        self.use_stochastic = use_stochastic
        self.state = init_rvq_state(
            jax.random.PRNGKey(seed), num_quantizers, codebook_size, input_dim)
        self._rng = jax.random.PRNGKey(seed + 1)

    def encode(self, x, rng: Optional[jax.Array] = None):
        """``x [B, T, D]`` → list of ``[B, T]`` code arrays (reference shape)."""
        if self.use_stochastic and rng is None:
            self._rng, rng = jax.random.split(self._rng)
        codes, _, _ = rvq_encode(self.state, jnp.asarray(x),
                                 temperature=self.temperature,
                                 stochastic=self.use_stochastic, rng=rng)
        return [codes[i] for i in range(self.num_quantizers)]

    def __call__(self, x, rng: Optional[jax.Array] = None):
        if self.use_stochastic and rng is None:
            self._rng, rng = jax.random.split(self._rng)
        codes, quantized, losses = rvq_encode(
            self.state, jnp.asarray(x), temperature=self.temperature,
            stochastic=self.use_stochastic, rng=rng)
        return quantized, [codes[i] for i in range(self.num_quantizers)], losses

    def decode(self, codes_list):
        codes = jnp.stack([jnp.asarray(c) for c in codes_list])
        return rvq_decode(self.state, codes)

    def load_codebooks(self, codebook: np.ndarray,
                       ema_count: Optional[np.ndarray] = None,
                       ema_weight: Optional[np.ndarray] = None) -> None:
        codebook = jnp.asarray(codebook, dtype=jnp.float32)
        self.state = RVQState(
            codebook=codebook,
            ema_count=(jnp.asarray(ema_count, dtype=jnp.float32)
                       if ema_count is not None
                       else jnp.zeros(codebook.shape[:2], dtype=jnp.float32)),
            ema_weight=(jnp.asarray(ema_weight, dtype=jnp.float32)
                        if ema_weight is not None else codebook.copy()),
        )

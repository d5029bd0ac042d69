"""Semantic encoder: wav2vec2-style transformer in flax + spectral fallback.

Counterpart of reference `SemanticAudioEncoder` (neural_audio_tokenizer.py:
2306-2442), which wraps a frozen HF ``facebook/wav2vec2-base``.  Here the
architecture is implemented natively in flax (conv feature extractor →
feature projection → conv positional embedding → 12 post-norm transformer
layers), with:

* :func:`convert_wav2vec2_state_dict` — maps a locally available HF torch
  checkpoint onto the flax param tree (no network, no torch at runtime —
  tensors are converted to numpy once at init);
* the same module doubles as the MERT encoder (MERT-v1-95M is the same
  wav2vec2 topology) for checkpoint-based codebook seeding;
* a spectral fallback (framed rFFT → centroid+bandwidth → linear) when no
  checkpoint is available, mirroring the reference's degraded path
  (2382-2442).

TPU notes: attention is standard dense MHA over ≤ a few thousand frames —
XLA's fused attention is sufficient (no flash/ring needed at 95 M scale,
SURVEY.md §5.7); matmuls run in float32 params with bf16 compute optional.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# facebook/wav2vec2-base feature-extractor schedule: (dim, kernel, stride)
CONV_LAYERS: Sequence[Tuple[int, int, int]] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
)
HIDDEN = 768
NUM_LAYERS = 12
NUM_HEADS = 12
FFN_DIM = 3072
POS_CONV_KERNEL = 128
POS_CONV_GROUPS = 16


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with a dtype-gated lowering.

    HF wav2vec2 uses the exact erf GELU, and float32 paths (CPU tests,
    torch-differential conversion parity, recorded goldens) keep it.  In
    bfloat16 the erf is the single most expensive VPU op in the whole
    forward (measured: half the feature-extractor wall, ~80 ms/call at
    batch 64×30 s), while the tanh approximation's worst-case error
    (4.7e-4 abs, at x≈−2.7) sits 33× below bf16's own quantization step
    (1.6e-2 on the same range) — the substitution is value-invisible at
    this precision and ~2× faster."""
    if x.dtype == jnp.bfloat16:
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


def feature_extractor_output_length(
        num_samples: int,
        conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS) -> int:
    t = num_samples
    for _, kernel, stride in conv_layers:
        t = (t - kernel) // stride + 1
    return t


class FeatureExtractor(nn.Module):
    """7-layer strided conv stack, 16 kHz waveform → [B, T', 512] @ ~50 Hz."""

    dtype: jnp.dtype = jnp.float32
    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x[..., None].astype(self.dtype)               # [B, T, 1]
        for i, (dim, kernel, stride) in enumerate(self.conv_layers):
            h = nn.Conv(dim, (kernel,), strides=(stride,), padding="VALID",
                        use_bias=False, dtype=self.dtype, name=f"conv_{i}")(h)
            if i == 0:  # base config: group-norm after the first conv only
                h = nn.GroupNorm(num_groups=dim, dtype=self.dtype,
                                 name="group_norm")(h)
            h = _gelu(h)  # exact erf in f32 (HF parity); tanh in bf16
        return h


class TransformerLayer(nn.Module):
    """Post-norm encoder layer (wav2vec2-base convention)."""

    dtype: jnp.dtype = jnp.float32
    hidden: int = HIDDEN
    num_heads: int = NUM_HEADS
    ffn_dim: int = FFN_DIM

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.hidden,
            out_features=self.hidden,
            dtype=self.dtype, name="attention")(x, x)
        x = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x + attn)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        ffn = nn.Dense(self.hidden, dtype=self.dtype,
                       name="fc2")(_gelu(ffn))
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x + ffn)


class Wav2Vec2Encoder(nn.Module):
    """Full wav2vec2-base trunk: 16 kHz waveform → hidden states [B, T', 768].

    Defaults are the facebook/wav2vec2-base config (what checkpoints load
    into); the size fields exist so sharding dryruns and tests can compile a
    structurally identical tiny transformer cheaply.
    """

    dtype: jnp.dtype = jnp.float32
    hidden: int = HIDDEN
    num_layers: int = NUM_LAYERS
    num_heads: int = NUM_HEADS
    ffn_dim: int = FFN_DIM
    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    pos_conv_kernel: int = POS_CONV_KERNEL
    pos_conv_groups: int = POS_CONV_GROUPS

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        feats = FeatureExtractor(dtype=self.dtype,
                                 conv_layers=self.conv_layers,
                                 name="feature_extractor")(waveform)
        h = nn.LayerNorm(dtype=self.dtype, name="fp_layer_norm")(feats)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fp_projection")(h)

        # Convolutional positional embedding (grouped conv, GELU), then
        # post-norm. HF pads 64 both sides and drops the final column.
        pos = nn.Conv(self.hidden, (self.pos_conv_kernel,),
                      feature_group_count=self.pos_conv_groups,
                      padding=[(self.pos_conv_kernel // 2,
                                self.pos_conv_kernel // 2)],
                      dtype=self.dtype, name="pos_conv")(h)
        pos = _gelu(pos[:, : h.shape[1], :])
        h = nn.LayerNorm(dtype=self.dtype, name="encoder_layer_norm")(h + pos)

        for i in range(self.num_layers):
            h = TransformerLayer(dtype=self.dtype, hidden=self.hidden,
                                 num_heads=self.num_heads,
                                 ffn_dim=self.ffn_dim, name=f"layer_{i}")(h)
        return h


class SemanticAudioEncoder(nn.Module):
    """wav2vec2 trunk + 768→output_dim projection: [B, T16k] → [B, T', D]."""

    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    arch: Optional[Dict[str, Any]] = None   # Wav2Vec2Encoder size overrides

    @nn.compact
    def __call__(self, waveform_16k: jnp.ndarray) -> jnp.ndarray:
        h = Wav2Vec2Encoder(dtype=self.dtype, name="wav2vec2",
                            **(self.arch or {}))(waveform_16k)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="projection")(h).astype(jnp.float32)


class SpectralFallbackEncoder(nn.Module):
    """Degraded-mode semantic features: framed rFFT → spectral centroid +
    bandwidth → linear lift to output_dim (reference 2382-2442)."""

    output_dim: int = 512
    frame_length: int = 1024
    hop_length: int = 320   # ≈50 Hz at 16 kHz, matching the neural path rate

    @nn.compact
    def __call__(self, waveform_16k: jnp.ndarray) -> jnp.ndarray:
        from ..dsp.stft import stft_power

        spec = stft_power(waveform_16k, n_fft=self.frame_length,
                          hop_length=self.hop_length, center=True,
                          power=2.0)                       # [B, F, T]
        freqs = jnp.arange(spec.shape[-2], dtype=jnp.float32)[None, :, None]
        total = jnp.sum(spec, axis=-2, keepdims=True) + 1e-8
        centroid = jnp.sum(freqs * spec, axis=-2, keepdims=True) / total
        bandwidth = jnp.sqrt(
            jnp.sum(((freqs - centroid) ** 2) * spec, axis=-2, keepdims=True)
            / total)
        feats = jnp.concatenate([centroid, bandwidth], axis=-2)  # [B, 2, T]
        feats = jnp.swapaxes(feats, 1, 2)                        # [B, T, 2]
        return nn.Dense(self.output_dim, name="lift")(feats)


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def _np(tensor) -> np.ndarray:
    return np.asarray(tensor.detach().cpu().numpy()
                      if hasattr(tensor, "detach") else tensor)


def convert_wav2vec2_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Map an HF ``Wav2Vec2Model`` state_dict to :class:`SemanticAudioEncoder`
    flax params (sans the output projection, which is ours).

    torch Conv1d weights are ``[out, in, k]`` → flax ``[k, in, out]``; torch
    Linear ``[out, in]`` → flax ``[in, out]``.  The positional conv uses
    torch weight-norm (``weight_g``/``weight_v``).
    """
    def conv_w(name):
        return np.transpose(_np(state_dict[name]), (2, 1, 0))

    def lin(prefix):
        return {"kernel": np.transpose(_np(state_dict[prefix + ".weight"])),
                "bias": _np(state_dict[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": _np(state_dict[prefix + ".weight"]),
                "bias": _np(state_dict[prefix + ".bias"])}

    params: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i in range(len(CONV_LAYERS)):
        fe[f"conv_{i}"] = {
            "kernel": conv_w(f"feature_extractor.conv_layers.{i}.conv.weight")}
    fe["group_norm"] = ln("feature_extractor.conv_layers.0.layer_norm")
    params["feature_extractor"] = fe

    params["fp_layer_norm"] = ln("feature_projection.layer_norm")
    params["fp_projection"] = lin("feature_projection.projection")

    # weight-normed positional conv: W = g * v / ||v||  (norm over (in, k)).
    # Old checkpoints store weight_g/weight_v; torch ≥2.1 exports
    # parametrizations.weight.original0/original1.
    prefix = "encoder.pos_conv_embed.conv"
    if f"{prefix}.weight_g" in state_dict:
        g = _np(state_dict[f"{prefix}.weight_g"])
        v = _np(state_dict[f"{prefix}.weight_v"])
    else:
        g = _np(state_dict[f"{prefix}.parametrizations.weight.original0"])
        v = _np(state_dict[f"{prefix}.parametrizations.weight.original1"])
    # HF applies weight_norm with dim=2 (g broadcast over out/in, one gain
    # per kernel position); normalize over exactly the axes g broadcasts.
    norm_axes = tuple(ax for ax in range(v.ndim) if g.shape[ax] == 1)
    norm = np.sqrt((v ** 2).sum(axis=norm_axes, keepdims=True)) + 1e-12
    w = g * v / norm                                     # [out, in/g, k]
    params["pos_conv"] = {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": _np(state_dict["encoder.pos_conv_embed.conv.bias"]),
    }
    params["encoder_layer_norm"] = ln("encoder.layer_norm")

    head_dim = HIDDEN // NUM_HEADS
    for i in range(NUM_LAYERS):
        p = f"encoder.layers.{i}"
        def attn_proj(name):
            w = np.transpose(_np(state_dict[f"{p}.attention.{name}.weight"]))
            b = _np(state_dict[f"{p}.attention.{name}.bias"])
            return {"kernel": w.reshape(HIDDEN, NUM_HEADS, head_dim),
                    "bias": b.reshape(NUM_HEADS, head_dim)}

        out_w = np.transpose(_np(state_dict[f"{p}.attention.out_proj.weight"]))
        params[f"layer_{i}"] = {
            "attention": {
                "query": attn_proj("q_proj"),
                "key": attn_proj("k_proj"),
                "value": attn_proj("v_proj"),
                "out": {"kernel": out_w.reshape(NUM_HEADS, head_dim, HIDDEN),
                        "bias": _np(state_dict[f"{p}.attention.out_proj.bias"])},
            },
            "layer_norm": ln(f"{p}.layer_norm"),
            "fc1": lin(f"{p}.feed_forward.intermediate_dense"),
            "fc2": lin(f"{p}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
        }
    return params


def load_pretrained_semantic_params(
    model_name: str = "facebook/wav2vec2-base",
) -> Optional[Dict]:
    """Load + convert a local HF checkpoint; None when unavailable."""
    from ..quant.seeding import load_pretrained_state_dict

    sd = load_pretrained_state_dict(model_name)
    if sd is None:
        return None
    try:
        return {"wav2vec2": convert_wav2vec2_state_dict(sd)}
    except Exception as exc:
        from ..utils.logging import logger

        logger.warn(f"wav2vec2 weight conversion failed: {exc}")
        return None

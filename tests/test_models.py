"""Model-stack tests: encoders, tokenizer integration, shape arithmetic.

Uses the spectral-fallback semantic path (no checkpoints in CI) and small
codebooks so single-core CPU runs stay fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nat_tpu.models.encoders import MelResidualEncoder, MultiScaleTemporalEncoder
from nat_tpu.models.semantic import (SpectralFallbackEncoder,
                                     feature_extractor_output_length)
from nat_tpu.ops.interp import interp_linear


def test_interp_linear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    ours = np.asarray(interp_linear(jnp.asarray(x), 20))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=20, mode="linear",
        align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_interp_linear_identity():
    x = jnp.arange(12.0).reshape(1, 12)
    np.testing.assert_array_equal(np.asarray(interp_linear(x, 12)),
                                  np.asarray(x))


def test_interp_linear_matmul_matches_gather():
    """The MXU-matmul lowering and the gather lowering compute the same
    resize (both up and down); the gather branch is forced by shrinking
    the dense-operator limit."""
    from nat_tpu.ops import interp as interp_mod

    rng = np.random.default_rng(7)
    for t, new_t in [(50, 20), (20, 50), (1499, 81), (3, 7), (7, 3)]:
        x = jnp.asarray(rng.standard_normal((2, 5, t)).astype(np.float32))
        via_matmul = np.asarray(interp_linear(x, new_t))
        old_limit = interp_mod._MATMUL_LIMIT
        try:
            interp_mod._MATMUL_LIMIT = 0
            via_gather = np.asarray(interp_linear(x, new_t))
        finally:
            interp_mod._MATMUL_LIMIT = old_limit
        np.testing.assert_allclose(via_matmul, via_gather,
                                   rtol=1e-6, atol=1e-6)


def test_interp_linear_matmul_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 17)).astype(np.float32)
    ours = np.asarray(interp_linear(jnp.asarray(x), 40))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=40, mode="linear",
        align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mel_encoder_downsamples_16x():
    enc = MelResidualEncoder(output_dim=64, channels=(8, 8, 8, 8, 16, 16),
                             sample_rate=22050)
    x = jnp.zeros((1, 22050))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    t_mel = 22050 // 512 + 1   # 44
    assert out.shape == (1, -(-t_mel // 16), 64)  # ceil(44/16) = 3


def test_temporal_encoder_preserves_length():
    enc = MultiScaleTemporalEncoder(input_dim=32, branch_dim=8)
    x = jnp.zeros((2, 37, 32))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 37, 32)


def test_spectral_fallback_shapes():
    enc = SpectralFallbackEncoder(output_dim=64)
    x = jnp.zeros((1, 16000))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (1, 16000 // 320 + 1, 64)


def test_w2v2_feature_extractor_length():
    # 1 s at 16 kHz → ~50 frames (stride product 320)
    assert feature_extractor_output_length(16000) == 49


class TestTokenizer:
    @pytest.fixture(scope="class")
    def tokenizer(self):
        from nat_tpu.models.tokenizer import NeuralAudioTokenizer

        return NeuralAudioTokenizer(
            codebook_size=128, enable_codebook_cache=False,
            use_pretrained_semantic=False, enable_reconstruction=True,
            codebook_init_method="random")

    @pytest.fixture(scope="class")
    def result(self, tokenizer):
        t = np.arange(11025) / 22050
        x = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
        return tokenizer(x[None, :], actual_sample_rate=22050)

    def test_result_dict_shape(self, result):
        assert len(result["semantic_codes"]) == 4
        assert len(result["acoustic_codes"]) == 4
        assert result["num_frames"] >= 1
        for codes in result["semantic_codes"] + result["acoustic_codes"]:
            assert codes.shape == (1, result["num_frames"])
            assert codes.dtype in (np.int16, np.int32, np.int64)
            assert np.all(codes >= 0) and np.all(codes < 128)

    def test_compat_timebase_is_min_of_streams(self, tokenizer, result):
        t_sem = tokenizer._semantic_frames(11025)
        t_acc = tokenizer._acoustic_frames(11025)
        assert result["num_frames"] == min(t_sem, t_acc)

    def test_reconstruction_emitted(self, result):
        assert result["reconstructed"] is not None
        assert result["reconstructed"].shape[-1] >= 512

    def test_losses_present(self, result):
        assert "total_vq_loss" in result["losses"]

    def test_deterministic_repeat(self, tokenizer):
        t = np.arange(11025) / 22050
        x = (np.sin(2 * np.pi * 330 * t) * 0.5).astype(np.float32)
        r1 = tokenizer(x[None, :])
        r2 = tokenizer(x[None, :])
        for a, b in zip(r1["semantic_codes"], r2["semantic_codes"]):
            np.testing.assert_array_equal(a, b)

    def test_token_content_tracks_signal(self, tokenizer):
        """Different audio must map to different token streams."""
        t = np.arange(11025) / 22050
        x1 = (np.sin(2 * np.pi * 220 * t) * 0.5).astype(np.float32)
        x2 = np.sign(np.sin(2 * np.pi * 700 * t)).astype(np.float32) * 0.3
        r1 = tokenizer(x1[None, :])
        r2 = tokenizer(x2[None, :])
        all1 = np.concatenate([c.ravel() for c in
                               r1["semantic_codes"] + r1["acoustic_codes"]])
        all2 = np.concatenate([c.ravel() for c in
                               r2["semantic_codes"] + r2["acoustic_codes"]])
        assert np.any(all1 != all2)

    def test_frame_timebase_mode(self):
        from nat_tpu.models.tokenizer import NeuralAudioTokenizer

        tok = NeuralAudioTokenizer(
            codebook_size=64, enable_codebook_cache=False,
            use_pretrained_semantic=False, enable_reconstruction=False,
            codebook_init_method="random", timebase="frame")
        x = np.zeros((1, 11025), dtype=np.float32)
        out = tok(x)
        assert out["num_frames"] == 11025 // 512  # header-advertised rate

    def test_decode_tokens_roundtrip_shape(self, tokenizer, result):
        wave = tokenizer.decode_tokens(result["semantic_codes"],
                                       result["acoustic_codes"])
        assert wave.shape == (1, result["num_frames"] * 512)

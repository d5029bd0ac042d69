"""EnCodec feature bridge: JAX SEANet encoder vs torch transformers.

A randomly initialized torch EncodecModel (local, no network) is the
numeric ground truth: its state_dict converts into the functional JAX
encoder, and both must produce the same latents (conv padding, weight
norm, ELU, residuals, and LSTM semantics all have to match).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from nat_tpu.models import encodec as enc_jax  # noqa: E402

RATIOS = [8, 5, 4, 2]


@pytest.fixture(scope="module")
def torch_model():
    from transformers import EncodecConfig, EncodecModel

    cfg = EncodecConfig(
        audio_channels=1, num_filters=8, num_residual_layers=1,
        upsampling_ratios=RATIOS, hidden_size=16, codebook_size=64,
        codebook_dim=16, num_lstm_layers=2, kernel_size=7,
        last_kernel_size=7, residual_kernel_size=3, compress=2,
        sampling_rate=24000, target_bandwidths=[1.5, 3.0],
    )
    torch.manual_seed(0)
    model = EncodecModel(cfg).eval()
    return model


def test_conversion_and_forward_parity(torch_model, tmp_path):
    state = {k: v.detach().numpy()
             for k, v in torch_model.state_dict().items()}
    params = enc_jax.convert_encoder_params(state, RATIOS)
    assert params is not None
    kinds = [k for k, _ in params["layers"]]
    # conv, 4× (resnet, conv), lstm, conv
    assert kinds == ["conv", "resnet", "conv", "resnet", "conv",
                     "resnet", "conv", "resnet", "conv", "lstm", "conv"]

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 2400)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.encoder(torch.from_numpy(wave)[:, None, :])
    ref = ref.permute(0, 2, 1).numpy()  # [B, T, H]

    ours = np.asarray(enc_jax.encoder_forward(params, wave))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_bridge_from_checkpoint_file(torch_model, tmp_path, monkeypatch):
    torch.save(torch_model.state_dict(),
               str(tmp_path / "pytorch_model.bin"))
    bridge = enc_jax.EncodecFeatureBridge(str(tmp_path), RATIOS)
    assert bridge.available
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal(24000) * 0.3).astype(np.float32)
    feats = bridge.extract_features_for_initialization(wave, 24000)
    assert feats.ndim == 2 and feats.shape[1] == 16
    # 24000 samples / (8*5*4*2) = 75 latent frames
    assert abs(feats.shape[0] - 75) <= 1
    assert np.all(np.isfinite(feats))


def test_bridge_resamples_non_native_rate(torch_model, tmp_path):
    torch.save(torch_model.state_dict(),
               str(tmp_path / "pytorch_model.bin"))
    bridge = enc_jax.EncodecFeatureBridge(str(tmp_path), RATIOS)
    wave = np.sin(np.linspace(0, 440 * 2 * np.pi, 22050)).astype(np.float32)
    feats = bridge.extract_features_for_initialization(wave, 22050)
    # one second of audio at any input rate → ~75 latent frames
    assert abs(feats.shape[0] - 75) <= 2


def test_missing_checkpoint_disables_bridge(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
    bridge = enc_jax.EncodecFeatureBridge("no/such-model")
    assert not bridge.available
    with pytest.raises(RuntimeError):
        bridge.extract_features_for_initialization(
            np.zeros(100, np.float32), 24000)

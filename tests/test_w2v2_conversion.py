"""wav2vec2 architecture + weight-converter validation against torch.

No pretrained checkpoint is available offline, but `transformers` can build
a random-initialized torch Wav2Vec2Model locally; converting its state_dict
through `convert_wav2vec2_state_dict` and comparing forward outputs
validates the flax reimplementation AND the converter end-to-end.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from nat_tpu.models.semantic import (Wav2Vec2Encoder,
                                     convert_wav2vec2_state_dict,
                                     feature_extractor_output_length)


@pytest.fixture(scope="module")
def torch_model():
    config = transformers.Wav2Vec2Config()  # facebook/wav2vec2-base shape
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(config)
    model.eval()
    return model


def test_forward_parity_with_torch(torch_model):
    """Flax trunk with converted weights must match torch's hidden states."""
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(8000) * 0.2).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(wave)[None, :]).last_hidden_state
    ref = ref.numpy()

    params = convert_wav2vec2_state_dict(dict(torch_model.state_dict()))
    enc = Wav2Vec2Encoder()
    init = jax.jit(enc.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8000), jnp.float32))["params"]
    # Every converted leaf must exist in (and shape-match) the flax tree
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    init_shapes = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_init}
    flat_conv = jax.tree_util.tree_leaves_with_path(params)
    for path, value in flat_conv:
        key = jax.tree_util.keystr(path)
        assert key in init_shapes, f"converted param {key} not in flax tree"
        assert np.shape(value) == init_shapes[key], key

    ours = np.asarray(enc.apply({"params": params},
                                jnp.asarray(wave)[None, :]))

    assert ours.shape == ref.shape == (
        1, feature_extractor_output_length(8000), 768)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-3)
    # Tight agreement on average (per-element f32/conv-order noise only)
    assert np.mean(np.abs(ours - ref)) / scale < 2e-4


def test_feature_extractor_length_matches_torch(torch_model):
    for n in (4000, 8000, 16000):
        with torch.no_grad():
            out = torch_model.feature_extractor(
                torch.zeros(1, n)).shape[-1]
        assert feature_extractor_output_length(n) == out

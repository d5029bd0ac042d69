"""Model checkpoint save/load round-trips."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nat_tpu.runtime.checkpoint import load_model, save_model


@pytest.fixture(scope="module")
def tokenizer():
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    tok = NeuralAudioTokenizer(
        codebook_size=64, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=False)
    tok.ensure_initialized()
    return tok


def test_roundtrip_restores_tokens(tokenizer, tmp_path):
    path = str(tmp_path / "model.msgpack")
    x = np.random.default_rng(0).standard_normal((1, 11025)).astype(np.float32)
    before = tokenizer(x)

    save_model(path, tokenizer)

    # Perturb the codebooks, then restore
    from nat_tpu.quant.rvq import RVQState
    import jax.numpy as jnp

    tokenizer.sem_rvq = RVQState(
        tokenizer.sem_rvq.codebook + 1.0,
        tokenizer.sem_rvq.ema_count, tokenizer.sem_rvq.ema_weight)
    tokenizer._forward_cache.clear()
    perturbed = tokenizer(x)
    assert any(np.any(a != b) for a, b in
               zip(before["semantic_codes"], perturbed["semantic_codes"]))

    assert load_model(path, tokenizer)
    after = tokenizer(x)
    for a, b in zip(before["semantic_codes"], after["semantic_codes"]):
        np.testing.assert_array_equal(a, b)


def test_incompatible_checkpoint_rejected(tokenizer, tmp_path):
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    path = str(tmp_path / "model.msgpack")
    save_model(path, tokenizer)

    other = NeuralAudioTokenizer(
        codebook_size=128, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=False)
    other.ensure_initialized()
    assert not load_model(path, other)


def test_garbage_file_rejected(tokenizer, tmp_path):
    path = tmp_path / "junk.msgpack"
    path.write_bytes(b"not a checkpoint")
    assert not load_model(str(path), tokenizer)

"""DP inference runner: sharded batch results match per-file results."""

import numpy as np
import pytest

import jax

from nat_tpu.parallel.mesh import make_mesh
from nat_tpu.parallel.runner import DataParallelRunner

pytestmark = [pytest.mark.mesh, pytest.mark.skipif(
    len(jax.devices()) < 4,
    reason="needs virtual devices (NAT_TPU_TEST_DEVICES=8)")]


@pytest.fixture(scope="module")
def tokenizer():
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    return NeuralAudioTokenizer(
        codebook_size=64, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=False)


def test_runner_matches_sequential(tokenizer):
    rng = np.random.default_rng(0)
    waves = [
        (rng.standard_normal(9000) * 0.3).astype(np.float32),
        (rng.standard_normal(11025) * 0.3).astype(np.float32),
        (rng.standard_normal(10000) * 0.3).astype(np.float32),
        (rng.standard_normal(7000) * 0.3).astype(np.float32),
    ]
    runner = DataParallelRunner(
        tokenizer, mesh=make_mesh((4, 1), devices=jax.devices()[:4]))
    batched = runner.tokenize_many(waves)

    for wave, result in zip(waves, batched):
        solo = tokenizer(wave[None, :])
        assert result["num_frames"] == solo["num_frames"]
        for a, b in zip(result["semantic_codes"], solo["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(result["acoustic_codes"], solo["acoustic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_runner_group_padding(tokenizer):
    """File counts that don't divide dp still work (zero-padded rows)."""
    rng = np.random.default_rng(1)
    waves = [(rng.standard_normal(8000) * 0.3).astype(np.float32)
             for _ in range(3)]
    runner = DataParallelRunner(
        tokenizer, mesh=make_mesh((4, 1), devices=jax.devices()[:4]))
    results = runner.tokenize_many(waves)
    assert len(results) == 3
    assert all(r is not None for r in results)

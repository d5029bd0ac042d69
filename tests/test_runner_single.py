"""Single-device batched execution: the DataParallelRunner is also the
right execution shape on ONE device (stacked spans amortize dispatch and
fill the MXU), so the pipeline batches there too — results must match
sequential tokenization exactly."""

import numpy as np
import pytest

from nat_tpu.parallel.runner import DataParallelRunner


@pytest.fixture(scope="module")
def tokenizer():
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    return NeuralAudioTokenizer(
        codebook_size=64, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=False)


def test_single_device_batch_matches_sequential(tokenizer):
    rng = np.random.default_rng(0)
    waves = [
        (rng.standard_normal(9000) * 0.3).astype(np.float32),
        (rng.standard_normal(11025) * 0.3).astype(np.float32),
        (rng.standard_normal(7000) * 0.3).astype(np.float32),
    ]
    runner = DataParallelRunner(tokenizer)
    assert runner.dp >= 1
    batched = runner.tokenize_many(waves)
    for wave, result in zip(waves, batched):
        solo = tokenizer(wave[None, :])
        assert result["num_frames"] == solo["num_frames"]
        for a, b in zip(result["semantic_codes"], solo["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(result["acoustic_codes"], solo["acoustic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_subbatching(tokenizer, monkeypatch):
    """Groups larger than MAX_ROWS split into bounded sub-batches."""
    monkeypatch.setattr(DataParallelRunner, "MAX_ROWS", 2)
    rng = np.random.default_rng(1)
    waves = [(rng.standard_normal(8000) * 0.3).astype(np.float32)
             for _ in range(5)]
    runner = DataParallelRunner(tokenizer)
    results = runner.tokenize_many(waves)
    assert len(results) == 5
    for wave, result in zip(waves, results):
        solo = tokenizer(wave[None, :])
        for a, b in zip(result["semantic_codes"], solo["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pipeline_tokenize_many_single_device(tokenizer, tmp_path):
    """pipeline._tokenize_many batches on one device and matches the
    sequential result entry-for-entry."""
    from nat_tpu.io.audio import write_wav
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    rng = np.random.default_rng(2)
    paths = []
    for i, n in enumerate((9000, 7000)):
        p = tmp_path / f"in_{i}.wav"
        write_wav(str(p), (rng.standard_normal(n) * 0.3).astype(np.float32),
                  22050)
        paths.append(str(p))

    pipe = AudioTokenizationPipeline(
        model_config={"codebook_size": 64},
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    pipe.tokenizer = tokenizer
    pipe.compat_mode = False

    prepared = pipe._tokenize_many(paths)
    assert all(not isinstance(p, Exception) for p in prepared)
    for (audio, sr, result, _t) in prepared:
        solo = tokenizer(audio[None, :], actual_sample_rate=sr)
        for a, b in zip(result["semantic_codes"], solo["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Incremental (chunk-streaming) NDJSON emission: byte-parity with the
buffered path for dense and RLE modes, across chunk boundaries."""

import numpy as np
import pytest


from nat_tpu.stream.protocol import StreamingProtocol


def _proto(**kwargs):
    return StreamingProtocol(sample_rate=22050, hop_length=512,
                             codebook_size=1024, **kwargs)


def _tokens_dict(sem, acc):
    return {
        "semantic_codes": [sem[i][None, :] for i in range(sem.shape[0])],
        "acoustic_codes": [acc[i][None, :] for i in range(acc.shape[0])],
    }


def _incremental(proto, sem, acc, chunk_sizes):
    lines = [proto.begin_stream(duration_seconds=1.0)]
    pos = 0
    for size in chunk_sizes:
        lines.extend(proto.feed_frames(sem[:, pos:pos + size],
                                       acc[:, pos:pos + size]))
        pos += size
    lines.extend(proto.end_stream())
    return "\n".join(lines)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("chunks", [[100], [40, 35, 25], [1] * 10 + [90]])
def test_incremental_matches_buffered(rle, chunks):
    rng = np.random.default_rng(0)
    # Slow semantic (RLE-friendly runs) + fast acoustic
    sem = np.repeat(rng.integers(0, 6, (4, 10)), 10, axis=1)
    acc = rng.integers(0, 1024, (4, 100))

    buffered = _proto(rle_mode=rle).create_ndjson_stream(
        _tokens_dict(sem, acc), duration_seconds=1.0)
    incremental = _incremental(_proto(rle_mode=rle), sem, acc, chunks)
    assert incremental == buffered


def test_incremental_rle_keyframes_match():
    # Long enough for several keyframes (1000 frames ≈ 23 s)
    sem = np.full((4, 1000), 3)
    acc = np.full((4, 1000), 7)
    buffered = _proto(rle_mode=True).create_ndjson_stream(
        _tokens_dict(sem, acc), duration_seconds=23.2)
    incremental = _incremental(_proto(rle_mode=True), sem, acc,
                               [300, 300, 400])
    # Header duration differs (23.2 vs 1.0 default); compare frame bodies
    buf_events = buffered.splitlines()[1:]
    inc_events = incremental.splitlines()[1:]
    assert inc_events == buf_events


@pytest.mark.slow
def test_pipeline_stream_audio_matches_buffered(tmp_path):
    """End-to-end: stream_audio's emitted lines == process_audio's buffered
    ndjson_output (neural CPU path, multi-chunk 40 s input)."""
    from nat_tpu.io.audio import write_wav
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    sr = 22050
    t = np.arange(int(sr * 40)) / sr
    x = (np.sin(2 * np.pi * 330 * t) * 0.5
         + 0.2 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    path = tmp_path / "long.wav"
    write_wav(str(path), x, sr)

    def make_pipeline():
        return AudioTokenizationPipeline(
            model_config={"codebook_size": 64},
            enable_compat_fallback=False,
            deterministic=True,
            enable_reconstruction=False,
            codebook_init_method="random",
            enable_codebook_cache=False,
        )

    p1 = make_pipeline()
    if p1.compat_mode:
        pytest.skip("neural path unavailable")
    buffered = p1.process_audio(str(path), ndjson_streaming=True)

    p2 = make_pipeline()
    streamed_lines = []
    p2.stream_audio(str(path), streamed_lines.append)

    buf_lines = buffered["ndjson_output"].splitlines()
    # stats carry wall-clock values; compare all lines except `end`
    assert streamed_lines[:-1] == buf_lines[:-1]
    assert '"event":"end"' in streamed_lines[-1]
    assert len(streamed_lines) == len(buf_lines)


@pytest.mark.slow
def test_span_group_batching_byte_identical(tmp_path, monkeypatch):
    """Grouped [G, bucket] span dispatch (the TPU streaming fast path)
    emits byte-identical NDJSON to sequential [1, bucket] dispatch —
    rows are independent and zero-row padding is discarded."""
    from nat_tpu.io.audio import write_wav
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    sr = 22050
    t = np.arange(int(sr * 90)) / sr
    x = (np.sin(2 * np.pi * 220 * t) * 0.4
         + 0.2 * np.sin(2 * np.pi * 880 * t)
         + 0.05 * np.sin(2 * np.pi * 55 * t)).astype(np.float32)
    path = tmp_path / "ninety.wav"
    write_wav(str(path), x, sr)

    def run(group: str):
        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", group)
        pipe = AudioTokenizationPipeline(
            model_config={"codebook_size": 64, "semantic_dim": 64,
                          "acoustic_dim": 64, "n_mels": 32},
            enable_compat_fallback=False,
            deterministic=True,
            enable_reconstruction=False,
            codebook_init_method="random",
            enable_codebook_cache=False,
        )
        if pipe.compat_mode:
            pytest.skip("neural path unavailable")
        lines = []
        pipe.stream_audio(str(path), lines.append)
        return lines

    sequential = run("1")
    grouped = run("4")   # 90 s → spans 28+28+28+6 s: [s0], [s1, s2], [s3]
    assert grouped[:-1] == sequential[:-1]
    assert len(grouped) == len(sequential)


def test_span_group_tokens_identical_tokenizer_level(monkeypatch):
    """Default-lane guard for grouped dispatch: tokenizer codes for a
    multi-span signal are identical with sequential [1, bucket] and
    padded-group [G, bucket] dispatch (cheap spectral-fallback config;
    the full-pipeline byte-level check is the slow-lane test above)."""
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    sr = 4000
    rng = np.random.default_rng(7)
    x = rng.standard_normal(int(sr * 90)).astype(np.float32) * 0.3

    def run(group: str):
        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", group)
        tok = NeuralAudioTokenizer(
            sample_rate=sr, codebook_size=64, semantic_dim=32,
            acoustic_dim=32, n_mels=16, enable_codebook_cache=False,
            use_pretrained_semantic=False, codebook_init_method="random",
            enable_reconstruction=False)
        return tok(x[None, :])

    seq, grp = run("1"), run("4")
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in seq["semantic_codes"]]),
        np.stack([np.asarray(c) for c in grp["semantic_codes"]]))
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in seq["acoustic_codes"]]),
        np.stack([np.asarray(c) for c in grp["acoustic_codes"]]))


def test_want_features_false_skips_fetch_keeps_tokens(monkeypatch):
    """``want_features=False`` (the token-only fast path used by the
    streaming CLI) must leave feature entries ``None`` while producing
    identical codes and losses, on both single and grouped dispatch."""
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    sr = 4000
    rng = np.random.default_rng(11)
    x = rng.standard_normal(int(sr * 90)).astype(np.float32) * 0.3

    monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
    tok = NeuralAudioTokenizer(
        sample_rate=sr, codebook_size=64, semantic_dim=32,
        acoustic_dim=32, n_mels=16, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=False)
    with_f = tok(x[None, :], want_features=True)
    without_f = tok(x[None, :], want_features=False)

    assert with_f["semantic_features"] is not None
    assert with_f["acoustic_features"] is not None
    assert without_f["semantic_features"] is None
    assert without_f["acoustic_features"] is None
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in with_f["semantic_codes"]]),
        np.stack([np.asarray(c) for c in without_f["semantic_codes"]]))
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in with_f["acoustic_codes"]]),
        np.stack([np.asarray(c) for c in without_f["acoustic_codes"]]))
    assert with_f["losses"] == without_f["losses"]


def test_span_group_losses_are_per_span(monkeypatch):
    """Grouped dispatch must report each span's OWN losses, equal to what
    sequential dispatch reports for that span: forward losses are per-row
    vectors, so a group's batch mean can neither mix spans nor count the
    zero-padding rows (here a 3-span run pads to 4 — one garbage row)."""
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    sr = 4000
    rng = np.random.default_rng(13)
    x = rng.standard_normal(int(sr * 120)).astype(np.float32) * 0.3

    def run(group: str):
        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", group)
        tok = NeuralAudioTokenizer(
            sample_rate=sr, codebook_size=64, semantic_dim=32,
            acoustic_dim=32, n_mels=16, enable_codebook_cache=False,
            use_pretrained_semantic=False, codebook_init_method="random",
            enable_reconstruction=False)
        return [out["losses"] for out in tok.iter_chunks(x[None, :])]

    # Geometry (first-frame ramp): s0 = 3 s ramp span, s1..s4 = 28 s core
    # spans (one [4, bucket] group at group=4), s5 = 5 s tail (own bucket).
    seq, grp = run("1"), run("4")
    assert len(seq) == len(grp) == 6
    for ls, lg in zip(seq, grp):
        assert ls.keys() == lg.keys()
        for k in ls:
            assert ls[k] == pytest.approx(lg[k], rel=1e-5), k
    # Spans hold different audio → different losses (a batch mean would
    # make the grouped spans' values identical).
    grouped_totals = [l["total_vq_loss"] for l in grp[1:5]]
    assert len(set(grouped_totals)) == 4


def test_tokenize_many_sequential_path_honors_want_features(tmp_path):
    """The dp runner threads want_features; the sequential path (single
    file, or dp-fallback) must too — re-fetching feature maps the caller
    asked to skip costs tens of MB per span group on a remote backend."""
    from nat_tpu.io.audio import encode_wav_pcm16
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    sr = 8000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    path.write_bytes(encode_wav_pcm16(x, sr))

    pipe = AudioTokenizationPipeline(
        sample_rate=sr,
        model_config={"codebook_size": 64, "semantic_dim": 32,
                      "acoustic_dim": 32, "n_mels": 16},
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    # One file → dp_eligible has a single entry → sequential loop.
    (res,) = pipe._tokenize_many([str(path)], want_features=False)
    assert not isinstance(res, Exception)
    result = res[2]
    assert result["semantic_features"] is None
    assert result["acoustic_features"] is None
    assert len(result["semantic_codes"]) == 4

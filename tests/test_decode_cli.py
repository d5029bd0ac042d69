"""--decode-tokens: lam_audio_tokens NDJSON → WAV (the inverse CLI mode)."""

import json

import numpy as np
import pytest

from nat_tpu.io.audio import decode_wav

MODEL_FLAGS = ["--codebook-size", "64", "--semantic-dim", "64",
               "--acoustic-dim", "64", "--n-mels", "32"]


@pytest.mark.slow
def test_encode_decode_roundtrip(cli, simple_wav, tmp_path):
    rc, ndjson, err = cli([str(simple_wav), *MODEL_FLAGS], timeout=600)
    assert rc == 0, err
    stream_path = tmp_path / "tokens.ndjson"
    stream_path.write_text(ndjson)

    out_wav = tmp_path / "decoded.wav"
    rc, out, err = cli(["--decode-tokens", str(stream_path),
                        "-o", str(out_wav), *MODEL_FLAGS], timeout=600)
    assert rc == 0, err
    assert out == ""  # decode mode writes files, not stdout

    audio, sr = decode_wav(out_wav.read_bytes())
    header = json.loads(ndjson.splitlines()[0])
    assert sr == header["sr"]
    n_frames = sum(1 for line in ndjson.splitlines()
                   if '"event":"frame"' in line)
    assert len(audio) == n_frames * header["hop"]
    assert np.all(np.abs(audio) <= 0.95 + 1e-6)  # tanh soft limit applied


@pytest.mark.slow
def test_decode_rle_stream_matches_dense(cli, simple_wav, tmp_path):
    """RLE streams decode to the same audio as dense streams of the same
    file (the reader reconstructs the dense matrix via forward-fill)."""
    rc, dense, err = cli([str(simple_wav), "--deterministic", *MODEL_FLAGS],
                         timeout=600)
    assert rc == 0, err
    rc, rle, err = cli([str(simple_wav), "--rle", "--deterministic",
                        *MODEL_FLAGS], timeout=600)
    assert rc == 0, err
    (tmp_path / "d.ndjson").write_text(dense)
    (tmp_path / "r.ndjson").write_text(rle)

    for name in ("d", "r"):
        rc, out, err = cli(["--decode-tokens", str(tmp_path / f"{name}.ndjson"),
                            "-o", str(tmp_path / f"{name}.wav"),
                            "--deterministic", *MODEL_FLAGS], timeout=600)
        assert rc == 0, err
    a, sr_a = decode_wav((tmp_path / "d.wav").read_bytes())
    b, sr_b = decode_wav((tmp_path / "r.wav").read_bytes())
    assert sr_a == sr_b
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_decode_tokens_layer_mismatch_errors(cli, simple_wav, tmp_path):
    rc, ndjson, err = cli([str(simple_wav), *MODEL_FLAGS], timeout=600)
    assert rc == 0, err
    stream_path = tmp_path / "tokens.ndjson"
    stream_path.write_text(ndjson)
    rc, out, err = cli(["--decode-tokens", str(stream_path),
                        "--num-quantizers", "4", *MODEL_FLAGS], timeout=600)
    assert rc != 0
    assert "token layers" in err


def test_decode_tokens_requires_reconstruction(cli, tmp_path):
    p = tmp_path / "x.ndjson"
    p.write_text("{}")
    rc, out, err = cli(["--decode-tokens", str(p), "--no-reconstruction"],
                       timeout=600)
    assert rc != 0
    assert "reconstruction" in err

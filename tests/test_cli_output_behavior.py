"""Black-box CLI contract tests.

Port of the reference's `test_output_behavior.py` (the stdout/stderr and
NDJSON stream contract) plus stdin-routing coverage from `test_demo.py`.
All runs use --compat-fallback so no model weights are needed.
"""

import json

import pytest

pytestmark = pytest.mark.slow


def test_default_behavior(cli, simple_wav):
    """Default mode: pure NDJSON on stdout, empty stderr."""
    rc, stdout, stderr = cli(["--compat-fallback", str(simple_wav)])
    assert rc == 0
    assert '"event":"header"' in stdout
    assert '"event":"frame"' in stdout
    assert '"event":"end"' in stdout
    assert stderr.strip() == ""


def test_default_mode_every_line_is_json(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", str(simple_wav)])
    assert rc == 0
    for line in stdout.strip().splitlines():
        obj = json.loads(line)
        assert "event" in obj


def test_verbose_behavior(cli, simple_wav):
    rc, stdout, stderr = cli(["--compat-fallback", "--verbose", str(simple_wav)])
    assert rc == 0
    assert '"event":"header"' in stdout
    assert '"event":"frame"' in stdout
    assert '"event":"end"' in stdout
    assert "Enhanced Neural Audio-to-LLM Tokenizer" in stderr
    assert "INFO" in stderr


def test_v_shorthand(cli, simple_wav):
    rc, stdout, stderr = cli(["--compat-fallback", "-v", str(simple_wav)])
    assert rc == 0
    assert '"event":"header"' in stdout
    assert "Enhanced Neural Audio-to-LLM Tokenizer" in stderr


def test_explicit_ndjson_streaming(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", "--ndjson-streaming",
                         "--log-level", "INFO", str(simple_wav)])
    assert rc == 0
    assert '"event":"header"' in stdout
    for line in stdout.strip().splitlines():
        if line.strip():
            assert line.startswith("{") and line.endswith("}"), line[:50]


def test_error_handling(cli):
    rc, stdout, stderr = cli(["--compat-fallback", "nonexistent.wav"])
    assert rc != 0
    assert stdout.strip() == ""
    assert "FileNotFoundError" in stderr or "RuntimeError" in stderr


def test_log_levels(cli, simple_wav):
    _, out_err, stderr_error = cli(["--compat-fallback", "--log-level", "ERROR",
                                    str(simple_wav)])
    _, out_warn, stderr_warn = cli(["--compat-fallback", "--log-level", "WARN",
                                    str(simple_wav)])
    _, out_info, stderr_info = cli(["--compat-fallback", "--log-level", "INFO",
                                    str(simple_wav)])
    for stdout in (out_err, out_warn, out_info):
        assert '"event":"header"' in stdout
    assert len(stderr_info) > len(stderr_warn)


def test_help_exits_zero(cli):
    rc, stdout, _ = cli(["--help"])
    assert rc == 0
    assert "--ndjson-streaming" in stdout
    assert "--codebook-init" in stdout


def test_header_schema_fields(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", str(simple_wav)])
    assert rc == 0
    header = json.loads(stdout.splitlines()[0])
    assert header["event"] == "header"
    assert header["format_version"] == "1.5"
    assert header["schema"] == "lam_audio_tokens"
    assert header["sr"] == 22050
    assert header["hop"] == 512
    assert header["hop_ms"] == pytest.approx(23.22, abs=0.01)
    assert header["frames_per_second"] == pytest.approx(43.066, abs=0.01)
    assert header["time_units"] == "ms"
    assert len(header["layers"]) == 8
    assert [l["name"] for l in header["layers"]] == [
        "S0", "S1", "S2", "S3", "A0", "A1", "A2", "A3"]
    assert header["compat_mode"] is True
    assert "audio_sha256" in header
    assert "duration_seconds" in header


def test_frame_schema_fields(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", str(simple_wav)])
    frames = [json.loads(l) for l in stdout.splitlines()
              if '"event":"frame"' in l]
    assert frames, "no frames emitted"
    f0 = frames[0]
    assert f0["fi"] == 0
    assert f0["ts"] == 0.0
    assert len(f0["S"]) == 4 and len(f0["A"]) == 4
    assert all(isinstance(t, int) for t in f0["S"] + f0["A"])
    # 1 s of audio at hop 512 → samples // 512 frames in compat mode
    assert len(frames) == 22050 // 512
    # Frame timing: ts advances by dur
    assert frames[1]["ts"] == pytest.approx(f0["dur"], abs=0.01)


def test_deterministic_mode_reproducible(cli, simple_wav):
    rc1, out1, _ = cli(["--compat-fallback", "--deterministic", str(simple_wav)])
    rc2, out2, _ = cli(["--compat-fallback", "--deterministic", str(simple_wav)])
    assert rc1 == rc2 == 0

    def frames_of(s):
        return [l for l in s.splitlines() if '"event":"frame"' in l]

    assert frames_of(out1) == frames_of(out2)


@pytest.mark.slow
def test_neural_deterministic_mode_reproducible(cli, simple_wav):
    """The NEURAL path (argmin quantization) is byte-identical across
    processes — stronger than the compat-mode check above."""
    flags = ["--deterministic", "--codebook-size", "64", "--semantic-dim",
             "64", "--acoustic-dim", "64", "--n-mels", "32",
             "--no-reconstruction", str(simple_wav)]
    rc1, out1, err1 = cli(flags, timeout=600)
    rc2, out2, err2 = cli(flags, timeout=600)
    assert rc1 == 0, err1
    assert rc2 == 0, err2

    def sans_end(s):  # end.stats carries wall-clock timings
        return [l for l in s.splitlines() if '"event":"end"' not in l]

    assert sans_end(out1) == sans_end(out2)


def test_piped_stdin_binary(cli, simple_wav):
    data = simple_wav.read_bytes()
    rc, stdout, stderr = cli(["--compat-fallback"], stdin_bytes=data)
    assert rc == 0, stderr
    assert '"event":"header"' in stdout
    assert '"event":"end"' in stdout


def test_fs_delimited_multi_file_stdin(cli, simple_wav, simple_wav2):
    data = simple_wav.read_bytes() + b"\x1c" + simple_wav2.read_bytes()
    rc, stdout, stderr = cli(["--compat-fallback"], stdin_bytes=data)
    assert rc == 0, stderr
    headers = [l for l in stdout.splitlines() if '"event":"header"' in l]
    ends = [l for l in stdout.splitlines() if '"event":"end"' in l]
    assert len(headers) == 2
    assert len(ends) == 2


def test_stdin_path_list(cli, simple_wav):
    rc, stdout, stderr = cli(["--compat-fallback", "--stdin"],
                             stdin_bytes=str(simple_wav).encode() + b"\n")
    assert rc == 0, stderr
    assert '"event":"header"' in stdout


def test_output_file(cli, simple_wav, tmp_path):
    out = tmp_path / "tokens.ndjson"
    rc, stdout, _ = cli(["--compat-fallback", "-o", str(out), str(simple_wav)])
    assert rc == 0
    assert stdout.strip() == ""
    content = out.read_text()
    assert '"event":"header"' in content


def test_metrics_json_export(cli, simple_wav, tmp_path):
    out = tmp_path / "metrics.json"
    rc, _, _ = cli(["--compat-fallback", "--metrics", str(out), str(simple_wav)])
    assert rc == 0
    metrics = json.loads(out.read_text())
    assert "compression_ratio" in metrics
    assert "semantic_entropy" in metrics
    assert metrics["compat_mode"] is True


def test_rle_mode_emits_tokens_events(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", "--rle", "--deterministic",
                         str(simple_wav)])
    assert rc == 0
    header = json.loads(stdout.splitlines()[0])
    assert header["encoding_mode"] == "rle"
    # S layers default to rle, A layers to dense in RLE mode
    enc = {l["name"]: l["encoding"] for l in header["layers"]}
    assert enc["S0"] == "rle"
    assert enc["A0"] == "dense"


def test_batch_all_outputs_dir(cli, simple_wav, simple_wav2, tmp_path):
    """Case A: multi-file batch to a directory writes per-file artifacts and
    aggregated metrics (reference 5588-5620)."""
    out = tmp_path / "batch"
    metrics = tmp_path / "agg.json"
    rc, stdout, stderr = cli([
        "--compat-fallback", "--batch", "--all-outputs",
        "--output-dir", str(out), "--metrics", str(metrics),
        str(simple_wav), str(simple_wav2)])
    assert rc == 0, stderr
    assert stdout.strip() == ""  # batch mode writes files, not stdout
    for base in ("test_simple", "test_simple2"):
        assert (out / f"{base}_tokens.txt").exists()
        assert (out / f"{base}_tokens.json").exists()
        assert (out / f"{base}_tokens.ndjson").exists()
        assert (out / f"{base}_metrics.json").exists()
    import json as _json

    agg = _json.loads(metrics.read_text())
    assert "avg_compression_ratio" in agg
    assert "min_semantic_entropy" in agg and "max_semantic_entropy" in agg


def test_multi_file_requires_output_dir_with_all_outputs(cli, simple_wav,
                                                         simple_wav2):
    rc, _, stderr = cli(["--compat-fallback", "--all-outputs",
                         str(simple_wav), str(simple_wav2)])
    assert rc != 0
    assert "--output-dir" in stderr


def test_text_format_output(cli, simple_wav):
    rc, stdout, _ = cli(["--compat-fallback", "--streaming", "--format",
                         "hierarchical", str(simple_wav)])
    assert rc == 0
    assert "===STREAM_HEADER===" in stdout
    assert "===STREAM_COMPLETE===" in stdout


def test_structured_format(cli, simple_wav, tmp_path):
    # Structured text goes to a file; NDJSON stays default on stdout otherwise
    out = tmp_path / "tokens.txt"
    rc, _, _ = cli(["--compat-fallback", "--streaming", "--format", "structured",
                    "-o", str(out), str(simple_wav)])
    assert rc == 0

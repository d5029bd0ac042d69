"""Differential metric-VALUE parity vs the real reference evaluator.

The reference's TokenizationEvaluator (neural_audio_tokenizer.py:3356-3732)
runs in a subprocess on synthetic inputs (token codes + audio + fake
reconstruction); nat-tpu's evaluator runs on the identical inputs
in-process.  Fields whose formulas are defined purely over the inputs must
agree numerically — token statistics exactly, audio/DSP metrics to float
tolerance (both sides execute the same librosa-semantics DSP:
nat_tpu.eval.librosa_compat here, the delegating shim there).

Timing/memory fields are environment-dependent and excluded.
"""

import json
import os
import subprocess
import sys
from dataclasses import asdict
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference/neural_audio_tokenizer.py")
REPO = Path(__file__).resolve().parent.parent
DRIVER = Path(__file__).resolve().parent / "_ref_eval_driver.py"

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REFERENCE.exists(),
                                 reason="reference tool not available")]

SR = 22050

EXACT_FIELDS = ("num_semantic_tokens", "num_acoustic_tokens",
                "compression_ratio", "token_diversity")
# The reference computes probabilities in float32 (torch) before the
# entropy/MI formulas; ours stay float64 — identical formulas, float32
# rounding differences only.
NEAR_EXACT_FIELDS = ("semantic_entropy", "acoustic_entropy",
                     "mutual_information")
CLOSE_FIELDS = ("mse_loss", "spectral_loss", "perceptual_loss",
                "mr_stft_loss", "log_spectral_distance",
                "pitch_accuracy", "rhythm_accuracy", "timbral_similarity")


def _synthetic_inputs(with_recon: bool):
    rng = np.random.default_rng(7)
    t = np.arange(SR * 2) / SR
    # vibrato tone + jittered click train: voiced pitch track AND onsets
    f = 440 + 25 * np.sin(2 * np.pi * 2.5 * t)
    audio = 0.5 * np.sin(2 * np.pi * np.cumsum(f) / SR)
    clicks = np.zeros_like(audio)
    pos = 0
    while pos < audio.size - 1:
        clicks[pos] = 1.0
        pos += int(SR * (0.22 + 0.08 * rng.random()))
    audio = (audio + np.convolve(clicks, np.hanning(64), mode="same")
             ).astype(np.float32)
    recon = None
    if with_recon:
        recon = (audio * 0.9 + 0.02 * rng.standard_normal(audio.size)
                 ).astype(np.float32)

    frames = 83
    sem = [rng.integers(0, 512, (1, frames)) for _ in range(4)]
    acc = [rng.integers(0, 512, (1, frames)) for _ in range(4)]
    return audio, recon, sem, acc


def _run_reference(tmp_path, audio, recon, sem, acc):
    arrays = {"audio": audio, "sr": np.int64(SR),
              "n_sem": np.int64(len(sem)), "n_acc": np.int64(len(acc))}
    if recon is not None:
        arrays["recon"] = recon
    for i, c in enumerate(sem):
        arrays[f"sem{i}"] = c
    for i, c in enumerate(acc):
        arrays[f"acc{i}"] = c
    inputs = tmp_path / "inputs.npz"
    np.savez(inputs, **arrays)
    out = tmp_path / "ref_metrics.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["USE_TF"] = "0"
    env["USE_FLAX"] = "0"
    env["HF_HUB_OFFLINE"] = "1"
    env["TRANSFORMERS_OFFLINE"] = "1"
    result = subprocess.run(
        [sys.executable, str(DRIVER), str(inputs), str(out)],
        capture_output=True, text=True, timeout=420, cwd=str(REPO), env=env)
    assert result.returncode == 0, f"driver failed: {result.stderr[-1500:]}"
    return json.loads(out.read_text())


def _run_ours(audio, recon, sem, acc):
    from nat_tpu.eval.metrics import TokenizationEvaluator

    result = {"semantic_codes": sem, "acoustic_codes": acc}
    m = TokenizationEvaluator(SR).evaluate_tokenization(
        audio, None, recon, precomputed_result=result)
    return asdict(m)


@pytest.fixture(scope="module", params=[False, True],
                ids=["tokens_only", "with_recon"])
def both(request, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("metric_parity")
    audio, recon, sem, acc = _synthetic_inputs(request.param)
    ref = _run_reference(tmp_path, audio, recon, sem, acc)
    ours = _run_ours(audio, recon, sem, acc)
    return ref, ours


class TestMetricValueParity:
    def test_exact_token_fields(self, both):
        ref, ours = both
        for field in EXACT_FIELDS:
            assert ours[field] == pytest.approx(ref[field], rel=1e-9), field
        for field in NEAR_EXACT_FIELDS:
            assert ours[field] == pytest.approx(ref[field], rel=1e-6,
                                                abs=1e-6), field

    def test_audio_fields_close(self, both):
        ref, ours = both
        for field in CLOSE_FIELDS:
            assert ours[field] == pytest.approx(ref[field], rel=1e-5,
                                                abs=1e-7), field

    def test_recon_metrics_nonzero(self, both):
        ref, ours = both
        if ref["mse_loss"] == 0.0:  # tokens_only case
            assert ours["mse_loss"] == 0.0
            return
        # the comparison is only meaningful if the metrics are non-trivial
        assert ours["mse_loss"] > 0
        assert ours["spectral_loss"] > 0
        assert ours["mr_stft_loss"] > 0
        assert abs(ours["pitch_accuracy"]) > 0
        assert ours["timbral_similarity"] != 0

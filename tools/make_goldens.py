"""Record real-pretrained-weights goldens (run once on a networked machine).

Produces ``tests/goldens/real_weights.json`` with:

* the sha256 of the wav2vec2-base hidden states (first 16 frames, f32
  bytes, rounded to 1e-4) on the checked-in 1 s sine fixture,
* the sha256 of each MERT-seeded codebook layer (semantic + acoustic,
  default 4096×512 config, seeds 42/123-equivalent),
* the first 64 NDJSON frame lines of a deterministic default-config
  tokenization of the fixture (token stream golden).

Workflow (VERDICT r3 "next" #5)::

    ./nat --fetch                      # sha256-verified checkpoint install
    python tools/make_goldens.py       # writes tests/goldens/real_weights.json
    python -m pytest tests/test_real_checkpoints.py   # asserts against it

Once the JSON is committed, `tests/test_real_checkpoints.py::TestGoldens`
asserts every future run against *recorded truth* — catching conversion
regressions without needing torch or the network at test time.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN_PATH = REPO / "tests" / "goldens" / "real_weights.json"
FIXTURE = REPO / "tests" / "fixtures" / "test_simple.wav"


def _hidden_state_hash() -> dict:
    import jax.numpy as jnp

    from nat_tpu.io.audio import load_audio_file
    from nat_tpu.models.semantic import (Wav2Vec2Encoder,
                                         load_pretrained_semantic_params)

    params = load_pretrained_semantic_params()
    if params is None:
        raise SystemExit("no local wav2vec2-base checkpoint — run "
                         "`./nat --fetch` first")
    audio, sr = load_audio_file(str(FIXTURE))
    if sr != 16000:
        from nat_tpu.dsp.resample import resample_poly

        audio = resample_poly(audio, sr, 16000)
    enc = Wav2Vec2Encoder()
    hidden = np.asarray(enc.apply({"params": params["wav2vec2"]}
                                  if "wav2vec2" in params else
                                  {"params": params},
                                  jnp.asarray(audio)[None, :]))
    # Tolerance snapshot, NOT a hash: XLA CPU numerics wiggle ~2e-6
    # relative across host-device counts / versions (measured), which
    # flips rounded-value hashes while a conversion regression moves
    # values by O(1).  f16 resolves ~5e-4 relative — plenty of margin
    # between those two scales.
    return {
        "shape": list(hidden.shape),
        "first16_f16_b64": base64.b64encode(
            hidden[0, :16].astype("<f2").tobytes()).decode(),
        "mean": float(hidden.mean()),
        "std": float(hidden.std()),
    }


def _extraction_hashes() -> dict:
    """Exact sha256 of the MERT weight-matrix extraction — pure numpy over
    the state dict (no XLA), so bitwise-reproducible everywhere.  This is
    the strong conversion check; the k-means outputs below get tolerance
    stats instead."""
    from nat_tpu.quant import checkpoint_io, seeding

    sd = checkpoint_io.load_local_state_dict("m-a-p/MERT-v1-95M")
    if not sd:
        raise SystemExit("no local MERT checkpoint — run `./nat --fetch`")
    out = {}
    for extraction in ("semantic", "acoustic"):
        mat = np.ascontiguousarray(
            seeding.extract_weight_matrices(sd, extraction), np.float32)
        out[extraction] = {
            "shape": list(mat.shape),
            "sha256": hashlib.sha256(mat.tobytes()).hexdigest(),
        }
    return out


def _codebook_stats() -> dict:
    """Order/tie robust per-layer summaries of the MERT-seeded codebooks:
    k-means centroid ordering (and near-tie assignments) may legally vary
    across XLA builds, but the fitted distribution may not."""
    from nat_tpu.quant import seeding

    out = {}
    for extraction, seed in (("semantic", 42), ("acoustic", 123)):
        cb = seeding.seed_codebooks(
            method="mert", extraction_type=extraction, num_layers=4,
            codebook_size=4096, input_dim=512, seed=seed, use_cache=False)
        layers = []
        for i in range(cb.shape[0]):
            norms = np.linalg.norm(cb[i].astype(np.float64), axis=1)
            layers.append({
                "mean": float(cb[i].mean()),
                "std": float(cb[i].std()),
                "row_norm_q": [round(float(q), 6) for q in np.quantile(
                    norms, np.linspace(0.0, 1.0, 17))],
            })
        out[extraction] = {"shape": list(cb.shape), "per_layer": layers}
    return out


def _token_stream_golden() -> dict:
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

    pipe = AudioTokenizationPipeline(
        deterministic=True,
        enable_reconstruction=False,
        codebook_init_method="mert",
        enable_codebook_cache=False,
    )
    if pipe.compat_mode:
        raise SystemExit("neural path unavailable")
    lines: list = []
    pipe.stream_audio(str(FIXTURE), lines.append)
    frames = [ln for ln in lines if '"event":"frame"' in ln][:64]
    return {
        "model_id": pipe.model_id,
        "num_recorded_frames": len(frames),
        "frames": frames,
    }


def _checkpoint_digests() -> dict:
    """sha256 of each weight file the goldens were recorded against.
    TestGoldens skips (not fails) when the local checkpoints differ —
    goldens are only meaningful next to the exact weights that produced
    them, so a synthetic-checkpoint pack (tools/make_synth_checkpoints.py,
    egress-blocked machines) can never masquerade as, or clash with, a
    real-weight pack."""
    from nat_tpu.quant import checkpoint_io

    out = {}
    for repo in ("facebook/wav2vec2-base", "m-a-p/MERT-v1-95M"):
        path = checkpoint_io.find_local_checkpoint(repo)
        if path is None:
            raise SystemExit(f"no local checkpoint for {repo} — run "
                             "`./nat --fetch` (or tools/"
                             "make_synth_checkpoints.py offline) first")
        out[repo] = hashlib.sha256(path.read_bytes()).hexdigest()
    return out


def main() -> int:
    import jax

    record = {
        "version": 2,
        # Token IDs are exact-compared only when the replay env matches:
        # argmin near-ties at deep RVQ levels can flip with backend
        # numerics (observed recording on the TPU plugin vs replaying on
        # CPU), so the env the frames were recorded under is part of the
        # golden.
        "env": {
            "platform": jax.default_backend(),
            "device_count": jax.local_device_count(),
        },
        "fixture_sha256": hashlib.sha256(FIXTURE.read_bytes()).hexdigest(),
        "checkpoints": _checkpoint_digests(),
        "wav2vec2_hidden": _hidden_state_hash(),
        "mert_extraction": _extraction_hashes(),
        "mert_codebooks": _codebook_stats(),
        "token_stream": _token_stream_golden(),
    }
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(record, indent=2) + "\n")
    print(f"goldens written to {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    # Replicate tests/conftest.py's env EXACTLY (before any jax import):
    # goldens are replayed in that env, and XLA numerics depend on the
    # backend and virtual-device count.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _n = os.environ.get("NAT_TPU_TEST_DEVICES", "1")
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={_n}"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
        " --xla_cpu_collective_timeout_seconds=1800")
    os.environ.setdefault("NAT_TPU_PARAM_CACHE", "0")
    os.environ.setdefault("NAT_TPU_AOT_CACHE", "0")
    os.environ.setdefault("NAT_TPU_STREAM_PREFETCH", "0")
    import jax

    # The axon TPU plugin ignores JAX_PLATFORMS (conftest.py:38) — without
    # this pin the recording silently runs on the accelerator and nothing
    # replays bit-stable on the CPU test lane.
    jax.config.update("jax_platform_name", "cpu")
    sys.exit(main())

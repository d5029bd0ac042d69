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
    head = np.round(hidden[0, :16].astype(np.float64), 4).astype(np.float32)
    return {
        "shape": list(hidden.shape),
        "first16_sha256": hashlib.sha256(head.tobytes()).hexdigest(),
        "mean": float(hidden.mean()),
        "std": float(hidden.std()),
    }


def _codebook_hashes() -> dict:
    from nat_tpu.quant import seeding

    out = {}
    for extraction, seed in (("semantic", 42), ("acoustic", 123)):
        cb = seeding.seed_codebooks(
            method="mert", extraction_type=extraction, num_layers=4,
            codebook_size=4096, input_dim=512, seed=seed, use_cache=False)
        out[extraction] = {
            "shape": list(cb.shape),
            "per_layer_sha256": [
                hashlib.sha256(
                    np.round(cb[i].astype(np.float64), 4)
                    .astype(np.float32).tobytes()).hexdigest()
                for i in range(cb.shape[0])],
        }
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


def main() -> int:
    record = {
        "fixture_sha256": hashlib.sha256(FIXTURE.read_bytes()).hexdigest(),
        "wav2vec2_hidden": _hidden_state_hash(),
        "mert_codebooks": _codebook_hashes(),
        "token_stream": _token_stream_golden(),
    }
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    GOLDEN_PATH.write_text(json.dumps(record, indent=2) + "\n")
    print(f"goldens written to {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.exit(main())

"""Subprocess driver: run the REAL reference evaluator on injected inputs.

Usage: python tests/_ref_eval_driver.py <inputs.npz> <out.json>

Loads /root/reference/neural_audio_tokenizer.py as a module (with
tests/reference_shims on sys.path for librosa/torchaudio/soundfile),
builds its TokenizationEvaluator, and evaluates a synthetic
precomputed_result — identical inputs to what the nat-tpu test feeds its
own evaluator — so metric VALUES can be compared field by field
(tests/test_metric_value_parity.py).
"""

import importlib.util
import json
import sys
from dataclasses import asdict
from pathlib import Path

import numpy as np

SHIMS = Path(__file__).resolve().parent / "reference_shims"
REFERENCE = Path("/root/reference/neural_audio_tokenizer.py")


def main() -> None:
    inputs_path, out_path = sys.argv[1], sys.argv[2]
    sys.path.insert(0, str(SHIMS))
    import torch

    spec = importlib.util.spec_from_file_location("ref_nat", REFERENCE)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    data = np.load(inputs_path)
    audio = data["audio"]
    recon = data["recon"] if "recon" in data else None
    sem = [torch.from_numpy(data[f"sem{i}"]) for i in range(int(data["n_sem"]))]
    acc = [torch.from_numpy(data[f"acc{i}"]) for i in range(int(data["n_acc"]))]

    result = {
        "semantic_codes": sem,
        "acoustic_codes": acc,
        "reconstructed": (torch.from_numpy(recon)[None, :]
                          if recon is not None else None),
        "num_frames": int(sem[0].shape[-1]) if sem else 0,
    }
    evaluator = ref.TokenizationEvaluator(int(data["sr"]))
    metrics = evaluator.evaluate_tokenization(
        audio, torch.nn.Module(), precomputed_result=result)
    Path(out_path).write_text(json.dumps(asdict(metrics)))


if __name__ == "__main__":
    main()

"""Detailed analysis export.

Counterpart of reference `save_detailed_analysis`
(neural_audio_tokenizer.py:4091-4209): per-layer ``.npy`` feature/code
dumps, spectral-feature JSON (MFCC stats, centroid, rolloff, ZCR),
categorized metrics CSV, and token-usage statistics JSON.
"""

from __future__ import annotations

import csv
import json
from dataclasses import asdict
from pathlib import Path
from typing import Dict, List

import numpy as np

from . import audio_metrics

_METRIC_CATEGORIES = {
    "basic": ("num_semantic_tokens", "num_acoustic_tokens",
              "compression_ratio", "token_diversity"),
    "reconstruction": ("mse_loss", "spectral_loss", "perceptual_loss",
                       "mr_stft_loss", "log_spectral_distance"),
    "information": ("semantic_entropy", "acoustic_entropy",
                    "mutual_information"),
    "music": ("pitch_accuracy", "rhythm_accuracy", "timbral_similarity"),
    "efficiency": ("encoding_time", "decoding_time", "memory_usage",
                   "tokens_per_second", "frames_per_second"),
}


def save_detailed_analysis(
    audio: np.ndarray,
    tokenizer_result: Dict,
    metrics,
    output_dir: str,
    base_name: str,
    sample_rate: int = 22050,
) -> List[str]:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    audio = np.asarray(audio).reshape(-1)
    files: List[str] = []

    # Per-layer code + feature dumps
    for group in ("semantic", "acoustic"):
        for i, codes in enumerate(tokenizer_result.get(f"{group}_codes") or []):
            path = out / f"{base_name}_{group}_codes_L{i}.npy"
            np.save(path, np.asarray(codes))
            files.append(str(path))
        feats = tokenizer_result.get(f"{group}_features")
        if feats is not None:
            path = out / f"{base_name}_{group}_features.npy"
            np.save(path, np.asarray(feats))
            files.append(str(path))

    # Spectral features JSON
    mfcc = audio_metrics.mfcc(audio, sample_rate)
    spectral = {
        "mfcc_mean": mfcc.mean(axis=1).tolist(),
        "mfcc_std": mfcc.std(axis=1).tolist(),
        "spectral_centroid_mean": float(
            audio_metrics.spectral_centroid(audio, sample_rate).mean()),
        "spectral_rolloff_mean": float(
            audio_metrics.spectral_rolloff(audio, sample_rate).mean()),
        "zero_crossing_rate_mean": float(
            audio_metrics.zero_crossing_rate(audio).mean())
        if audio.size >= 2048 else 0.0,
        "duration_seconds": audio.size / sample_rate,
        "sample_rate": sample_rate,
    }
    path = out / f"{base_name}_spectral_features.json"
    path.write_text(json.dumps(spectral, indent=2))
    files.append(str(path))

    # Categorized metrics CSV
    metrics_dict = asdict(metrics) if not isinstance(metrics, dict) else metrics
    path = out / f"{base_name}_metrics.csv"
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["category", "metric", "value"])
        for category, keys in _METRIC_CATEGORIES.items():
            for key in keys:
                if key in metrics_dict:
                    writer.writerow([category, key, metrics_dict[key]])
    files.append(str(path))

    # Token usage stats JSON
    usage: Dict[str, Dict] = {}
    for group in ("semantic", "acoustic"):
        for i, codes in enumerate(tokenizer_result.get(f"{group}_codes") or []):
            arr = np.asarray(codes).ravel()
            values, counts = np.unique(arr, return_counts=True)
            usage[f"{'S' if group == 'semantic' else 'A'}{i}"] = {
                "unique_tokens": int(values.size),
                "total_tokens": int(arr.size),
                "most_common": [[int(v), int(c)] for v, c in
                                sorted(zip(values, counts),
                                       key=lambda vc: -vc[1])[:10]],
                "usage_entropy_bits": float(
                    -(counts / arr.size * np.log2(counts / arr.size)).sum())
                if arr.size else 0.0,
            }
    path = out / f"{base_name}_token_usage.json"
    path.write_text(json.dumps(usage, indent=2))
    files.append(str(path))
    return files

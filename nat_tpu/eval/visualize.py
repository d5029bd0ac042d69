"""Visualization suite (matplotlib Agg, host-side).

Counterpart of reference `generate_visualizations`
(neural_audio_tokenizer.py:3734-4089): waveform comparison, STFT + mel
spectrograms (original/reconstruction), per-layer token histograms, and
feature heatmaps.  ``sequential=True`` renders one figure at a time with GC
between (low-memory mode); parallel mode builds all figures in one pass.
"""

from __future__ import annotations

import gc
from pathlib import Path
from typing import Dict, List

import numpy as np

from ..utils.logging import logger
from . import audio_metrics


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _save(fig, path: Path, files: List[str]) -> None:
    fig.savefig(path, dpi=100, bbox_inches="tight")
    files.append(str(path))


def _plot_waveforms(plt, audio, recon, sample_rate, out, base, files):
    fig, axes = plt.subplots(2 if recon is not None else 1, 1,
                             figsize=(12, 6), squeeze=False)
    t = np.arange(audio.size) / sample_rate
    axes[0][0].plot(t, audio, linewidth=0.4)
    axes[0][0].set_title("Original waveform")
    axes[0][0].set_xlabel("s")
    if recon is not None:
        tr = np.arange(recon.size) / sample_rate
        axes[1][0].plot(tr, recon, linewidth=0.4, color="tab:orange")
        axes[1][0].set_title("Reconstructed waveform")
        axes[1][0].set_xlabel("s")
    fig.tight_layout()
    _save(fig, out / f"{base}_waveform.png", files)
    plt.close(fig)


def _plot_spectrograms(plt, audio, recon, sample_rate, out, base, files):
    # One file per signal per transform (reference emits separate
    # orig/recon STFT and mel PNGs, 3756-3931), plus a combined overview.
    for name, sig in (("original", audio),) + (
            (("reconstructed", recon),) if recon is not None else ()):
        mag = audio_metrics.stft_mag(np.asarray(sig), 2048, 512)
        mel = audio_metrics._mel_spec(np.asarray(sig), sample_rate, n_mels=128)

        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(20 * np.log10(mag + 1e-8), origin="lower",
                  aspect="auto", cmap="magma")
        ax.set_title(f"STFT magnitude (dB) — {name}")
        fig.tight_layout()
        _save(fig, out / f"{base}_stft_{name}.png", files)
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(np.log(mel + 1e-8), origin="lower", aspect="auto",
                  cmap="magma")
        ax.set_title(f"Mel spectrogram (log) — {name}")
        fig.tight_layout()
        _save(fig, out / f"{base}_mel_{name}.png", files)
        plt.close(fig)

        fig, axes = plt.subplots(2, 1, figsize=(12, 8))
        axes[0].imshow(20 * np.log10(mag + 1e-8), origin="lower",
                       aspect="auto", cmap="magma")
        axes[0].set_title(f"STFT magnitude (dB) — {name}")
        axes[1].imshow(np.log(mel + 1e-8), origin="lower", aspect="auto",
                       cmap="magma")
        axes[1].set_title(f"Mel spectrogram (log) — {name}")
        fig.tight_layout()
        _save(fig, out / f"{base}_spectrogram_{name}.png", files)
        plt.close(fig)


def _plot_token_histograms(plt, result, out, base, files):
    sem = result.get("semantic_codes") or []
    acc = result.get("acoustic_codes") or []
    n = len(sem) + len(acc)
    if n == 0:
        return
    # Per-layer files (reference emits one histogram PNG per S/A layer)...
    for prefix, codes_list, color in (("S", sem, "tab:blue"),
                                      ("A", acc, "tab:red")):
        for i, codes in enumerate(codes_list):
            fig, ax = plt.subplots(figsize=(6, 4))
            ax.hist(np.asarray(codes).ravel(), bins=64, color=color)
            ax.set_title(f"Token usage — {prefix}{i}")
            ax.set_xlabel("token id")
            fig.tight_layout()
            _save(fig, out / f"{base}_tokens_{prefix}{i}.png", files)
            plt.close(fig)
    # ...plus a combined overview grid.
    fig, axes = plt.subplots(2, max(len(sem), len(acc), 1),
                             figsize=(4 * max(len(sem), 1), 6), squeeze=False)
    for i, codes in enumerate(sem):
        axes[0][i].hist(np.asarray(codes).ravel(), bins=64, color="tab:blue")
        axes[0][i].set_title(f"S{i}")
    for i, codes in enumerate(acc):
        axes[1][i].hist(np.asarray(codes).ravel(), bins=64, color="tab:red")
        axes[1][i].set_title(f"A{i}")
    fig.tight_layout()
    _save(fig, out / f"{base}_token_histograms.png", files)
    plt.close(fig)


def _plot_feature_heatmaps(plt, result, out, base, files):
    for key, cmap in (("semantic_features", "viridis"),
                      ("acoustic_features", "plasma")):
        feats = result.get(key)
        if feats is None:
            continue
        arr = np.asarray(feats)
        if arr.ndim == 3:
            arr = arr[0]
        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(arr, aspect="auto", origin="lower", cmap=cmap)
        ax.set_title(key)
        ax.set_xlabel("frames")
        ax.set_ylabel("dim")
        fig.tight_layout()
        _save(fig, out / f"{base}_{key}.png", files)
        plt.close(fig)


def generate_visualizations(
    audio: np.ndarray,
    tokenizer_result: Dict,
    output_dir: str,
    base_name: str,
    sample_rate: int = 22050,
    sequential: bool = False,
) -> List[str]:
    """Render all visualization PNGs; returns the list of files written."""
    plt = _plt()
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    audio = np.asarray(audio).reshape(-1)
    recon = tokenizer_result.get("reconstructed")
    if recon is not None:
        recon = np.asarray(recon).reshape(-1)

    files: List[str] = []
    stages = (
        lambda: _plot_waveforms(plt, audio, recon, sample_rate, out,
                                base_name, files),
        lambda: _plot_spectrograms(plt, audio, recon, sample_rate, out,
                                   base_name, files),
        lambda: _plot_token_histograms(plt, tokenizer_result, out,
                                       base_name, files),
        lambda: _plot_feature_heatmaps(plt, tokenizer_result, out,
                                       base_name, files),
    )
    for stage in stages:
        try:
            stage()
        except Exception as exc:
            logger.warn(f"Visualization stage failed: {exc}")
        if sequential:
            gc.collect()
    return files

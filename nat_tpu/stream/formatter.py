"""Token dumps for non-NDJSON output formats.

Wire-format parity with reference `TokenFormatter`
(neural_audio_tokenizer.py:4216-4327): `hierarchical` (all semantic layers
flattened, then all acoustic), `interleaved` (layer-flattened S/A sequences
alternated token-by-token), `structured` (space-joined per-frame segments),
and the nested `neural_hybrid` JSON dump.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from ..version import FORMAT_VERSION


def _flat(codes) -> List[np.ndarray]:
    return [np.asarray(c).reshape(-1).astype(int) for c in codes]


class TokenFormatter:
    """Render semantic/acoustic token layers as text or JSON."""

    def to_text_sequence(self, semantic_codes, acoustic_codes,
                         output_format: str = "hierarchical") -> str:
        if output_format == "hierarchical":
            return self._hierarchical(semantic_codes, acoustic_codes)
        if output_format == "interleaved":
            return self._interleaved(semantic_codes, acoustic_codes)
        if output_format == "structured":
            return self._structured(semantic_codes, acoustic_codes)
        raise ValueError(f"Unknown format type: {output_format}")

    @staticmethod
    def _hierarchical(semantic_codes, acoustic_codes) -> str:
        parts = ["[SEMANTIC]"]
        for layer, codes in enumerate(_flat(semantic_codes)):
            parts.extend(f"S{layer}_{tok}" for tok in codes)
        parts.append("[ACOUSTIC]")
        for layer, codes in enumerate(_flat(acoustic_codes)):
            parts.extend(f"A{layer}_{tok}" for tok in codes)
        return " ".join(parts)

    @staticmethod
    def _interleaved(semantic_codes, acoustic_codes) -> str:
        # Alternate tokens from the layer-concatenated flattened sequences
        # (reference 4254-4270), not per-frame.
        sem = (np.concatenate(_flat(semantic_codes))
               if semantic_codes else np.array([], dtype=int))
        acc = (np.concatenate(_flat(acoustic_codes))
               if acoustic_codes else np.array([], dtype=int))
        parts = []
        for i in range(max(sem.size, acc.size)):
            if i < sem.size:
                parts.append(f"S_{sem[i]}")
            if i < acc.size:
                parts.append(f"A_{acc[i]}")
        return " ".join(parts)

    @staticmethod
    def _structured(semantic_codes, acoustic_codes) -> str:
        sem = [np.atleast_2d(np.asarray(c)) for c in semantic_codes]
        acc = [np.atleast_2d(np.asarray(c)) for c in acoustic_codes]
        min_t = min(
            min((c.shape[-1] for c in sem), default=0),
            min((c.shape[-1] for c in acc), default=0),
        )
        segments = []
        for t in range(min_t):
            sem_part = ",".join(f"S{li}:{int(c[0, t])}"
                                for li, c in enumerate(sem))
            acc_part = ",".join(f"A{li}:{int(c[0, t])}"
                                for li, c in enumerate(acc))
            segments.append(f"[T{t}][SEM:{sem_part}][AC:{acc_part}]")
        return " ".join(segments)

    def to_json(self, semantic_codes, acoustic_codes,
                metadata: Optional[Dict] = None) -> str:
        data = {
            "format_version": FORMAT_VERSION,
            "tokenization_type": "neural_hybrid",
            "semantic_tokens": {
                f"layer_{i}": np.asarray(c).tolist()
                for i, c in enumerate(semantic_codes)
            },
            "acoustic_tokens": {
                f"layer_{i}": np.asarray(c).tolist()
                for i, c in enumerate(acoustic_codes)
            },
            "metadata": metadata or {},
        }
        return json.dumps(data, indent=2)

"""Token dumps for non-NDJSON output formats.

Counterpart of reference `TokenFormatter` (neural_audio_tokenizer.py:
4216-4327): `hierarchical`, `interleaved`, `structured` text renderings and a
nested JSON dump.  Operates on numpy code arrays.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np


def _flat(codes) -> List[np.ndarray]:
    return [np.asarray(c).reshape(-1).astype(int) for c in codes]


class TokenFormatter:
    """Render semantic/acoustic token layers as text or JSON."""

    def to_text_sequence(self, semantic_codes, acoustic_codes,
                         output_format: str = "hierarchical") -> str:
        sem = _flat(semantic_codes)
        acc = _flat(acoustic_codes)

        if output_format == "hierarchical":
            parts = ["[SEMANTIC]"]
            for layer, codes in enumerate(sem):
                parts.extend(f"S{layer}_{tok}" for tok in codes)
            parts.append("[ACOUSTIC]")
            for layer, codes in enumerate(acc):
                parts.extend(f"A{layer}_{tok}" for tok in codes)
            return " ".join(parts)

        if output_format == "interleaved":
            # Walk frames, interleaving one semantic + one acoustic token per
            # layer at each time step.
            num_frames = min(
                min((len(c) for c in sem), default=0),
                min((len(c) for c in acc), default=0),
            )
            parts = []
            for fi in range(num_frames):
                parts.extend(f"S_{c[fi]}" for c in sem)
                parts.extend(f"A_{c[fi]}" for c in acc)
            return " ".join(parts)

        if output_format == "structured":
            num_frames = min(
                min((len(c) for c in sem), default=0),
                min((len(c) for c in acc), default=0),
            )
            lines = []
            for fi in range(num_frames):
                sem_part = ",".join(f"S{li}:{c[fi]}" for li, c in enumerate(sem))
                acc_part = ",".join(f"A{li}:{c[fi]}" for li, c in enumerate(acc))
                lines.append(f"[T{fi}][SEM:{sem_part}][AC:{acc_part}]")
            return "\n".join(lines)

        raise ValueError(f"Unknown output format: {output_format}")

    def to_json(self, semantic_codes, acoustic_codes,
                metadata: Optional[Dict] = None) -> str:
        payload = {
            "semantic_tokens": [c.tolist() for c in _flat(semantic_codes)],
            "acoustic_tokens": [c.tolist() for c in _flat(acoustic_codes)],
        }
        if metadata:
            payload["metadata"] = metadata
        return json.dumps(payload, indent=2)

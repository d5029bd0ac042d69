"""Synthesize architecture-faithful stand-in checkpoints (offline).

Builds deterministic random-init torch checkpoints with the EXACT
architectures and repo layouts of the three models `nat --fetch` would
install (reference neural_audio_tokenizer.py:1988,2320-2335,2523-2543):

* ``facebook/wav2vec2-base``  → ``transformers.Wav2Vec2Model`` (default
  config IS the base architecture: 12 layers, hidden 768, 7-conv
  extractor; ~95M params),
* ``m-a-p/MERT-v1-95M``       → ``transformers.HubertModel`` (MERT's
  trunk is HuBERT-shaped; the seeding extractor reads the raw state
  dict's 2-D weight matrices by name/layer-index, which these provide at
  true scale),
* ``facebook/encodec_24khz``  → ``transformers.EncodecModel`` (default
  config is the 24 kHz variant; the feature bridge converts its state
  dict key-for-key).

Installed into the HF hub cache snapshot layout `find_local_checkpoint`
scans (and with ``refs/main`` written so ``from_pretrained`` resolves the
same snapshot offline).  This makes the ENTIRE real-checkpoint lane —
install → conversion → forward → goldens (`tests/test_real_checkpoints.py`,
`tools/make_goldens.py`) — executable on an air-gapped machine.  The
weights are random (egress-blocked boxes cannot have the pretrained
values); goldens recorded against them carry the checkpoint digests so
they can never be confused with real-weight goldens
(``tests/goldens/real_weights.json:checkpoints``).

Usage::

    python tools/make_synth_checkpoints.py            # install all three
    python tools/make_synth_checkpoints.py --dest DIR # custom cache root
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _install(model, repo: str, cache_root: Path | None) -> Path:
    from nat_tpu.io import fetch

    if cache_root is not None:
        os.environ["HF_HUB_CACHE"] = str(cache_root)
    snap = fetch.snapshot_dir(repo)
    snap.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(snap, safe_serialization=True)
    # refs/main → "main" lets huggingface_hub resolve OUR snapshot name
    # offline (it reads refs/<revision> for the snapshot dir name).
    refs = snap.parent.parent / "refs"
    refs.mkdir(parents=True, exist_ok=True)
    (refs / "main").write_text("main")
    return snap / "model.safetensors"


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dest", default=None,
                        help="cache root (default: the HF hub cache)")
    parser.add_argument("--models", nargs="*", default=None,
                        help="subset of repos (default: all three)")
    args = parser.parse_args()

    import torch
    import transformers

    dest = Path(args.dest) if args.dest else None
    builders = {
        "facebook/wav2vec2-base": lambda: transformers.Wav2Vec2Model(
            transformers.Wav2Vec2Config()),
        "m-a-p/MERT-v1-95M": lambda: transformers.HubertModel(
            transformers.HubertConfig()),
        "facebook/encodec_24khz": lambda: transformers.EncodecModel(
            transformers.EncodecConfig()),
    }
    for i, (repo, build) in enumerate(builders.items()):
        if args.models and repo not in args.models:
            continue
        torch.manual_seed(i)
        model = build().eval()
        path = _install(model, repo, dest)
        sha = hashlib.sha256(path.read_bytes()).hexdigest()
        print(f"{repo}\t{path}\t{path.stat().st_size / 1e6:.1f}MB\t"
              f"sha256={sha[:16]}…")
    print("NOTE: synthetic random-init weights (offline stand-ins at the "
          "real architectures) — run `./nat --fetch` on a networked "
          "machine to replace them with the pretrained values.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

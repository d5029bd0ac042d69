"""Training CLI: ``python -m nat_tpu.train_cli corpus/*.wav --steps N``.

Minimal front-end over :class:`nat_tpu.runtime.trainer.Trainer`: loads a
WAV corpus, fine-tunes the encoders/decoder with synchronized EMA codebook
updates (optionally dp/tp-sharded over all chips), and writes a model
checkpoint loadable by the tokenizer CLI's ``--model-path``.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from .utils.logging import LogLevel, logger, set_log_level


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="nat-tpu-train",
        description="Train the nat-tpu tokenizer encoders/decoder + EMA codebooks")
    parser.add_argument("inputs", nargs="+", help="Training audio files (WAV)")
    parser.add_argument("--steps", type=int, default=100,
                        help="Optimization steps (default: 100)")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--lr-schedule", default="constant",
                        choices=["constant", "cosine"],
                        help="Learning-rate schedule over --steps "
                             "(cosine = linear warmup then cosine decay)")
    parser.add_argument("--warmup-steps", type=int, default=0,
                        help="Linear warmup steps for --lr-schedule cosine")
    parser.add_argument("--grad-clip", type=float, default=0.0,
                        help="Global-norm gradient clipping (0 = off)")
    parser.add_argument("--weight-decay", type=float, default=1e-4,
                        help="AdamW decoupled weight decay")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Gradient-accumulation steps (effective batch "
                             "= batch-size x this)")
    parser.add_argument("--sample-rate", type=int, default=22050)
    parser.add_argument("--codebook-size", type=int, default=4096)
    parser.add_argument("--num-quantizers", type=int, default=8)
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--checkpoint-every", type=int, default=100)
    parser.add_argument("--resume", help="Training checkpoint to resume from")
    parser.add_argument("--model-out", default="model.msgpack",
                        help="Final model checkpoint for --model-path")
    parser.add_argument("--mesh", default=None,
                        help="Mesh shape dp,tp (e.g. '4,2'); default: all "
                             "devices on dp")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-level", default="INFO",
                        choices=["DEBUG", "INFO", "WARN", "ERROR"])
    return parser


def build_optimizer(learning_rate: float, num_steps: int,
                    schedule: str = "constant", warmup_steps: int = 0,
                    grad_clip: float = 0.0, weight_decay: float = 1e-4,
                    grad_accum: int = 1):
    """Compose the optax transformation chain from CLI-level knobs.

    The Trainer takes any optax GradientTransformation, so every knob is
    a pure composition: schedule → AdamW, prefixed by global-norm
    clipping, wrapped in MultiSteps for gradient accumulation.
    """
    import optax

    if schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(num_steps, warmup_steps + 1),
            end_value=learning_rate * 0.01)
    else:
        lr = learning_rate
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    set_log_level(LogLevel(args.log_level))

    import optax

    from .io.audio import load_audio_file, peak_normalize
    from .models.tokenizer import NeuralAudioTokenizer
    from .parallel.mesh import make_mesh
    from .runtime.checkpoint import save_model
    from .runtime.trainer import Trainer

    corpus: List[np.ndarray] = []
    for path in args.inputs:
        audio, sr = load_audio_file(path)
        if sr != args.sample_rate:
            from .dsp.resample import resample_poly

            audio = resample_poly(audio, sr, args.sample_rate)
        corpus.append(peak_normalize(audio))
    logger.info(f"Loaded {len(corpus)} training files "
                f"({sum(len(c) for c in corpus) / args.sample_rate:.1f}s)")

    tokenizer = NeuralAudioTokenizer(
        sample_rate=args.sample_rate,
        codebook_size=args.codebook_size,
        num_quantizers=args.num_quantizers,
        enable_reconstruction=True,
        seed=args.seed,
    )
    mesh = None
    if args.mesh:
        dp, tp = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh((dp, tp))
    trainer = Trainer(
        tokenizer,
        optimizer=build_optimizer(
            args.learning_rate, args.steps, schedule=args.lr_schedule,
            warmup_steps=args.warmup_steps, grad_clip=args.grad_clip,
            weight_decay=args.weight_decay, grad_accum=args.grad_accum),
        mesh=mesh,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, seed=args.seed)
    if args.resume:
        trainer.restore_checkpoint(args.resume)

    trainer.fit(corpus, num_steps=args.steps, batch_size=args.batch_size)
    trainer.apply_to_tokenizer()
    save_model(args.model_out, tokenizer)
    logger.info(f"Model written to {args.model_out} — use it with "
                f"`nat-tpu --model-path {args.model_out}`")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Per-stage timing of the neural forward on the live backend.

The forward (reference neural_audio_tokenizer.py:3193 counterpart,
nat_tpu/models/tokenizer.py:_build_forward) is one fused jit in
production; to know where chip time actually goes, each stage is also
jitted standalone here and timed with the same pipelined-dispatch +
scalar-fetch discipline bench.py uses (block_until_ready is unreliable
on tunneled backends, so completion is forced by fetching a scalar
reduction of the stage output).

Prints one JSON object: seconds per stage per batch, stage shares of
the standalone total, and the fused full-forward time for comparison
(XLA fuses across stage boundaries, so the fused time is normally
below the standalone sum).

Usage: python tools/bench_components.py [--batch 64] [--seconds 30]
       [--dtype bfloat16|float32] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--dtype", choices=["bfloat16", "float32"], default=None)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--attempts", type=int, default=3,
                    help="best-of attempts (shared-backend noise)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nat_tpu.dsp.resample import resample_jax
    from nat_tpu.models.tokenizer import SEMANTIC_SR, NeuralAudioTokenizer
    from nat_tpu.ops.interp import interp_linear

    sr = 22050
    bucket = int(args.seconds * sr)
    tok = NeuralAudioTokenizer(
        sample_rate=sr,
        codebook_size=4096,
        enable_codebook_cache=False,
        semantic_arch="wav2vec2",
        codebook_init_method="random",
        enable_reconstruction=False,
        compute_dtype=args.dtype,
    )
    tok.ensure_initialized()
    t_target = tok._target_frames(bucket, sr)
    mel_encoder = tok._mel_encoder_for(sr)
    dsp_precision = (jax.lax.Precision.DEFAULT
                     if tok.compute_dtype == "bfloat16"
                     else jax.lax.Precision.HIGHEST)

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal(
        (args.batch, bucket)).astype(np.float32) * 0.3)
    key = jax.random.PRNGKey(0)

    # --- standalone stage functions (each jitted on its own) -------------
    @jax.jit
    def stage_resample(w):
        return resample_jax(w, sr, SEMANTIC_SR, precision=dsp_precision)

    @jax.jit
    def stage_semantic(params, w16):
        return tok.semantic_encoder.apply(
            {"params": params["semantic_encoder"]}, w16)

    # Semantic sub-stages (where does wav2vec2 time go?)
    from nat_tpu.models.semantic import FeatureExtractor

    sem_tree = None
    if not tok.semantic_fallback:
        sem_tree = tok.params["semantic_encoder"]["wav2vec2"]

    @jax.jit
    def stage_sem_fe(params, w16):
        fe = FeatureExtractor(dtype=tok.semantic_encoder.dtype)
        return fe.apply({"params": sem_tree["feature_extractor"]}, w16)

    @jax.jit
    def stage_mel(params, w):
        return mel_encoder.apply({"params": params["mel_encoder"]}, w)

    @jax.jit
    def stage_temporal_sem(params, f):
        return tok.temporal_semantic.apply(
            {"params": params["temporal_semantic"]}, f)

    @jax.jit
    def stage_temporal_acc(params, f):
        return tok.temporal_acoustic.apply(
            {"params": params["temporal_acoustic"]}, f)

    @jax.jit
    def stage_align(f):
        return jnp.swapaxes(
            interp_linear(jnp.swapaxes(f, 1, 2), t_target), 1, 2)

    def stage_rvq():
        if tok.use_pallas:
            from nat_tpu.ops.rvq_pallas import rvq_encode_pallas

            @jax.jit
            def run(st, f):
                codes, q, losses = rvq_encode_pallas(st, f, per_row=True)
                return codes, losses["total_vq_loss"]
        else:
            from nat_tpu.quant.rvq import rvq_encode

            @jax.jit
            def run(st, f):
                codes, q, losses = rvq_encode(
                    st, f, temperature=tok.temperature, stochastic=False,
                    rng=key, per_row=True)
                return codes, losses["total_vq_loss"]
        return run

    forward, _ = tok._build_forward(bucket)

    def timed(fn, *xs) -> float:
        """Best-of pipelined timing; returns seconds per call."""
        out = fn(*xs)                       # compile + warm
        _fetch_scalar(out)
        best = float("inf")
        for _ in range(args.attempts):
            start = time.perf_counter()
            outs = [fn(*xs) for _ in range(args.iters)]
            for o in outs:
                _fetch_scalar(o)
            best = min(best, (time.perf_counter() - start) / args.iters)
        return best

    def _fetch_scalar(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    results: dict = {
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "batch": args.batch,
        "chunk_seconds": args.seconds,
        "compute_dtype": tok.compute_dtype,
        "use_pallas": tok.use_pallas,
        "t_target": int(t_target),
    }

    stages: dict = {}
    stages["resample_22k_to_16k"] = timed(stage_resample, wave)
    wave16 = stage_resample(wave)
    stages["semantic_w2v2"] = timed(stage_semantic, tok.params, wave16)
    if sem_tree is not None:
        # informational sub-stage (inside semantic_w2v2, not added to the
        # standalone total): conv front-end vs transformer split
        results["semantic_fe_s"] = round(
            timed(stage_sem_fe, tok.params, wave16), 5)
    sem_feats = stage_semantic(tok.params, wave16)
    stages["acoustic_mel_conv"] = timed(stage_mel, tok.params, wave)
    acc_feats = stage_mel(tok.params, wave)
    stages["temporal_semantic"] = timed(
        stage_temporal_sem, tok.params, sem_feats)
    stages["temporal_acoustic"] = timed(
        stage_temporal_acc, tok.params, acc_feats)
    sem_t = stage_temporal_sem(tok.params, sem_feats)
    acc_t = stage_temporal_acc(tok.params, acc_feats)
    stages["align_interp_sem"] = timed(stage_align, sem_t)
    stages["align_interp_acc"] = timed(stage_align, acc_t)
    sem_a = stage_align(sem_t)
    acc_a = stage_align(acc_t)
    rvq_run = stage_rvq()
    stages["rvq_semantic"] = timed(rvq_run, tok.sem_rvq, sem_a)
    stages["rvq_acoustic"] = timed(rvq_run, tok.acc_rvq, acc_a)

    def run_forward(w, k):
        return forward(tok.params, tok.sem_rvq, tok.acc_rvq, w, k)

    fused = timed(run_forward, wave, key)

    total = sum(stages.values())
    results["stages_s"] = {k: round(v, 5) for k, v in stages.items()}
    results["stage_share_pct"] = {
        k: round(100.0 * v / total, 1) for k, v in stages.items()}
    results["standalone_sum_s"] = round(total, 5)
    results["fused_forward_s"] = round(fused, 5)
    results["fused_x_realtime"] = round(
        args.batch * args.seconds / fused, 1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

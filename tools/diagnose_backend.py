#!/usr/bin/env python
"""Backend health diagnostics for tunneled/shared TPU deployments.

Run when tokenization seems slow to separate PROGRAM problems from
BACKEND problems before touching any code (the round-3 param-cache bug
masqueraded as "degraded backend windows" for a whole session — see
docs/ROUND3.md post-mortem).  Checks, in order:

1. backend init + first round trip (the axon tunnel's per-process
   handshake is 55 s-9+ min under load; a hang here is the tunnel, not
   the code)
2. sustained MXU throughput (bf16 matmul chain TF/s)
3. host→device bandwidth at product payload sizes (forced by a fetch;
   block_until_ready returns early on some tunnels)
4. per-round-trip fetch latency (scalar fetch)
5. tokenizer param residency — host-numpy params re-upload the full
   pytree on EVERY jitted call (430 MB for wav2vec2-base ⇒ ~9 s/call
   through a tunnel); all leaves must be jax.Array

Usage: python tools/diagnose_backend.py [--with-tokenizer]
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-tokenizer", action="store_true",
                    help="also construct the flagship tokenizer and check "
                         "param residency + forward latency")
    args = ap.parse_args()

    print("1. backend init (hangs here = tunnel down; give it minutes)...",
          flush=True)
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()
    print(f"   devices={dev} init={time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))
    print(f"   first round trip: {time.perf_counter() - t0:.1f}s")

    print("2. MXU throughput (8192^3 bf16 chain; healthy ~116 TF/s on v5e, "
          "degraded 1-2)...", flush=True)
    n, iters = 8192, 8

    @jax.jit
    def chain(x):
        for _ in range(iters):
            x = x @ x * 1e-3
        return x.sum()

    x = jnp.ones((n, n), jnp.bfloat16)
    np.asarray(chain(x))
    t0 = time.perf_counter()
    np.asarray(chain(x))
    dt = time.perf_counter() - t0
    print(f"   {iters * 2 * n**3 / dt / 1e12:.1f} TF/s ({dt:.2f}s)")

    print("3. H2D bandwidth (21 MB f32, fetch-forced)...", flush=True)
    s = jax.jit(lambda x: x.sum())
    rng = np.random.default_rng(0)
    np.asarray(s(jnp.asarray(rng.standard_normal((8, 661500))
                             .astype(np.float32))))
    best = float("inf")
    for _ in range(3):
        w = rng.standard_normal((8, 661500)).astype(np.float32)
        t0 = time.perf_counter()
        np.asarray(s(jnp.asarray(w)))
        best = min(best, time.perf_counter() - t0)
    print(f"   {w.nbytes / best / 1e6:.0f} MB/s ({best:.2f}s best of 3)")

    print("4. fetch round-trip latency (scalar)...", flush=True)
    r = jnp.float32(1.0)
    f = jax.jit(lambda x: x * 2)
    np.asarray(f(r))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(f(r))
    print(f"   {(time.perf_counter() - t0) / 5 * 1e3:.0f} ms/round-trip")

    if args.with_tokenizer:
        print("5. tokenizer param residency + forward latency...", flush=True)
        from collections import Counter

        from nat_tpu.models.tokenizer import NeuralAudioTokenizer

        tok = NeuralAudioTokenizer(
            sample_rate=22050, codebook_size=4096,
            semantic_arch="wav2vec2", codebook_init_method="random",
            enable_codebook_cache=False, enable_reconstruction=False)
        tok.ensure_initialized()
        kinds = Counter(type(l).__name__
                        for l in jax.tree_util.tree_leaves(tok.params))
        print(f"   param leaf types: {dict(kinds)}")
        if kinds.get("ndarray"):
            print("   *** HOST-NUMPY PARAMS: every forward re-uploads the "
                  "tree — jax.device_put missing somewhere ***")
        bucket = 661500
        fwd, _ = tok._build_forward(bucket)
        key = jax.random.PRNGKey(0)
        w = jnp.asarray(rng.standard_normal((1, bucket)).astype(np.float32))
        out = fwd(tok.params, tok.sem_rvq, tok.acc_rvq, w, key)
        np.asarray(out["semantic_codes"])
        t0 = time.perf_counter()
        out = fwd(tok.params, tok.sem_rvq, tok.acc_rvq, w, key)
        np.asarray(out["semantic_codes"])
        dt = time.perf_counter() - t0
        print(f"   fwd[1, 30s]: {dt:.3f}s = {30 / dt:.0f}x realtime "
              "(healthy ~0.04s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

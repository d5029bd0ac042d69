"""Randomized round-trip fuzzing of the NDJSON stream layer.

Property: for ANY token matrix and ANY encoding configuration (dense, RLE,
mixed per-layer overrides, aggressive keyframes), serializing with
:class:`StreamingProtocol` and parsing with the reader reproduces the dense
``[L, T]`` matrices exactly, and every emitted line is valid JSON with the
header-first / end-last contract (reference wire format,
neural_audio_tokenizer.py:2672-2705 counterpart).
"""

import json

import numpy as np
import pytest

from nat_tpu.stream.protocol import StreamingProtocol
from nat_tpu.stream.reader import parse_ndjson_stream


def _random_tokens(rng, n_layers, t, codebook, style):
    """Token matrices with different temporal dynamics."""
    if style == "random":
        return rng.integers(0, codebook, (n_layers, t))
    if style == "constant":
        return np.full((n_layers, t), int(rng.integers(0, codebook)))
    # piecewise-constant runs (RLE-friendly): few change points per layer
    out = np.zeros((n_layers, t), dtype=np.int64)
    for l in range(n_layers):
        n_runs = int(rng.integers(1, max(2, t // 3) + 1))
        bounds = np.sort(rng.choice(t, size=n_runs - 1, replace=False)) \
            if n_runs > 1 else np.array([], dtype=np.int64)
        vals = rng.integers(0, codebook, n_runs)
        start = 0
        for b, v in zip(list(bounds) + [t], vals):
            out[l, start:b] = v
            start = b
    return out


def _stream(sem, acc, **proto_kwargs):
    proto = StreamingProtocol(
        sample_rate=22050, hop_length=512, codebook_size=1024,
        num_semantic_layers=sem.shape[0], num_acoustic_layers=acc.shape[0],
        **proto_kwargs)
    tokens = {
        "semantic_codes": [sem[i][None, :] for i in range(sem.shape[0])],
        "acoustic_codes": [acc[i][None, :] for i in range(acc.shape[0])],
    }
    # Token totals as the product pipeline emits them (end.stats) — the
    # reader needs them to recover no-change frames RLE drops from the wire.
    t = min(sem.shape[1], acc.shape[1])
    stats = {"semantic_tokens": sem.shape[0] * t,
             "acoustic_tokens": acc.shape[0] * t}
    return proto.create_ndjson_stream(tokens, duration_seconds=1.0,
                                      processing_stats=stats)


@pytest.mark.parametrize("seed", range(24))
def test_random_config_roundtrip(seed):
    rng = np.random.default_rng(seed)
    l_sem = int(rng.integers(1, 5))
    l_acc = int(rng.integers(1, 5))
    t = int(rng.choice([1, 2, 7, 50, 173]))
    style = str(rng.choice(["random", "constant", "runs"]))
    sem = _random_tokens(rng, l_sem, t, 1024, style)
    acc = _random_tokens(rng, l_acc, t, 1024, style)

    kwargs = {}
    if rng.random() < 0.5:
        kwargs["rle_mode"] = True
    if rng.random() < 0.5:
        enc = {f"S{i}": str(rng.choice(["dense", "rle"]))
               for i in range(l_sem)}
        enc.update({f"A{i}": str(rng.choice(["dense", "rle"]))
                    for i in range(l_acc)})
        kwargs["per_layer_encoding"] = enc
    # Occasionally force keyframes every few frames.
    if rng.random() < 0.5:
        kwargs["keyframe_interval_seconds"] = 0.1
    if rng.random() < 0.3:
        kwargs["include_legend"] = False

    text = _stream(sem, acc, **kwargs)

    lines = text.splitlines()
    events = [json.loads(line) for line in lines]  # every line parses
    assert events[0]["event"] == "header"
    assert events[-1]["event"] == "end"

    parsed = parse_ndjson_stream(text)
    np.testing.assert_array_equal(parsed.semantic, sem,
                                  err_msg=f"semantic mismatch: {kwargs}")
    np.testing.assert_array_equal(parsed.acoustic, acc,
                                  err_msg=f"acoustic mismatch: {kwargs}")


def test_keyframe_interrupted_constant_run_recovers_all_frames():
    """Regression (found by this fuzz): constant tokens + RLE + frequent
    keyframes drop inter-keyframe and tail no-change frames from the wire
    (reference-faithful producer behavior); the reader must recover the
    full frame count from end.stats token totals and forward-fill."""
    sem = np.full((1, 50), 604)
    acc = np.full((1, 50), 7)
    text = _stream(sem, acc, rle_mode=True,
                   per_layer_encoding={"S0": "dense", "A0": "rle"},
                   keyframe_interval_seconds=0.1, include_legend=False)
    parsed = parse_ndjson_stream(text)
    assert parsed.num_frames == 50
    np.testing.assert_array_equal(parsed.semantic, sem)
    np.testing.assert_array_equal(parsed.acoustic, acc)


@pytest.mark.parametrize("seed", range(8))
def test_roundtrip_is_deterministic(seed):
    """Same inputs → byte-identical stream (stateless re-serialization)."""
    rng = np.random.default_rng(100 + seed)
    sem = _random_tokens(rng, 4, 37, 1024, "runs")
    acc = _random_tokens(rng, 4, 37, 1024, "random")
    a = _stream(sem, acc, rle_mode=True)
    b = _stream(sem, acc, rle_mode=True)
    assert a == b

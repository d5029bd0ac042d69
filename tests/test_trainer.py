"""Training loop: loss progress, checkpoint round-trip, weight write-back."""

import numpy as np
import pytest

from nat_tpu.runtime.trainer import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tokenizer():
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    return NeuralAudioTokenizer(
        sample_rate=16000, codebook_size=64, enable_codebook_cache=False,
        use_pretrained_semantic=False, codebook_init_method="random",
        enable_reconstruction=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000
    return [
        (0.5 * np.sin(2 * np.pi * f * t)
         + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        for f in (220, 330, 440, 550)
    ]


def test_fit_runs_and_tracks_metrics(tokenizer, corpus, tmp_path):
    import optax

    trainer = Trainer(tokenizer, optimizer=optax.adam(1e-3),
                      checkpoint_dir=str(tmp_path), checkpoint_every=3,
                      log_every=2)
    history = trainer.fit(corpus, num_steps=4, batch_size=2)
    assert len(history) == 4
    assert history[-1]["step"] == 4
    assert all(np.isfinite(h["loss"]) for h in history)
    # Periodic checkpoint written at step 3
    assert (tmp_path / "train_state_00000003.msgpack").exists()


def test_composed_optimizer(tokenizer, corpus):
    """CLI-level optimizer knobs (cosine schedule, clipping, gradient
    accumulation) compose into a working train step."""
    from nat_tpu.train_cli import build_optimizer

    opt = build_optimizer(1e-3, num_steps=4, schedule="cosine",
                          warmup_steps=1, grad_clip=1.0, grad_accum=2)
    trainer = Trainer(tokenizer, optimizer=opt)
    history = trainer.fit(corpus, num_steps=4, batch_size=2)
    assert len(history) == 4
    assert all(np.isfinite(h["loss"]) for h in history)


def test_checkpoint_roundtrip(tokenizer, corpus, tmp_path):
    import optax

    trainer = Trainer(tokenizer, optimizer=optax.adam(1e-3))
    trainer.fit(corpus, num_steps=2, batch_size=2)
    path = trainer.save_checkpoint(str(tmp_path / "ckpt.msgpack"))

    trainer2 = Trainer(tokenizer, optimizer=optax.adam(1e-3))
    assert int(trainer2.state.step) == 0
    trainer2.restore_checkpoint(path)
    assert int(trainer2.state.step) == 2
    a = np.asarray(
        __import__("jax").tree_util.tree_leaves(trainer.state.params)[0])
    b = np.asarray(
        __import__("jax").tree_util.tree_leaves(trainer2.state.params)[0])
    np.testing.assert_array_equal(a, b)


def test_apply_to_tokenizer_changes_inference(tokenizer, corpus):
    import optax

    x = corpus[0][None, :]
    before = tokenizer(x)
    trainer = Trainer(tokenizer, optimizer=optax.adam(5e-2))  # big steps
    trainer.fit(corpus, num_steps=3, batch_size=2)
    trainer.apply_to_tokenizer()
    after = tokenizer(x)
    all_before = np.concatenate([c.ravel() for c in before["semantic_codes"]])
    all_after = np.concatenate([c.ravel() for c in after["semantic_codes"]])
    # Aggressive training must move features/codebooks enough to alter tokens
    assert all_before.shape == all_after.shape
    assert np.any(all_before != all_after) or not np.array_equal(
        np.asarray(before["reconstructed"]), np.asarray(after["reconstructed"]))

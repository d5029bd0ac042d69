"""Cold-start caches: param-pytree cache and AOT executable cache.

Both caches exist to cut a fresh process's time-to-first-frame (VERDICT r2
"attack cold start"): the param cache skips the flax init jits, the AOT
executable cache skips the per-(sr, bucket) forward compiles by
serializing/deserializing the compiled executables
(jax.experimental.serialize_executable).  Correctness contract: cached
paths produce bit-identical tokens to the fresh paths and invalidate on
any config or source change.
"""

import numpy as np
import pytest

CFG = dict(
    sample_rate=8000, semantic_dim=64, acoustic_dim=64, codebook_size=64,
    num_quantizers=4, n_mels=32, enable_reconstruction=False,
    codebook_init_method="random", enable_codebook_cache=False,
    deterministic=True, use_pretrained_semantic=False,
    semantic_arch="spectral",
)


def _tokenizer(**over):
    from nat_tpu.models.tokenizer import NeuralAudioTokenizer

    return NeuralAudioTokenizer(**{**CFG, **over})


@pytest.fixture()
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 8000
    return (0.4 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.standard_normal(t.size)).astype(np.float32)


class TestParamCache:
    def test_hit_reproduces_init_params_and_tokens(self, tmp_path,
                                                   monkeypatch, wave):
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE_DIR", str(tmp_path))
        import jax

        tok1 = _tokenizer()
        tok1.ensure_initialized()
        files = list(tmp_path.glob("*.pkl"))
        assert len(files) == 1, "init should write one param-cache entry"
        out1 = tok1(wave[None, :], actual_sample_rate=8000)

        tok2 = _tokenizer()
        tok2.ensure_initialized()
        # identical pytrees, leaf for leaf
        flat1 = jax.tree.leaves(tok1.params)
        flat2 = jax.tree.leaves(tok2.params)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out2 = tok2(wave[None, :], actual_sample_rate=8000)
        for a, b in zip(out1["semantic_codes"], out2["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_config_changes_key(self, tmp_path, monkeypatch):
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE_DIR", str(tmp_path))
        _tokenizer().ensure_initialized()
        _tokenizer(seed=7).ensure_initialized()
        assert len(list(tmp_path.glob("*.pkl"))) == 2

    def test_corrupt_entry_falls_back(self, tmp_path, monkeypatch, wave):
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE_DIR", str(tmp_path))
        tok1 = _tokenizer()
        tok1.ensure_initialized()
        entry = next(tmp_path.glob("*.pkl"))
        entry.write_bytes(b"garbage")
        tok2 = _tokenizer()
        tok2.ensure_initialized()  # must not raise
        out = tok2(wave[None, :], actual_sample_rate=8000)
        assert out["num_frames"] > 0

    def test_disabled_by_default_in_tests(self, tmp_path):
        from nat_tpu.runtime import paramcache

        assert paramcache.cache_enabled() is False  # conftest sets =0

    def test_restored_params_are_device_resident(self, tmp_path,
                                                 monkeypatch):
        """Cache-restored params must be jax Arrays, not host numpy —
        numpy leaves re-upload the full pytree (~430 MB for w2v2-base)
        on EVERY jitted forward call (measured 9 s/call on the tunneled
        TPU backend vs 0.09 s device-resident)."""
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_PARAM_CACHE_DIR", str(tmp_path))
        import jax

        _tokenizer().ensure_initialized()        # populates the cache
        tok = _tokenizer()
        tok.ensure_initialized()                  # restores from cache
        for leaf in jax.tree.leaves(tok.params):
            assert isinstance(leaf, jax.Array), type(leaf)


class TestAotExecutableCache:
    def test_roundtrip_identical_tokens(self, tmp_path, monkeypatch, wave):
        monkeypatch.setenv("NAT_TPU_AOT_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_AOT_CACHE_DIR", str(tmp_path))
        tok1 = _tokenizer()
        out1 = tok1(wave[None, :], actual_sample_rate=8000)
        entries = list(tmp_path.glob("*.natx"))
        assert entries, "forward should have been AOT-cached"

        # Fresh tokenizer: the dispatch wrapper must LOAD the serialized
        # executable (same key) and produce identical tokens.
        from nat_tpu.runtime import aotcache
        loads = []
        real_load = aotcache.load

        def counting_load(key):
            exe = real_load(key)
            loads.append(exe is not None)
            return exe

        monkeypatch.setattr(aotcache, "load", counting_load)
        tok2 = _tokenizer()
        out2 = tok2(wave[None, :], actual_sample_rate=8000)
        assert loads and all(loads), "expected AOT cache hits"
        for a, b in zip(out1["semantic_codes"], out2["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(out1["acoustic_codes"], out2["acoustic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_corrupt_executable_recompiles(self, tmp_path, monkeypatch, wave):
        monkeypatch.setenv("NAT_TPU_AOT_CACHE", "1")
        monkeypatch.setenv("NAT_TPU_AOT_CACHE_DIR", str(tmp_path))
        tok1 = _tokenizer()
        out1 = tok1(wave[None, :], actual_sample_rate=8000)
        for entry in tmp_path.glob("*.natx"):
            entry.write_bytes(b"garbage")
        tok2 = _tokenizer()
        out2 = tok2(wave[None, :], actual_sample_rate=8000)  # must not raise
        for a, b in zip(out1["semantic_codes"], out2["semantic_codes"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_key_covers_config_and_shapes(self):
        from nat_tpu.runtime import aotcache
        import jax.numpy as jnp

        args_a = (jnp.zeros((1, 800)),)
        args_b = (jnp.zeros((2, 800)),)
        k1 = aotcache.executable_key({"sr": 8000}, args_a)
        k2 = aotcache.executable_key({"sr": 8000}, args_b)
        k3 = aotcache.executable_key({"sr": 16000}, args_a)
        assert len({k1, k2, k3}) == 3
        assert aotcache.executable_key({"sr": 8000}, args_a) == k1

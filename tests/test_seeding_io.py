"""Direct checkpoint parsing + MERT-style seeding without remote code.

Validates the no-remote-code weight path (VERDICT round 1, missing #2):
the native safetensors parser against the real safetensors library, the
torch-bin path against torch.save, HF-cache-layout resolution, and that a
MERT-shaped checkpoint seeds distinct semantic (late-layer) vs acoustic
(early-layer) codebooks.
"""

import numpy as np
import pytest

from nat_tpu.quant import checkpoint_io, seeding


def _mert_like_state(seed=0):
    """Param names mirroring m-a-p/MERT-v1-95M (HuBERT-style): 12 encoder
    layers with attention/dense/intermediate weights, conv feature extractor,
    embeddings.  Each layer's values carry a distinct mean so extraction
    ranges are identifiable downstream."""
    rng = np.random.default_rng(seed)
    state = {}
    for i in range(12):
        base = f"encoder.layers.{i}"
        offset = float(i + 1)  # layer-identifiable statistics
        for mat in (f"{base}.attention.q_proj.weight",
                    f"{base}.attention.k_proj.weight",
                    f"{base}.attention.v_proj.weight",
                    f"{base}.feed_forward.intermediate_dense.weight",
                    f"{base}.feed_forward.output_dense.weight"):
            shape = (768, 768) if "proj" in mat else (3072, 768)
            if "output_dense" in mat:
                shape = (768, 3072)
            state[mat] = (rng.standard_normal(shape) * 0.02
                          + offset).astype(np.float32)
    state["feature_projection.projection.weight"] = rng.standard_normal(
        (768, 512)).astype(np.float32)
    # 1-D / tiny tensors must be ignored by extraction
    state["encoder.layers.0.layer_norm.weight"] = np.ones(768, np.float32)
    return state


class TestSafetensorsParser:
    def test_parses_real_safetensors_output(self, tmp_path):
        from safetensors.numpy import save_file

        state = {"a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
                 "b.bias": np.ones(5, dtype=np.float16)}
        path = tmp_path / "model.safetensors"
        save_file(state, str(path))

        parsed = checkpoint_io.parse_safetensors(path)
        assert set(parsed) == set(state)
        np.testing.assert_array_equal(parsed["a.weight"], state["a.weight"])
        np.testing.assert_array_equal(parsed["b.bias"], state["b.bias"])

    def test_bf16_widened(self, tmp_path):
        import torch
        from safetensors.torch import save_file

        t = torch.linspace(-2, 2, 16, dtype=torch.bfloat16).reshape(4, 4)
        path = tmp_path / "model.safetensors"
        save_file({"w": t}, str(path))
        parsed = checkpoint_io.parse_safetensors(path)
        np.testing.assert_allclose(parsed["w"], t.float().numpy(), rtol=0)

    def test_torch_bin(self, tmp_path):
        import torch

        state = {"x.weight": torch.randn(6, 3)}
        path = tmp_path / "pytorch_model.bin"
        torch.save(state, str(path))
        parsed = checkpoint_io.load_state_dict_file(path)
        np.testing.assert_array_equal(parsed["x.weight"],
                                      state["x.weight"].numpy())

    def test_hub_cache_layout_resolution(self, tmp_path, monkeypatch):
        from safetensors.numpy import save_file

        snap = (tmp_path / "models--fake-org--fake-model" / "snapshots"
                / "abc123")
        snap.mkdir(parents=True)
        save_file({"w": np.zeros((2, 2), np.float32)},
                  str(snap / "model.safetensors"))
        monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
        found = checkpoint_io.find_local_checkpoint("fake-org/fake-model")
        assert found == snap / "model.safetensors"
        state = checkpoint_io.load_local_state_dict("fake-org/fake-model")
        assert "w" in state

    def test_missing_checkpoint_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
        assert checkpoint_io.load_local_state_dict("no/such-model") is None

    def test_explicit_cache_env_replaces_default(self, tmp_path, monkeypatch):
        """huggingface_hub semantics: HF_HUB_CACHE REPLACES the default
        cache location.  Unioning would leak the user-level cache into
        environments that deliberately pointed elsewhere (e.g. tests
        hiding checkpoints behind a tmp dir)."""
        monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "explicit"))
        monkeypatch.setenv("HF_HOME", str(tmp_path / "home"))
        dirs = list(checkpoint_io._hub_cache_dirs())
        assert dirs == [tmp_path / "explicit"]

    def test_default_cache_dirs_without_explicit_env(self, tmp_path,
                                                     monkeypatch):
        monkeypatch.delenv("HF_HUB_CACHE", raising=False)
        monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
        monkeypatch.setenv("HF_HOME", str(tmp_path / "home"))
        dirs = list(checkpoint_io._hub_cache_dirs())
        assert tmp_path / "home" / "hub" in dirs


class TestMertSeeding:
    @pytest.fixture()
    def mert_dir(self, tmp_path):
        from safetensors.numpy import save_file

        save_file(_mert_like_state(), str(tmp_path / "model.safetensors"))
        return tmp_path

    def test_extraction_selects_layer_ranges(self, mert_dir):
        state = checkpoint_io.load_local_state_dict(str(mert_dir))
        sem = seeding.extract_weight_matrices(state, "semantic")
        acc = seeding.extract_weight_matrices(state, "acoustic")
        assert sem is not None and acc is not None
        # layer means identify the source range: semantic = layers 9-12
        # (offsets 10..12 here), acoustic = layers 0-3 (offsets 1..4)
        assert sem.mean() > 8.0
        assert 0.5 < acc.mean() < 5.0

    def test_seed_codebooks_from_local_mert(self, mert_dir):
        cb = seeding.seed_codebooks(
            method="mert", extraction_type="semantic", num_layers=4,
            codebook_size=64, input_dim=512, seed=42,
            model_name=str(mert_dir), use_cache=False)
        assert cb.shape == (4, 64, 512)
        random_cb = seeding.seed_codebooks(
            method="random", extraction_type="semantic", num_layers=4,
            codebook_size=64, input_dim=512, seed=42, use_cache=False)
        # seeded codebooks are non-random (different distribution entirely)
        assert not np.allclose(cb, random_cb)
        # deterministic: same checkpoint + seed → same codebooks
        cb2 = seeding.seed_codebooks(
            method="mert", extraction_type="semantic", num_layers=4,
            codebook_size=64, input_dim=512, seed=42,
            model_name=str(mert_dir), use_cache=False)
        np.testing.assert_array_equal(cb, cb2)

    def test_semantic_and_acoustic_codebooks_differ(self, mert_dir):
        kw = dict(method="mert", num_layers=2, codebook_size=32,
                  input_dim=512, seed=42, model_name=str(mert_dir),
                  use_cache=False)
        sem = seeding.seed_codebooks(extraction_type="semantic", **kw)
        acc = seeding.seed_codebooks(extraction_type="acoustic", **kw)
        assert not np.allclose(sem, acc)

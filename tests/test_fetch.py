"""Pretrained-weight provisioning (`nat --fetch`, io/fetch.py).

A localhost HTTP server plays the HF endpoint, serving a synthetic repo in
the hub's /raw/ (LFS pointer) + /resolve/ (payload) layout.  Asserts the
full contract: sha256-verified install into the snapshot layout
checkpoint_io.find_local_checkpoint resolves, corruption rejection,
idempotent re-fetch, and a clear offline error.
"""

import hashlib
import http.server
import json
import struct
import threading

import numpy as np
import pytest

from nat_tpu.io import fetch
from nat_tpu.quant import checkpoint_io


def _safetensors_bytes(arrays):
    header = {}
    blobs = []
    offset = 0
    for name, arr in arrays.items():
        data = arr.astype(np.float32).tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(data)]}
        blobs.append(data)
        offset += len(data)
    hj = json.dumps(header).encode()
    return struct.pack("<Q", len(hj)) + hj + b"".join(blobs)


@pytest.fixture()
def repo_server():
    """Serves repo 'acme/tiny-model' with an LFS-pointed safetensors."""
    weights = _safetensors_bytes(
        {"encoder.weight": np.arange(12, dtype=np.float32).reshape(3, 4)})
    sha = hashlib.sha256(weights).hexdigest()
    pointer = (f"version https://git-lfs.github.com/spec/v1\n"
               f"oid sha256:{sha}\nsize {len(weights)}\n").encode()
    config = json.dumps({"model_type": "tiny"}).encode()
    state = {"corrupt": False}

    routes = {
        "/acme/tiny-model/raw/main/model.safetensors": lambda: pointer,
        "/acme/tiny-model/resolve/main/model.safetensors":
            lambda: (weights[:-4] + b"XXXX" if state["corrupt"] else weights),
        "/acme/tiny-model/raw/main/config.json": lambda: config,
        "/acme/tiny-model/resolve/main/config.json": lambda: config,
    }

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body_fn = routes.get(self.path)
            if body_fn is None:
                self.send_response(404)
                self.end_headers()
                return
            body = body_fn()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, state, weights
    srv.shutdown()


@pytest.fixture()
def hub_env(repo_server, tmp_path, monkeypatch):
    srv, state, weights = repo_server
    monkeypatch.setenv("HF_ENDPOINT",
                       f"http://127.0.0.1:{srv.server_address[1]}")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)
    return state, weights


class TestFetch:
    def test_verified_install_resolves(self, hub_env):
        state, weights = hub_env
        path = fetch.fetch_model("acme/tiny-model")
        assert path.name == "model.safetensors"
        assert path.read_bytes() == weights
        # lands exactly where the offline resolver looks
        found = checkpoint_io.find_local_checkpoint("acme/tiny-model")
        assert found == path
        sd = checkpoint_io.parse_safetensors(found)
        np.testing.assert_array_equal(
            sd["encoder.weight"],
            np.arange(12, dtype=np.float32).reshape(3, 4))
        # aux config installed beside it
        assert (path.parent / "config.json").exists()

    def test_refetch_is_idempotent(self, hub_env):
        p1 = fetch.fetch_model("acme/tiny-model")
        p2 = fetch.fetch_model("acme/tiny-model")  # "already available"
        assert p1 == p2

    def test_corrupt_payload_rejected(self, hub_env):
        state, _ = hub_env
        state["corrupt"] = True
        with pytest.raises(fetch.FetchError, match="sha256 mismatch"):
            fetch.fetch_model("acme/tiny-model")
        assert checkpoint_io.find_local_checkpoint("acme/tiny-model") is None
        assert not list(fetch.snapshot_dir("acme/tiny-model").glob("*.part"))

    def test_unknown_repo_clear_error(self, hub_env):
        with pytest.raises(fetch.FetchError, match="no weight file"):
            fetch.fetch_model("acme/absent")

    def test_offline_clear_error(self, tmp_path, monkeypatch):
        monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:9")  # discard port
        monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
        with pytest.raises(fetch.FetchError, match="offline"):
            fetch.fetch_model("acme/tiny-model", timeout=2.0)

    def test_fetch_models_default_list(self):
        assert fetch.DEFAULT_MODELS == ("facebook/wav2vec2-base",
                                        "m-a-p/MERT-v1-95M",
                                        "facebook/encodec_24khz")


@pytest.mark.slow
class TestFetchCli:
    def test_cli_fetch(self, cli, repo_server, tmp_path):
        srv, state, weights = repo_server
        env = {"HF_ENDPOINT": f"http://127.0.0.1:{srv.server_address[1]}",
               "HF_HOME": str(tmp_path / "hf")}
        rc, out, err = cli(["--fetch", "acme/tiny-model"], extra_env=env)
        assert rc == 0, err[-500:]
        assert "acme/tiny-model" in out
        assert "sha256 verified" in err
        # installed where the tokenizer's checkpoint resolution will find it
        line_path = out.strip().split("\t")[1]
        assert line_path.endswith("model.safetensors")

    def test_cli_fetch_offline_error(self, cli, tmp_path):
        env = {"HF_ENDPOINT": "http://127.0.0.1:9",
               "HF_HOME": str(tmp_path / "hf")}
        rc, out, err = cli(["--fetch", "acme/tiny-model"], extra_env=env)
        assert rc == 1
        assert "offline" in err


_TINY_NEURAL_FLAGS = [
    "--codebook-size", "64", "--semantic-dim", "64", "--acoustic-dim", "64",
    "--n-mels", "32", "--no-reconstruction", "--no-codebook-cache",
    "--codebook-init", "random", "-v",
]


@pytest.mark.slow
class TestFetchOnDemand:
    """--fetch-on-demand: opt-in first-run auto-provisioning (the
    reference downloads checkpoints implicitly on first use, 2320-2335;
    nat-tpu keeps offline-first as the default)."""

    def test_offline_degrades_with_warning(self, cli, tmp_path):
        env = {"HF_ENDPOINT": "http://127.0.0.1:9",
               "HF_HOME": str(tmp_path / "hf")}
        rc, out, err = cli(
            ["--fetch-on-demand", *_TINY_NEURAL_FLAGS,
             "tests/fixtures/test_simple.wav"],
            extra_env=env, timeout=420)
        assert rc == 0, err[-500:]
        lines = [json.loads(l) for l in out.splitlines()]
        assert lines[0]["event"] == "header"
        assert lines[-1]["event"] == "end"
        assert "--fetch-on-demand could not provision" in err

    def test_provisions_missing_then_runs(self, cli, tmp_path):
        """With a reachable endpoint, the missing wav2vec2 repo is fetched
        (sha256-verified) before tokenization; the run itself proceeds
        regardless of whether the tiny synthetic checkpoint converts."""
        weights = _safetensors_bytes(
            {"encoder.weight": np.arange(8, dtype=np.float32).reshape(2, 4)})
        sha = hashlib.sha256(weights).hexdigest()
        pointer = (f"version https://git-lfs.github.com/spec/v1\n"
                   f"oid sha256:{sha}\nsize {len(weights)}\n").encode()
        config = json.dumps({"model_type": "wav2vec2"}).encode()
        routes = {
            "/facebook/wav2vec2-base/raw/main/model.safetensors":
                lambda: pointer,
            "/facebook/wav2vec2-base/resolve/main/model.safetensors":
                lambda: weights,
            "/facebook/wav2vec2-base/raw/main/config.json": lambda: config,
            "/facebook/wav2vec2-base/resolve/main/config.json":
                lambda: config,
        }

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body_fn = routes.get(self.path)
                if body_fn is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                body = body_fn()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            env = {"HF_ENDPOINT":
                   f"http://127.0.0.1:{srv.server_address[1]}",
                   "HF_HOME": str(tmp_path / "hf")}
            rc, out, err = cli(
                ["--fetch-on-demand", *_TINY_NEURAL_FLAGS,
                 "tests/fixtures/test_simple.wav"],
                extra_env=env, timeout=420)
            assert rc == 0, err[-500:]
            assert "provisioning facebook/wav2vec2-base" in err
            assert "sha256 verified" in err
            installed = list((tmp_path / "hf").rglob("model.safetensors"))
            assert installed, "checkpoint not installed into HF_HOME"
            lines = [json.loads(l) for l in out.splitlines()]
            assert lines[0]["event"] == "header"
            assert lines[-1]["event"] == "end"
        finally:
            srv.shutdown()

    def test_no_fetch_when_local(self, cli, tmp_path, repo_server):
        """Nothing missing -> no provisioning traffic, no warning."""
        env = {"HF_ENDPOINT": "http://127.0.0.1:9",
               "HF_HOME": str(tmp_path / "hf")}
        rc, out, err = cli(
            ["--fetch-on-demand", "--compat-fallback", "-v",
             "tests/fixtures/test_simple.wav"], extra_env=env)
        assert rc == 0
        assert "fetch-on-demand" not in err


class _FlakyHubHandler(http.server.BaseHTTPRequestHandler):
    """Synthetic HF endpoint with the real endpoint's failure shapes:
    302-to-CDN on /resolve/, mid-stream connection drops, and HTTP Range
    support for resumed downloads (VERDICT r4 #7 — pre-verify everything
    the synthetic harness can before egress exists)."""

    server_version = "FlakyHub/1.0"
    protocol_version = "HTTP/1.1"

    def do_GET(self):  # noqa: N802  (BaseHTTPRequestHandler API)
        cfg = self.server.cfg
        cfg["requests"].append((self.path,
                                self.headers.get("Range")))
        path = self.path
        if path in cfg.get("redirects", {}):
            self.send_response(302)
            self.send_header("Location", cfg["redirects"][path])
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = cfg["routes"].get(path)
        if body is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        rng = self.headers.get("Range")
        start = 0
        status = 200
        if rng and cfg.get("honor_range", True):
            start = int(rng.split("=")[1].rstrip("-"))
            status = 206
        payload = body[start:]
        drops = cfg.get("drop_after")
        if drops and path in drops and drops[path]:
            cut = drops[path].pop(0)
            self.send_response(status)
            self.send_header("Content-Length", str(len(payload)))
            if status == 206:
                self.send_header(
                    "Content-Range",
                    f"bytes {start}-{len(body) - 1}/{len(body)}")
            self.end_headers()
            self.wfile.write(payload[:cut])
            self.wfile.flush()
            # Close mid-body: the client sees an IncompleteRead / reset.
            self.connection.close()
            return
        self.send_response(status)
        self.send_header("Content-Length", str(len(payload)))
        if status == 206:
            self.send_header("Content-Range",
                             f"bytes {start}-{len(body) - 1}/{len(body)}")
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


def _flaky_server(cfg):
    cfg.setdefault("requests", [])
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                          _FlakyHubHandler)
    srv.cfg = cfg
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def _lfs_repo_routes(repo, weights, extra=None):
    sha = hashlib.sha256(weights).hexdigest()
    pointer = (f"version https://git-lfs.github.com/spec/v1\n"
               f"oid sha256:{sha}\nsize {len(weights)}\n").encode()
    config = json.dumps({"model_type": "tiny"}).encode()
    routes = {
        f"/{repo}/raw/main/model.safetensors": pointer,
        f"/{repo}/resolve/main/model.safetensors": weights,
        f"/{repo}/raw/main/config.json": config,
        f"/{repo}/resolve/main/config.json": config,
    }
    routes.update(extra or {})
    return routes


class TestFetchRobustness:
    """Redirects, mid-stream drops + Range resume, and the snapshot layout
    for all three reference models — everything about the real endpoint's
    shape that a localhost harness can pre-verify."""

    @pytest.fixture()
    def weights(self):
        # Multi-chunk payload so a mid-stream drop leaves a partial file.
        return _safetensors_bytes(
            {"encoder.weight":
             np.arange(60000, dtype=np.float32).reshape(300, 200)})

    def _env(self, srv, tmp_path, monkeypatch):
        monkeypatch.setenv("HF_ENDPOINT",
                           f"http://127.0.0.1:{srv.server_address[1]}")
        monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
        monkeypatch.delenv("HF_HUB_CACHE", raising=False)
        monkeypatch.delenv("HUGGINGFACE_HUB_CACHE", raising=False)

    def test_redirected_resolve_followed_and_verified(self, tmp_path,
                                                      monkeypatch, weights):
        """Real HF 302s /resolve/ to a CDN URL; the fetch must follow it
        and still sha256-verify the payload."""
        repo = "acme/tiny-model"
        routes = _lfs_repo_routes(repo, weights,
                                  extra={"/cdn/blob-1234": weights})
        redirects = {f"/{repo}/resolve/main/model.safetensors":
                     "/cdn/blob-1234"}
        srv = _flaky_server({"routes": routes, "redirects": redirects})
        try:
            self._env(srv, tmp_path, monkeypatch)
            path = fetch.fetch_model(repo)
            assert path.read_bytes() == weights
            assert checkpoint_io.find_local_checkpoint(repo) == path
            # the CDN path was actually hit
            assert any(p == "/cdn/blob-1234"
                       for p, _ in srv.cfg["requests"])
        finally:
            srv.shutdown()

    def test_mid_stream_drop_resumes_with_range(self, tmp_path,
                                                monkeypatch, weights):
        repo = "acme/tiny-model"
        cut = len(weights) // 3
        srv = _flaky_server({
            "routes": _lfs_repo_routes(repo, weights),
            "drop_after": {f"/{repo}/resolve/main/model.safetensors": [cut]},
        })
        try:
            self._env(srv, tmp_path, monkeypatch)
            path = fetch.fetch_model(repo)
            assert path.read_bytes() == weights
            ranges = [r for p, r in srv.cfg["requests"]
                      if p.endswith("/resolve/main/model.safetensors") and r]
            assert ranges, "no Range request seen — restart, not resume"
            assert ranges[0].startswith("bytes=")
        finally:
            srv.shutdown()

    def test_range_ignored_restarts_and_verifies(self, tmp_path,
                                                 monkeypatch, weights):
        """A server that answers a Range request with 200 (full body) must
        make the client restart the hash, not splice."""
        repo = "acme/tiny-model"
        cut = len(weights) // 2
        srv = _flaky_server({
            "routes": _lfs_repo_routes(repo, weights),
            "drop_after": {f"/{repo}/resolve/main/model.safetensors": [cut]},
            "honor_range": False,
        })
        try:
            self._env(srv, tmp_path, monkeypatch)
            path = fetch.fetch_model(repo)
            assert path.read_bytes() == weights
        finally:
            srv.shutdown()

    def test_two_drops_still_complete(self, tmp_path, monkeypatch, weights):
        repo = "acme/tiny-model"
        srv = _flaky_server({
            "routes": _lfs_repo_routes(repo, weights),
            "drop_after": {f"/{repo}/resolve/main/model.safetensors":
                           [len(weights) // 4, len(weights) // 4]},
        })
        try:
            self._env(srv, tmp_path, monkeypatch)
            path = fetch.fetch_model(repo)
            assert path.read_bytes() == weights
        finally:
            srv.shutdown()

    def test_all_default_models_snapshot_layout(self, tmp_path,
                                                monkeypatch):
        """fetch_models() must install ALL THREE reference repos exactly
        where find_local_checkpoint looks for each of them."""
        routes = {}
        blobs = {}
        for i, repo in enumerate(fetch.DEFAULT_MODELS):
            w = _safetensors_bytes(
                {"w": np.arange(16 + i, dtype=np.float32)})
            blobs[repo] = w
            routes.update(_lfs_repo_routes(repo, w))
        srv = _flaky_server({"routes": routes})
        try:
            self._env(srv, tmp_path, monkeypatch)
            out = fetch.fetch_models()
            for repo in fetch.DEFAULT_MODELS:
                path = out[repo]
                assert path.read_bytes() == blobs[repo]
                found = checkpoint_io.find_local_checkpoint(repo)
                assert found == path, (
                    f"{repo}: fetched to {path} but resolver found {found}")
        finally:
            srv.shutdown()

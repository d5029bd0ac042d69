"""Socket serving front-end (`nat --serve`, runtime/server.py).

Contract: each connection speaks the --stream-stdin protocol — client
streams audio bytes (FS-delimited multi-file ok), half-closes, reads one
complete NDJSON stream per file back, byte-identical (modulo end.stats
timings) to `pipeline.stream_stdin` over the same bytes.  Concurrent
connections share one tokenizer without corrupting each other's streams.
"""

import io
import json
import socket
import threading
import time

import numpy as np
import pytest

from nat_tpu.io.audio import encode_wav_pcm16
from nat_tpu.runtime.server import parse_address


def _wav_bytes(seconds=1.0, sr=8000, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return encode_wav_pcm16(x, sr)


class TestParseAddress:
    def test_unix(self):
        assert parse_address("unix:/tmp/x.sock") == ("unix", "/tmp/x.sock")

    def test_tcp_host_port(self):
        assert parse_address("tcp:0.0.0.0:9000") == ("tcp", ("0.0.0.0", 9000))
        assert parse_address("example.com:80") == ("tcp", ("example.com", 80))

    def test_bare_port_binds_loopback(self):
        assert parse_address(":7000") == ("tcp", ("127.0.0.1", 7000))

    @pytest.mark.parametrize("bad", ["unix:", "9000", "host:", "host:abc", ""])
    def test_rejects(self, bad):
        with pytest.raises(ValueError):
            parse_address(bad)


def _drop_end(lines):
    return [ln for ln in lines if '"event":"end"' not in ln]


def _client(address, payload: bytes):
    """Send payload, half-close, read all NDJSON lines back."""
    if isinstance(address, str):
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    else:
        conn = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    conn.connect(address)
    conn.sendall(payload)
    conn.shutdown(socket.SHUT_WR)
    buf = b""
    while True:
        got = conn.recv(1 << 16)
        if not got:
            break
        buf += got
    conn.close()
    return buf.decode("utf-8").splitlines()


@pytest.mark.mesh
@pytest.mark.skipif(
    int(__import__("os").environ.get("NAT_TPU_TEST_DEVICES", "1")) < 8,
    reason="needs virtual devices (NAT_TPU_TEST_DEVICES=8)")
def test_serve_mesh_sharded_batching_byte_identical(tmp_path):
    """Multi-chip serving: the batcher shards batched groups over a dp
    mesh; concurrent clients' streams stay byte-identical to the
    unsharded sequential reference."""
    import io

    from nat_tpu.parallel.mesh import make_mesh
    from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
    from nat_tpu.runtime.server import TokenServer

    pipe = AudioTokenizationPipeline(
        sample_rate=8000,
        model_config={"codebook_size": 64, "semantic_dim": 64,
                      "acoustic_dim": 64, "n_mels": 32},
        enable_reconstruction=False,
        codebook_init_method="random",
        enable_codebook_cache=False,
    )
    import jax

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    sock = tmp_path / "mesh.sock"
    with TokenServer(pipe, f"unix:{sock}", mesh=mesh) as srv:
        assert srv._batcher is not None and srv._batcher.mesh is mesh
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        payloads = [_wav_bytes(freq=f) for f in (262.0, 440.0, 660.0)]
        results = [None] * len(payloads)

        def run(i):
            results[i] = _client(srv.bound_address, payloads[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(payloads))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        for i, payload in enumerate(payloads):
            assert results[i] is not None, f"client {i} timed out"
            ref = []
            pipe.session().stream_stdin(io.BytesIO(payload), ref.append)
            assert _drop_end(results[i]) == _drop_end(ref), f"client {i}"
        assert srv._batcher.stats["spans"] >= 3


@pytest.mark.mesh
@pytest.mark.skipif(
    int(__import__("os").environ.get("NAT_TPU_TEST_DEVICES", "1")) < 8,
    reason="needs virtual devices (NAT_TPU_TEST_DEVICES=8)")
def test_mesh_dispatch_bypasses_aot_executable_cache(tmp_path, monkeypatch):
    """Sharded span dispatch must not reuse the shape-keyed AOT executable
    cache: an unsharded executable compiled (or prewarmed) for the exact
    same batch shape rejects dp-sharded inputs.  Populate the cache with
    the single-device [4, bucket] program first, then dispatch the same
    shape through a dp=4 mesh and require byte-identical results."""
    import jax

    from nat_tpu.models.tokenizer import NeuralAudioTokenizer
    from nat_tpu.parallel.mesh import make_mesh
    from nat_tpu.runtime.server import SpanBatcher

    monkeypatch.setenv("NAT_TPU_AOT_CACHE", "1")
    monkeypatch.setenv("NAT_TPU_AOT_CACHE_DIR", str(tmp_path))

    tok = NeuralAudioTokenizer(
        sample_rate=8000, semantic_dim=64, acoustic_dim=64,
        codebook_size=64, num_quantizers=4, n_mels=32,
        enable_reconstruction=False, codebook_init_method="random",
        enable_codebook_cache=False, use_pretrained_semantic=False,
        semantic_arch="spectral")
    tok.ensure_initialized()
    sr = 8000
    t = np.arange(sr) / sr
    segs = [(0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
            for f in (220.0, 330.0, 440.0, 550.0)]

    chunks, metas = zip(*(tok.prepare_span(s[None, :], 0, 0, s.size, 0, sr)
                          for s in segs))
    out_ref, metas_ref = tok.dispatch_prepared_group(
        list(chunks), list(metas), 4)
    ref = list(tok.finalize_span_group(out_ref, metas_ref,
                                       want_features=False))

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    batcher = SpanBatcher(tok, max_group=4, autostart=False, mesh=mesh)
    futs = [batcher.submit_span(s[None, :], 0, 0, s.size, 0, sr,
                                want_features=False) for s in segs]
    assert batcher._drain_once()
    assert batcher.stats["dispatches"] == 1
    for fut, r in zip(futs, ref):
        got = fut.result(timeout=0)
        np.testing.assert_array_equal(got["semantic_codes"],
                                      r["semantic_codes"])
        np.testing.assert_array_equal(got["acoustic_codes"],
                                      r["acoustic_codes"])


@pytest.mark.slow
def test_cli_serve_roundtrip(tmp_path):
    """`nat --serve` as a real subprocess: serves a stream, drains on
    SIGTERM, exits 0, and keeps its own stdout empty (NDJSON goes to the
    socket, never the daemon's stdout)."""
    import os
    import signal
    import subprocess
    import sys
    import time
    from pathlib import Path

    repo_root = Path(__file__).resolve().parent.parent
    sock = tmp_path / "cli.sock"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "nat_tpu", "--serve", f"unix:{sock}",
         "--compat-fallback"],
        cwd=str(repo_root), env=env, stdin=subprocess.DEVNULL,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        deadline = time.time() + 90
        while not sock.exists():
            assert proc.poll() is None, proc.stderr.read().decode()[:500]
            assert time.time() < deadline, "server socket never appeared"
            time.sleep(0.2)
        got = _client(str(sock), _wav_bytes())
        header = json.loads(got[0])
        assert header["event"] == "header" and header["compat_mode"]
        assert '"event":"end"' in got[-1]
        proc.send_signal(signal.SIGTERM)
        out, _err = proc.communicate(timeout=60)
        assert proc.returncode == 0
        assert out == b"", "daemon stdout must stay empty"
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
class TestTokenServer:
    @pytest.fixture(scope="class")
    def pipeline(self):
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

        return AudioTokenizationPipeline(
            sample_rate=8000,
            model_config={"codebook_size": 64, "semantic_dim": 64,
                          "acoustic_dim": 64, "n_mels": 32},
            enable_reconstruction=False,
            codebook_init_method="random",
            enable_codebook_cache=False,
        )

    @pytest.fixture(scope="class")
    def server(self, pipeline, tmp_path_factory):
        from nat_tpu.runtime.server import TokenServer

        sock = tmp_path_factory.mktemp("serve") / "nat.sock"
        srv = TokenServer(pipeline, f"unix:{sock}")
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.close()
        t.join(timeout=10)

    def _reference_lines(self, pipeline, payload: bytes):
        lines = []
        pipeline.session().stream_stdin(io.BytesIO(payload), lines.append)
        return lines

    def test_single_wav_matches_stream_stdin(self, pipeline, server):
        payload = _wav_bytes(freq=440.0)
        got = _client(server.bound_address, payload)
        ref = self._reference_lines(pipeline, payload)
        assert _drop_end(got) == _drop_end(ref)
        assert '"event":"header"' in got[0]
        assert '"event":"end"' in got[-1]
        # end.stats carries the raw-byte digest, like --stream-stdin
        import hashlib

        stats = json.loads(got[-1])["stats"]
        assert stats["audio_sha256"] == hashlib.sha256(payload).hexdigest()

    def test_concurrent_clients_isolated_streams(self, pipeline, server):
        payloads = [_wav_bytes(freq=f) for f in (261.6, 392.0, 523.3)]
        results = [None] * len(payloads)

        def run(i):
            results[i] = _client(server.bound_address, payloads[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, payload in enumerate(payloads):
            assert results[i] is not None, f"client {i} timed out"
            ref = self._reference_lines(pipeline, payload)
            assert _drop_end(results[i]) == _drop_end(ref), f"client {i}"

    def test_fs_multifile_one_connection(self, pipeline, server):
        a = _wav_bytes(freq=440.0)
        b = _wav_bytes(freq=660.0, seconds=0.5)
        got = _client(server.bound_address, a + b"\x1c" + b)
        headers = [ln for ln in got if '"event":"header"' in ln]
        ends = [ln for ln in got if '"event":"end"' in ln]
        assert len(headers) == 2 and len(ends) == 2
        ref = []
        pipeline.session().stream_stdin(
            io.BytesIO(a + b"\x1c" + b), ref.append)
        assert _drop_end(got) == _drop_end(ref)

    def test_tcp_address(self, pipeline):
        from nat_tpu.runtime.server import TokenServer

        with TokenServer(pipeline, ":0") as srv:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            payload = _wav_bytes(freq=330.0)
            got = _client(srv.bound_address, payload)
            assert '"event":"header"' in got[0]
            assert '"event":"end"' in got[-1]

    def test_empty_connection_closes_cleanly(self, server):
        got = _client(server.bound_address, b"")
        assert got == []

    def test_span_batcher_groups_and_matches_sequential(self, pipeline):
        """Deterministic cross-session batching check: three spans queued
        before one drain dispatch as ONE batched forward whose per-row
        results are byte-identical to sequential tokenize_span calls."""
        from nat_tpu.runtime.server import SpanBatcher

        tok = pipeline.tokenizer
        tok.ensure_initialized()
        sr = 8000
        segs = []
        for freq in (220.0, 440.0, 880.0):
            t = np.arange(sr) / sr
            segs.append((0.5 * np.sin(2 * np.pi * freq * t))
                        .astype(np.float32))

        batcher = SpanBatcher(tok, max_group=4, autostart=False)
        futs = [batcher.submit_span(s[None, :], 0, 0, s.size, 0, sr,
                                    want_features=False) for s in segs]
        assert batcher._drain_once()
        assert batcher.stats == {"spans": 3, "dispatches": 1}
        for fut, seg in zip(futs, segs):
            got = fut.result(timeout=0)
            ref = tok.tokenize_span(seg[None, :], 0, 0, seg.size, 0, sr,
                                    want_features=False)
            np.testing.assert_array_equal(got["semantic_codes"],
                                          ref["semantic_codes"])
            np.testing.assert_array_equal(got["acoustic_codes"],
                                          ref["acoustic_codes"])

    def test_coalescing_policy(self, pipeline):
        """_next_batch hold-back semantics: with a shallow device pipeline
        it pops immediately; with >=_COALESCE_BUSY batches in flight it
        waits for a full same-key group, a busy drop, or the cap — and a
        full group returns without burning the cap."""
        from nat_tpu.runtime.server import SpanBatcher

        tok = pipeline.tokenizer
        tok.ensure_initialized()
        sr = 8000
        t = np.arange(sr) / sr
        seg = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)

        def submit(b):
            return b.submit_span(seg[None, :], 0, 0, seg.size, 0, sr,
                                 want_features=False)

        # Shallow pipeline (busy < threshold): no hold-back.
        b = SpanBatcher(tok, max_group=4, autostart=False)
        b._coalesce_s = 5.0
        b._busy = 1
        submit(b)
        start = time.perf_counter()
        batch = b._next_batch()
        assert len(batch) == 1
        assert time.perf_counter() - start < 1.0

        # Deep pipeline: the cap bounds the wait when no group fills.
        b._busy = 2
        b._coalesce_s = 0.05
        submit(b)
        start = time.perf_counter()
        batch = b._next_batch()
        waited = time.perf_counter() - start
        assert len(batch) == 1
        assert 0.04 <= waited < 2.0

        # Deep pipeline: a filling group releases the wait early.
        b._coalesce_s = 30.0
        submit(b)

        def fill():
            time.sleep(0.1)
            for _ in range(3):
                submit(b)

        threading.Thread(target=fill, daemon=True).start()
        start = time.perf_counter()
        batch = b._next_batch()
        assert len(batch) == 4      # full max_group
        assert time.perf_counter() - start < 10.0

        # Deep pipeline: a busy drop (finalized batch) releases the wait.
        submit(b)

        def drop():
            time.sleep(0.1)
            with b._cv:
                b._busy = 1
                b._cv.notify_all()

        threading.Thread(target=drop, daemon=True).start()
        start = time.perf_counter()
        batch = b._next_batch()
        assert len(batch) == 1
        assert time.perf_counter() - start < 10.0
        # Resolve the dangling futures so no daemon state leaks.
        b._closed = True

    def test_batch_failure_retries_individually(self, pipeline):
        """A failing batched dispatch must not poison innocent co-batched
        requests: the batcher retries each span alone."""
        from nat_tpu.runtime.server import SpanBatcher

        tok = pipeline.tokenizer
        tok.ensure_initialized()
        sr = 8000
        t = np.arange(sr) / sr
        segs = [(0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
                for f in (330.0, 550.0)]

        batcher = SpanBatcher(tok, max_group=4, autostart=False)
        orig = tok.dispatch_prepared_group

        def flaky(chunks, metas, group_size, **kw):
            if len(chunks) > 1:
                raise RuntimeError("injected batch failure")
            return orig(chunks, metas, group_size, **kw)

        tok.dispatch_prepared_group = flaky
        try:
            futs = [batcher.submit_span(s[None, :], 0, 0, s.size, 0, sr,
                                        want_features=False) for s in segs]
            assert batcher._drain_once()
            for fut, seg in zip(futs, segs):
                got = fut.result(timeout=0)
                ref = tok.tokenize_span(seg[None, :], 0, 0, seg.size, 0,
                                        sr, want_features=False)
                np.testing.assert_array_equal(got["semantic_codes"],
                                              ref["semantic_codes"])
        finally:
            tok.dispatch_prepared_group = orig

    def test_serve_with_batching_byte_identical(self, pipeline, monkeypatch,
                                                tmp_path):
        """A server with cross-session batching active serves streams
        byte-identical to unbatched stream_stdin."""
        from nat_tpu.runtime.server import TokenServer

        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
        sock = tmp_path / "batch.sock"
        with TokenServer(pipeline, f"unix:{sock}") as srv:
            assert srv._batcher is not None
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            payloads = [_wav_bytes(freq=f) for f in (262.0, 330.0, 494.0)]
            results = [None] * len(payloads)

            def run(i):
                results[i] = _client(srv.bound_address, payloads[i])

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(len(payloads))]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=120)
            for i, payload in enumerate(payloads):
                assert results[i] is not None, f"client {i} timed out"
                ref = self._reference_lines(pipeline, payload)
                assert _drop_end(results[i]) == _drop_end(ref), f"client {i}"
            assert srv._batcher.stats["spans"] >= 3

    def test_idle_timeout_drops_stalled_producer(self, pipeline, monkeypatch,
                                                 tmp_path):
        from nat_tpu.runtime.server import TokenServer

        monkeypatch.setenv("NAT_TPU_SERVE_IDLE_S", "0.5")
        sock = tmp_path / "idle.sock"
        with TokenServer(pipeline, f"unix:{sock}") as srv:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(str(sock))
            c.sendall(_wav_bytes()[:100])  # partial payload, then stall
            c.settimeout(30)
            # Server must drop us (EOF within the client timeout) instead
            # of waiting forever; the partial stream it managed to emit
            # (header, maybe early frames) must not include an end event.
            buf = b""
            while True:
                got = c.recv(1 << 16)
                if not got:
                    break
                buf += got
            assert b'"event":"end"' not in buf
            c.close()

    def test_concurrent_multifile_stress(self, pipeline, server):
        """6 clients × 3 FS-delimited files each, all at once: every
        client's streams must match its own sequential reference."""
        rng = np.random.default_rng(11)
        payloads = []
        for _ in range(6):
            freqs = rng.uniform(200, 900, size=3)
            payloads.append(b"\x1c".join(
                _wav_bytes(seconds=0.5, freq=float(f)) for f in freqs))
        results = [None] * len(payloads)

        def run(i):
            results[i] = _client(server.bound_address, payloads[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, payload in enumerate(payloads):
            assert results[i] is not None, f"client {i} timed out"
            assert sum('"event":"end"' in ln for ln in results[i]) == 3
            ref = self._reference_lines(pipeline, payload)
            assert _drop_end(results[i]) == _drop_end(ref), f"client {i}"

    def test_header_emits_before_payload_completes(self, server):
        """Live-source liveness: the NDJSON header must come back while
        the client is still sending (no greedy 64 KB buffering)."""
        payload = _wav_bytes(seconds=2.0)
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(server.bound_address)
        c.sendall(payload[:4000])
        c.settimeout(60)
        first = c.recv(1 << 16)      # blocks only until the header line
        assert b'"event":"header"' in first
        c.sendall(payload[4000:])
        c.shutdown(socket.SHUT_WR)
        buf = first
        while True:
            got = c.recv(1 << 16)
            if not got:
                break
            buf += got
        c.close()
        lines = buf.decode().splitlines()
        assert '"event":"end"' in lines[-1]
        for ln in lines:
            json.loads(ln)

    def test_graceful_drain_completes_inflight_stream(self, pipeline,
                                                      tmp_path):
        """stop_accepting + drain: an in-flight client finishes its stream;
        new connections are refused."""
        from nat_tpu.runtime.server import TokenServer

        payload = _wav_bytes(seconds=2.0)
        sock = tmp_path / "drain.sock"
        with TokenServer(pipeline, f"unix:{sock}") as srv:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(str(sock))
            c.sendall(payload[:4000])           # connection now in flight
            c.settimeout(60)
            assert b'"event":"header"' in c.recv(1 << 16)

            srv.stop_accepting()
            import time as _time

            _time.sleep(0.2)   # let the accept loop observe the shutdown
            with pytest.raises(OSError):
                late = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                try:
                    late.connect(str(sock))
                finally:
                    late.close()

            c.sendall(payload[4000:])
            c.shutdown(socket.SHUT_WR)
            buf = b""
            while True:
                got = c.recv(1 << 16)
                if not got:
                    break
                buf += got
            c.close()
            assert b'"event":"end"' in buf.splitlines()[-1]
            assert srv.drain(timeout=30)

    def test_token_client_roundtrip(self, pipeline, server):
        """TokenClient: streamed events match raw-socket lines; tokenize()
        returns parsed TokenStreams per FS-multiplexed file."""
        from nat_tpu.client import TokenClient, healthcheck

        addr = f"unix:{server.bound_address}"
        assert healthcheck(addr)
        payload = _wav_bytes(freq=550.0)

        client = TokenClient(addr)
        events = list(client.stream(payload))
        assert events[0]["event"] == "header"
        assert events[-1]["event"] == "end"
        raw = _client(server.bound_address, payload)
        assert [json.loads(ln)["event"] for ln in raw] == [
            e["event"] for e in events]

        a = _wav_bytes(freq=440.0, seconds=3.0)
        b = _wav_bytes(freq=660.0, seconds=0.5)
        streams = client.tokenize(a, b)
        assert len(streams) == 2
        assert streams[0].num_frames > streams[1].num_frames > 0
        assert streams[0].semantic.shape[0] == 4
        # Per-file results equal single-file requests
        solo = client.tokenize(a)[0]
        np.testing.assert_array_equal(solo.semantic, streams[0].semantic)
        np.testing.assert_array_equal(solo.acoustic, streams[0].acoustic)
        # A single list argument is accepted as the varargs spelling
        listed = client.tokenize([a, b])
        assert len(listed) == 2
        np.testing.assert_array_equal(listed[0].semantic, streams[0].semantic)
        np.testing.assert_array_equal(listed[1].acoustic, streams[1].acoustic)

    def test_token_client_rejected_payload_raises(self, pipeline, server):
        """A payload the daemon rejects (corrupt container: the AU reader
        fails before any header emits) surfaces as ValueError from
        tokenize(), not a silent empty result."""
        from nat_tpu.client import TokenClient

        corrupt_au = b".snd" + bytes(60)   # encoding 0 = invalid
        client = TokenClient(f"unix:{server.bound_address}")
        with pytest.raises(ValueError, match="0 complete stream"):
            client.tokenize(corrupt_au)

    def test_token_client_partial_multifile_raises(self, tmp_path):
        """A daemon that dies partway through a multi-file request (one
        complete stream for two sources) must raise, never return a
        misaligned short list."""
        from nat_tpu.client import TokenClient

        sock = str(tmp_path / "fake.sock")
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(sock)
        srv.listen(1)

        def fake_daemon():
            conn, _ = srv.accept()
            while conn.recv(1 << 16):
                pass                       # drain the upload to EOF
            conn.sendall(b'{"event":"header","layers":[]}\n'
                         b'{"event":"end","stats":{}}\n')
            conn.close()

        t = threading.Thread(target=fake_daemon, daemon=True)
        t.start()
        try:
            client = TokenClient(f"unix:{sock}")
            with pytest.raises(ValueError,
                               match=r"1 complete stream\(s\) for 2"):
                client.tokenize(b"aaaa", b"bbbb")
        finally:
            srv.close()

    def test_shutdown_while_slots_saturated(self, pipeline, tmp_path):
        """SIGTERM shutdown must end the accept loop even when every
        connection slot is busy and a newly accepted connection is parked
        waiting for a slot (a bare Semaphore.acquire would hang
        serve_forever until a slot freed, then serve post-shutdown work)."""
        import time

        from nat_tpu.runtime.server import TokenServer

        sock = str(tmp_path / "sat.sock")
        srv = TokenServer(pipeline, f"unix:{sock}", max_connections=1)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        # Occupy the single slot with a stalled producer (no bytes sent:
        # its handler blocks in the container sniff).
        c1 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c1.connect(sock)
        for _ in range(100):
            if srv._active >= 1:
                break
            time.sleep(0.05)
        assert srv._active == 1
        # Second connection: accepted, then parked in the slot wait.
        c2 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c2.connect(sock)
        time.sleep(0.4)
        srv.stop_accepting()
        t.join(timeout=5)
        assert not t.is_alive()
        c1.close()
        c2.close()
        srv.close()

    def test_token_client_healthcheck_down(self, tmp_path):
        from nat_tpu.client import healthcheck

        assert not healthcheck(f"unix:{tmp_path}/nothing.sock", timeout=1)

    def test_prewarm_compiles_stream_shapes(self, pipeline, monkeypatch,
                                            tmp_path):
        """NAT_TPU_SERVE_PREWARM=1 compiles every shape a long-stream
        burst needs at startup — the 30 s bucket at [1]/[max_group] rows
        plus the first-frame ramp bucket at [1] and, for co-batched ramp
        spans, [max_group] (stubbed forward: the wiring, not the compile,
        is under test)."""
        import time as _time

        from nat_tpu.runtime.bucketing import (FIRST_SPAN_S,
                                               MAX_SINGLE_CHUNK_S,
                                               bucket_length)
        from nat_tpu.runtime.server import TokenServer

        monkeypatch.setenv("NAT_TPU_SERVE_PREWARM", "1")
        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
        tok = pipeline.tokenizer
        calls = []

        def fake_forward_for(bucket, sr=None):
            def fake(params, s, a, wave, rng):
                calls.append(tuple(wave.shape))
                return {"semantic_codes":
                        np.zeros((4, wave.shape[0], 1), np.int32)}
            return fake, None

        sr = pipeline.sample_rate
        big = bucket_length(int(MAX_SINGLE_CHUNK_S * sr), sr)
        ramp = bucket_length(int(FIRST_SPAN_S * sr), sr)
        expected = {(1, ramp), (1, big), (4, big), (4, ramp)}
        monkeypatch.setattr(tok, "_forward_for", fake_forward_for)
        with TokenServer(pipeline, f"unix:{tmp_path}/p.sock"):
            deadline = _time.time() + 20
            while len(calls) < len(expected) and _time.time() < deadline:
                _time.sleep(0.05)
        assert set(calls) == expected

    def test_compat_pipeline_serves_buffered(self, tmp_path):
        """Compat mode has no incremental tokenizer: the server must route
        every connection through the buffered whole-file path and still
        return complete, labeled streams."""
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
        from nat_tpu.runtime.server import TokenServer

        pipe = AudioTokenizationPipeline(sample_rate=8000,
                                         enable_compat_fallback=True)
        sock = tmp_path / "compat.sock"
        with TokenServer(pipe, f"unix:{sock}") as srv:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            got = _client(srv.bound_address, _wav_bytes())
            header = json.loads(got[0])
            assert header["event"] == "header" and header["compat_mode"]
            assert '"event":"end"' in got[-1]

    def test_buffered_fallback_raw_pcm(self, pipeline, server):
        # Raw int16 bytes: no incremental reader claims them, so the server
        # buffers to EOF, decodes through the load_audio ladder (raw-PCM
        # reinterpretation — same as CLI stdin), and streams the decoded
        # samples through the span machinery.
        rng = np.random.default_rng(7)
        payload = (rng.standard_normal(4000) * 3000).astype("<i2").tobytes()
        got = _client(server.bound_address, payload)
        assert '"event":"header"' in got[0]
        assert '"event":"end"' in got[-1]
        assert any('"event":"frame"' in ln or '"event":"tokens"' in ln
                   for ln in got)
        for ln in got:
            json.loads(ln)

    def test_concurrent_buffered_clients_isolated(self, pipeline, server):
        """Buffered-format clients must scale like streaming clients
        (VERDICT r3 #6): concurrent raw-PCM payloads produce streams
        byte-identical to a solo run of the same payload."""
        rng = np.random.default_rng(11)
        payloads = [(rng.standard_normal(4000) * s).astype("<i2").tobytes()
                    for s in (2000, 4000, 8000)]
        results = [None] * len(payloads)

        def run(i):
            results[i] = _client(server.bound_address, payloads[i])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(len(payloads)):
            assert results[i] is not None, f"client {i} timed out"
            solo = _client(server.bound_address, payloads[i])
            assert _drop_end(results[i]) == _drop_end(solo), f"client {i}"

    def test_buffered_serving_matches_cli_stdin_path(self, pipeline, server,
                                                     tmp_path):
        """Served buffered payloads must match the CLI --stdin path on the
        same bytes: load_audio peak-normalizes once, and the server must
        NOT normalize again (a second divide bitwise-changes every
        below-full-scale sample → different audio_sha256 and potentially
        different tokens).  Regression test for the round-4 double-
        normalize bug on _serve_buffered → stream_audio_array."""
        rng = np.random.default_rng(23)
        # Quiet payload: peak |i16| far below full scale, so any second
        # normalize changes bit patterns.  Avoid 0x1C bytes (ASCII FS):
        # the wire protocol splits on them, so the raw samples must not
        # contain any or the server sees multiple files.
        samples = (rng.standard_normal(4000) * 500).astype("<i2")
        raw = samples.view(np.uint8).reshape(-1, 2)
        samples[(raw == 0x1C).any(axis=1)] = 77
        payload = samples.tobytes()
        assert b"\x1c" not in payload
        got = _client(server.bound_address, payload)

        # CLI path on the same bytes: temp file → process_audio (buffered
        # NDJSON emission, single normalize inside load_audio).
        path = tmp_path / "quiet.raw"
        path.write_bytes(payload)
        result = pipeline.session().process_audio(
            str(path), ndjson_streaming=True, want_features=False)
        ref = result["ndjson_output"].splitlines()

        got_hdr, ref_hdr = json.loads(got[0]), json.loads(ref[0])
        got_meta = got_hdr.pop("metadata")
        ref_meta = ref_hdr.pop("metadata")
        got_meta.pop("file_path"), ref_meta.pop("file_path")
        ref_meta.pop("device", None)  # process_audio adds device info
        assert got_meta["audio_sha256"] == ref_meta["audio_sha256"]
        assert got_hdr["audio_sha256"] == ref_hdr["audio_sha256"]
        assert got_hdr == ref_hdr
        # Frame lines byte-identical; end event carries wall-clock stats.
        assert _drop_end(got)[1:] == _drop_end(ref)[1:]

    def test_buffered_path_skips_coarse_lock_for_neural(self, pipeline,
                                                        server):
        """While one buffered neural payload is mid-flight, a second must
        not need the coarse _buffered_lock: hold the lock and require the
        request to complete anyway."""
        rng = np.random.default_rng(13)
        payload = (rng.standard_normal(4000) * 3000).astype("<i2").tobytes()
        with server._buffered_lock:
            got = _client(server.bound_address, payload)
        assert '"event":"end"' in got[-1]

    def test_buffered_clients_cobatch_through_span_batcher(self, tmp_path,
                                                           monkeypatch):
        """With the SpanBatcher active, buffered payloads submit their
        spans to the shared batcher (stats["spans"] grows)."""
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline
        from nat_tpu.runtime.server import TokenServer

        monkeypatch.setenv("NAT_TPU_STREAM_GROUP", "4")
        pipe = AudioTokenizationPipeline(
            sample_rate=8000,
            model_config={"codebook_size": 64, "semantic_dim": 64,
                          "acoustic_dim": 64, "n_mels": 32},
            enable_reconstruction=False,
            codebook_init_method="random",
            enable_codebook_cache=False,
        )
        sock = tmp_path / "cobatch.sock"
        with TokenServer(pipe, f"unix:{sock}") as srv:
            assert srv._batcher is not None
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            rng = np.random.default_rng(17)
            payload = (rng.standard_normal(4000) * 3000
                       ).astype("<i2").tobytes()
            got = _client(srv.bound_address, payload)
            assert '"event":"end"' in got[-1]
            assert srv._batcher.stats["spans"] >= 1


class TestServeAuth:
    """Opt-in auth: token enforcement, and graceful handling of a
    client/server auth-config mismatch (ADVICE r4: a stray AUTH line must
    never be fed into container sniffing as audio payload)."""

    @pytest.fixture(scope="class")
    def pipeline(self):
        from nat_tpu.runtime.pipeline import AudioTokenizationPipeline

        return AudioTokenizationPipeline(
            sample_rate=8000,
            model_config={"codebook_size": 64, "semantic_dim": 64,
                          "acoustic_dim": 64, "n_mels": 32},
            enable_reconstruction=False,
            codebook_init_method="random",
            enable_codebook_cache=False,
        )

    @pytest.fixture(scope="class")
    def server(self, pipeline, tmp_path_factory):
        from nat_tpu.runtime.server import TokenServer

        sock = tmp_path_factory.mktemp("auth") / "nat.sock"
        srv = TokenServer(pipeline, f"unix:{sock}")
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv
        srv.close()
        t.join(timeout=10)

    def _reference_lines(self, pipeline, payload: bytes):
        lines = []
        pipeline.session().stream_stdin(io.BytesIO(payload), lines.append)
        return lines

    def test_missing_token_rejected_with_reason(self, pipeline, server,
                                                monkeypatch):
        from nat_tpu.client import TokenClient

        monkeypatch.setenv("NAT_TPU_SERVE_AUTH", "sekrit")
        # auth="" (not None): None would pick the monkeypatched env var up
        # and authenticate — this test wants a tokenless client.
        client = TokenClient(f"unix:{server.bound_address}", auth="")
        with pytest.raises(ValueError) as exc:
            client.tokenize(_wav_bytes())
        # ADVICE r4: the daemon's own error text must reach the caller.
        assert "authentication required" in str(exc.value)

    def test_wrong_token_rejected(self, server, monkeypatch):
        monkeypatch.setenv("NAT_TPU_SERVE_AUTH", "sekrit")
        got = _client(server.bound_address,
                      b"AUTH wrong\n" + _wav_bytes())
        assert len(got) == 1
        assert json.loads(got[0])["event"] == "error"

    def test_correct_token_streams_identically(self, pipeline, server,
                                               monkeypatch):
        from nat_tpu.client import TokenClient

        monkeypatch.setenv("NAT_TPU_SERVE_AUTH", "sekrit")
        payload = _wav_bytes(freq=330.0)
        client = TokenClient(f"unix:{server.bound_address}", auth="sekrit")
        stream = client.tokenize(payload)[0]
        ref = self._reference_lines(pipeline, payload)
        ref_stream_events = [json.loads(ln) for ln in _drop_end(ref)]
        from nat_tpu.stream.reader import parse_events
        ref_stream = parse_events(ref_stream_events + [{"event": "end"}])
        assert np.array_equal(stream.semantic, ref_stream.semantic)
        assert np.array_equal(stream.acoustic, ref_stream.acoustic)

    def test_stray_auth_line_stripped_when_auth_disabled(self, pipeline,
                                                         server,
                                                         monkeypatch):
        """Client env has a token, daemon runs without auth: the AUTH line
        must be stripped, not treated as payload bytes (ADVICE r4 medium)."""
        monkeypatch.delenv("NAT_TPU_SERVE_AUTH", raising=False)
        payload = _wav_bytes(freq=523.3)
        got = _client(server.bound_address, b"AUTH leftover-token\n" + payload)
        ref = self._reference_lines(pipeline, payload)
        assert _drop_end(got) == _drop_end(ref)

    def test_post_auth_short_remainder_still_streams(self, pipeline, server,
                                                     monkeypatch):
        """A long token eats most of the sniffed block: the remainder must
        be topped back up to the sniff minimum so a streamable WAV does
        not silently degrade to the buffered path (ADVICE r4)."""
        from nat_tpu.runtime.server import TokenServer

        token = "t" * 48
        monkeypatch.setenv("NAT_TPU_SERVE_AUTH", token)
        buffered_calls = []
        orig = TokenServer._serve_buffered

        def spy(self, *a, **kw):
            buffered_calls.append(1)
            return orig(self, *a, **kw)

        monkeypatch.setattr(TokenServer, "_serve_buffered", spy)
        payload = _wav_bytes(freq=261.6)
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(server.bound_address)
        # First block: AUTH line + a sliver of the WAV header, then a
        # pause so the server's first-available-block sniff sees ONLY
        # this — the post-AUTH remainder (8 bytes) is below the sniff
        # minimum and must be topped up, not mis-sniffed.
        conn.sendall(b"AUTH " + token.encode() + b"\n" + payload[:8])
        time.sleep(0.4)
        conn.sendall(payload[8:])
        conn.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            got = conn.recv(1 << 16)
            if not got:
                break
            buf += got
        conn.close()
        lines = [ln for ln in buf.decode().splitlines() if ln.strip()]
        ref = self._reference_lines(pipeline, payload)
        assert _drop_end(lines) == _drop_end(ref)
        assert not buffered_calls, "streamable WAV degraded to buffered path"

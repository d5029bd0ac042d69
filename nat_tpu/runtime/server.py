"""Socket serving front-end: a long-lived tokenizer daemon for production.

The reference's closest serving surface is a persistent ``... | nat
--stream-stdin`` pipe (one producer).  ``nat --serve ADDR`` generalizes it
to many concurrent producers over Unix or TCP sockets: each connection
speaks exactly the stdin-daemon wire protocol — the client streams audio
bytes (one file, or several separated by ASCII FS 0x1C), half-closes its
write side at EOF, and reads back one complete NDJSON token stream
(``header``/``frame``/``end``) per file, with frames emitted while later
audio is still arriving.

Architecture (TPU-first): connections are host-side threads; they share
ONE compiled tokenizer (per-(sr,bucket) programs compile once for the
daemon's lifetime, AOT-cached across restarts).  The tokenizer's
``_device_lock`` serializes span dispatch, so concurrent streams interleave
span-by-span on the chip — the device stays busy whenever any connection
has audio buffered, and a stalled producer never blocks the others.  All
per-stream serialization state lives in a per-connection
``pipeline.session()`` clone.

Incremental formats (WAV/AIFF/AU/FLAC, and MP3/OGG via the codec shim)
stream; anything else falls back to buffered whole-payload tokenization
(same ladder as the CLI's ``--stream-stdin`` fallback, down to raw-PCM
reinterpretation) under a coarse lock.

No counterpart in the reference (serving is new TPU-framework scope);
the wire protocol matches reference stdin semantics
(neural_audio_tokenizer.py:5195-5222 FS splitting, :5513-5517 raw bytes).
"""

from __future__ import annotations

import os
import socket
import threading
from typing import Optional, Tuple, Union

from ..utils.logging import logger

Address = Union[str, Tuple[str, int]]


def parse_address(spec: str) -> Tuple[str, Address]:
    """Parse a ``--serve`` address spec.

    ``unix:/path/sock`` → Unix domain socket; ``tcp:HOST:PORT``,
    ``HOST:PORT``, or ``:PORT`` → TCP (bare ``:PORT`` binds loopback —
    exposing a tokenizer fleet-wide is an explicit choice, not a default).
    """
    if spec.startswith("unix:"):
        path = spec[len("unix:"):]
        if not path:
            raise ValueError("unix: address needs a socket path")
        return "unix", path
    if spec.startswith("tcp:"):
        spec = spec[len("tcp:"):]
    host, sep, port = spec.rpartition(":")
    if not sep or not port.isdigit():
        raise ValueError(
            f"invalid serve address {spec!r} (use unix:/path, HOST:PORT, "
            f"or :PORT)")
    return "tcp", (host or "127.0.0.1", int(port))


class TokenServer:
    """Threaded socket server wrapping an :class:`AudioTokenizationPipeline`.

    ``serve_forever()`` blocks in the accept loop; ``close()`` (any thread)
    stops it and unlinks Unix sockets.  Connection handlers are daemon
    threads; a semaphore bounds concurrency (``max_connections``, env
    ``NAT_TPU_SERVE_MAX_CONNS``, default 32) — excess connections queue in
    the listen backlog rather than being refused.
    """

    def __init__(self, pipeline, address: str,
                 max_connections: Optional[int] = None) -> None:
        self.pipeline = pipeline
        self.family, self.addr = parse_address(address)
        if max_connections is None:
            max_connections = int(
                os.environ.get("NAT_TPU_SERVE_MAX_CONNS", "32"))
        self._slots = threading.Semaphore(max(1, max_connections))
        self._closed = threading.Event()
        self._conn_seq = 0

        if self.family == "unix":
            # A previous daemon's stale socket file would make bind fail;
            # only unlink actual sockets (never a regular file at the path).
            try:
                import stat

                if stat.S_ISSOCK(os.stat(self.addr).st_mode):
                    os.unlink(self.addr)
            except OSError:
                pass
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.bind(self.addr)
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind(self.addr)
        self._sock.listen(64)
        # Compile/seed once up front so the first connection doesn't pay
        # init latency inside its stream (mirrors CLI ensure_initialized).
        tok = pipeline.tokenizer
        if hasattr(tok, "ensure_initialized"):
            tok.ensure_initialized()
        # Buffered-fallback requests serialize whole-file (compat tokenizer
        # and process_audio are not span-interleaved); streaming requests
        # use the tokenizer's own span-level lock instead.
        self._buffered_lock = threading.Lock()

    # ------------------------------------------------------------------
    @property
    def bound_address(self) -> Address:
        """The actual bound address (resolves TCP port 0)."""
        if self.family == "unix":
            return self.addr
        return self._sock.getsockname()[:2]

    # ------------------------------------------------------------------
    def serve_forever(self) -> None:
        host = (self.bound_address if self.family == "unix"
                else "%s:%d" % self.bound_address)
        logger.info(f"Serving on {self.family}:{host}")
        while not self._closed.is_set():
            try:
                conn, _peer = self._sock.accept()
            except OSError:
                break  # listener closed
            self._slots.acquire()
            self._conn_seq += 1
            t = threading.Thread(
                target=self._handle, args=(conn, self._conn_seq),
                name=f"nat-serve-{self._conn_seq}", daemon=True)
            t.start()
        logger.info("Server stopped")

    def close(self) -> None:
        self._closed.set()
        try:
            self._sock.close()
        finally:
            if self.family == "unix":
                try:
                    os.unlink(self.addr)
                except OSError:
                    pass

    def __enter__(self) -> "TokenServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------------
    def _handle(self, conn: socket.socket, cid: int) -> None:
        try:
            logger.debug(f"conn#{cid}: accepted")
            rfile = conn.makefile("rb")

            def write(line: str) -> None:
                data = line.encode("utf-8")
                if not data.endswith(b"\n"):
                    data += b"\n"
                conn.sendall(data)

            self._serve_stream(rfile, write, cid)
            try:
                conn.shutdown(socket.SHUT_WR)
            except OSError:
                pass
        except (BrokenPipeError, ConnectionResetError):
            logger.debug(f"conn#{cid}: client disconnected")
        except Exception as exc:
            logger.warn(f"conn#{cid}: {type(exc).__name__}: {exc}")
        finally:
            try:
                conn.close()
            except OSError:
                pass
            self._slots.release()

    def _serve_stream(self, rfile, write, cid: int) -> None:
        """One connection = one stdin-daemon session: sniff, then stream
        incrementally or fall back to buffered tokenization."""
        from ..cli import _PrefixedStream
        from ..io.stream_reader import make_stream_reader

        head = rfile.read(1 << 16)
        if not head:
            logger.debug(f"conn#{cid}: empty payload")
            return
        session = self.pipeline.session()
        if (make_stream_reader(head.lstrip(b"\x1c")) is not None
                and hasattr(session.tokenizer, "tokenize_span")):
            session.stream_stdin(_PrefixedStream(head, rfile), write)
            return
        logger.debug(f"conn#{cid}: not incrementally decodable; buffering")
        self._serve_buffered(session, head + rfile.read(), write)

    def _serve_buffered(self, session, payload: bytes, write) -> None:
        from ..io.stdinio import (chunks_to_temp_files, cleanup_temp_files,
                                  split_fs_chunks)

        chunks = split_fs_chunks(payload)
        if not chunks:
            raise ValueError("empty stream: no audio before EOF")
        temp_files = chunks_to_temp_files(chunks)
        try:
            with self._buffered_lock:
                for path in temp_files:
                    result = session.process_audio(
                        path, ndjson_streaming=True, want_features=False)
                    for line in result["ndjson_output"].splitlines():
                        write(line)
        finally:
            cleanup_temp_files(temp_files)


def run_server(pipeline, address: str) -> int:
    """CLI entry: serve until SIGINT/SIGTERM.  Returns a process exit code."""
    import signal

    server = TokenServer(pipeline, address)
    stop = lambda *_sig: server.close()  # noqa: E731
    signal.signal(signal.SIGINT, stop)
    signal.signal(signal.SIGTERM, stop)
    try:
        server.serve_forever()
    finally:
        server.close()
    return 0

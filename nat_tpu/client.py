"""Client for a ``nat --serve`` tokenizer daemon.

Completes the serving surface (runtime/server.py): connect to a
unix/TCP daemon, stream audio bytes up, consume NDJSON events as they
arrive (frames emit before the upload finishes on incremental formats),
or collect whole parsed :class:`~nat_tpu.stream.reader.TokenStream`
results per file.

The wire protocol is exactly the ``--stream-stdin`` contract: raw audio
bytes (ASCII-FS 0x1C between files for multi-file requests), half-close
the write side at EOF, read newline-delimited JSON back until the server
closes.  No counterpart in the reference (its stdin pipe is the closest
analog, neural_audio_tokenizer.py:5216-5222).

Example::

    from nat_tpu.client import TokenClient

    client = TokenClient("unix:/tmp/nat.sock")
    for event in client.stream_file("song.wav"):   # dicts, as they arrive
        ...
    result = client.tokenize_file("song.wav")      # parsed TokenStream
"""

from __future__ import annotations

import json
import os
import socket
import threading
from typing import IO, Iterator, List, Optional, Union

from .runtime.server import parse_address
from .stream.reader import TokenStream, parse_events

BytesLike = Union[bytes, bytearray, memoryview]

FS = b"\x1c"


class TokenClient:
    """Thin, dependency-free client for the ``--serve`` daemon.

    ``auth`` is the daemon's shared secret when it runs with
    ``NAT_TPU_SERVE_AUTH`` set — sent as an ``AUTH <token>\\n`` line
    ahead of the audio payload (defaults to the client's own
    ``NAT_TPU_SERVE_AUTH`` environment)."""

    def __init__(self, address: str, connect_timeout: float = 30.0,
                 auth: Optional[str] = None) -> None:
        self.family, self.addr = parse_address(address)
        self.connect_timeout = connect_timeout
        if auth is None:
            auth = os.environ.get("NAT_TPU_SERVE_AUTH") or None
        self.auth = auth

    # ------------------------------------------------------------------
    def _connect(self) -> socket.socket:
        if self.family == "unix":
            conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        else:
            conn = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        conn.settimeout(self.connect_timeout)
        conn.connect(self.addr)
        conn.settimeout(None)
        return conn

    # ------------------------------------------------------------------
    def stream(self, source: Union[BytesLike, IO[bytes]],
               chunk_bytes: int = 1 << 16) -> Iterator[dict]:
        """Send ``source`` (bytes or a binary file object) and yield parsed
        NDJSON events as the daemon emits them.  The upload runs on a
        helper thread so events arrive while audio is still being sent
        (live sources: pass the file object, not pre-read bytes)."""
        conn = self._connect()

        def upload() -> None:
            try:
                if self.auth:
                    conn.sendall(b"AUTH " + self.auth.encode() + b"\n")
                if isinstance(source, (bytes, bytearray, memoryview)):
                    conn.sendall(source)
                else:
                    while True:
                        block = source.read(chunk_bytes)
                        if not block:
                            break
                        conn.sendall(block)
                conn.shutdown(socket.SHUT_WR)
            except OSError:
                pass  # server dropped us; the read side reports it

        sender = threading.Thread(target=upload, daemon=True,
                                  name="nat-client-upload")
        sender.start()
        try:
            buf = b""
            while True:
                got = conn.recv(1 << 16)
                if not got:
                    break
                buf += got
                while True:
                    line, sep, rest = buf.partition(b"\n")
                    if not sep:
                        break
                    buf = rest
                    if line.strip():
                        yield json.loads(line)
            if buf.strip():
                yield json.loads(buf)
        finally:
            sender.join(timeout=5)
            conn.close()

    def stream_file(self, path: str) -> Iterator[dict]:
        with open(path, "rb") as f:
            yield from self.stream(f)

    # ------------------------------------------------------------------
    def tokenize(self, *sources: Union[BytesLike, str]
                 ) -> List[TokenStream]:
        """Tokenize one or more audio payloads (bytes, or str paths) in a
        single connection (FS-multiplexed) and return one parsed
        :class:`TokenStream` per file."""
        if len(sources) == 1 and isinstance(sources[0], (list, tuple)):
            # tokenize(["a.wav", "b.wav"]) is a natural spelling of the
            # varargs API; without this, bytes(list) raises a baffling
            # "'str' object cannot be interpreted as an integer".
            sources = tuple(sources[0])
        if not sources:
            raise ValueError("no sources given")
        payloads = []
        for src in sources:
            if isinstance(src, str):
                with open(src, "rb") as f:
                    payloads.append(f.read())
            else:
                payloads.append(bytes(src))
        events: List[dict] = []
        streams: List[TokenStream] = []
        errors: List[str] = []
        for event in self.stream(FS.join(payloads)):
            if event.get("event") == "error":
                # Keep the daemon's own reason (auth rejection, buffer-cap
                # rejection, decode failure) for the exception below — a
                # bare count hides the actionable message (ADVICE r4).
                errors.append(str(event.get("error", event)))
            events.append(event)
            if event.get("event") == "end":
                streams.append(parse_events(events))
                events = []
        detail = ("; daemon reported: " + " | ".join(errors)
                  if errors else "")
        if events:
            raise ValueError(f"truncated stream: no end event{detail}")
        if len(streams) != len(sources):
            # A multi-file request where the daemon errored partway (e.g.
            # an undecodable middle file) returns fewer complete streams
            # than sources; a silent short list would misalign per-source
            # results for the caller.
            raise ValueError(
                f"daemon returned {len(streams)} complete stream(s) for "
                f"{len(sources)} source(s) (payload rejected or connection "
                f"dropped partway){detail}")
        return streams

    def tokenize_file(self, path: str) -> TokenStream:
        return self.tokenize(path)[0]


def healthcheck(address: str, timeout: float = 5.0) -> bool:
    """True when a daemon is accepting connections at ``address``."""
    client = TokenClient(address, connect_timeout=timeout)
    try:
        conn = client._connect()
    except OSError:
        return False
    try:
        conn.shutdown(socket.SHUT_WR)   # empty payload: server no-ops
        conn.close()
    except OSError:
        pass
    return True


def health(address: str, timeout: float = 5.0) -> dict:
    """Rich daemon status via the in-band ``HEALTH`` probe: uptime, active
    and total connections, batching counters, compat/auth flags.  Raises
    ``OSError`` if the daemon is unreachable, ``ValueError`` on a
    malformed response.  Works without the auth token by design."""
    client = TokenClient(address, connect_timeout=timeout, auth=None)
    conn = client._connect()
    conn.settimeout(timeout)
    try:
        conn.sendall(b"HEALTH\n")
        conn.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            got = conn.recv(1 << 16)
            if not got:
                break
            buf += got
    finally:
        conn.close()
    line = buf.strip().split(b"\n")[0]
    if not line:
        raise ValueError("daemon closed the health probe without a status "
                         "line (pre-health daemon version?)")
    status = json.loads(line)
    if status.get("event") != "health":
        raise ValueError(f"unexpected health response: {status}")
    return status

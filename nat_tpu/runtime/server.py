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
stream; anything else decodes whole-payload (same ladder as the CLI's
``--stream-stdin`` fallback, down to raw-PCM reinterpretation) and then
feeds the SAME span/batch machinery — N buffered-format clients
interleave span-by-span and co-batch through the SpanBatcher just like
streaming clients (only compat-mode serving keeps a coarse whole-file
lock; its tokenizer has no span interface).

No counterpart in the reference (serving is new TPU-framework scope);
the wire protocol matches reference stdin semantics
(neural_audio_tokenizer.py:5195-5222 FS splitting, :5513-5517 raw bytes).
"""

from __future__ import annotations

import hmac
import json
import os
import socket
import threading
import time
from concurrent.futures import Future
from typing import Optional, Tuple, Union

from ..utils.logging import logger

Address = Union[str, Tuple[str, int]]


class SpanBatcher:
    """Cross-session continuous batching: coalesces concurrent connections'
    span dispatches into ONE padded ``[G, bucket]`` forward.

    Without it, N light clients each dispatch ``[1, bucket]`` forwards that
    serialize on the device — dispatch-bound on a tunneled/remote backend.
    The batcher is a single worker thread draining a queue: each drain takes
    every queued request matching the queue head's program key
    ``(sr, bucket, wire dtype, divisor)`` up to ``max_group``, stacks them,
    and runs one batched forward (rows are batch-independent; byte-identity
    with sequential dispatch is test-asserted).  No artificial batching
    window: a lone request dispatches immediately (no added latency), and
    batching happens exactly when there is genuine concurrency or backlog.

    Dispatch and fetch are PIPELINED across two threads: the worker only
    enqueues device forwards (async under JAX), then hands the raw output
    to a finalizer thread that performs the blocking device→host fetch and
    resolves futures.  Batch k+1 is therefore already running on the
    device while batch k's results cross the wire — without this the
    device idles one full fetch round trip per batch, which capped
    round-3 serving aggregate below the single-stream number.  In-flight
    depth is bounded (``_MAX_INFLIGHT``) so a fast drain can't enqueue
    unbounded device work.

    Coalescing: an async worker drains the queue much faster than the
    device computes, which would degrade concurrent load to 1-2-span
    batches (measured 34 spans → 24 dispatches).  So when the device
    pipeline is already deep enough to stay busy (``_busy >=
    _COALESCE_BUSY`` dispatched-but-unfinalized batches), the worker
    holds the queue head back — dispatching it now could not start any
    sooner — until the head's program key can fill a group, a batch in
    flight completes, or a hard cap expires (``NAT_TPU_SERVE_COALESCE_S``,
    default 0.25 s).  With ≤1 batch in flight it dispatches immediately,
    so the device queue never starves and a lone request gains zero
    latency.

    Requires argmin (non-stochastic) quantization — grouping reassigns the
    per-span RNG stream, which argmin ignores.
    """

    _MAX_INFLIGHT = 3
    _COALESCE_BUSY = 2

    def __init__(self, tokenizer, max_group: Optional[int] = None,
                 autostart: bool = True, mesh=None) -> None:
        import queue as _queue

        self.tok = tokenizer
        self.mesh = mesh
        if max_group is None:
            max_group = tokenizer._stream_group_size()
            if mesh is not None:
                # Multi-chip serving: a full group per chip keeps every
                # dp shard as busy as single-chip batching would.
                max_group *= mesh.shape["dp"]
        self.max_group = max(1, int(max_group))
        self._mesh_state = None   # mesh-replicated (params, sem, acc)
        self._cv = threading.Condition()
        self._queue: list = []  # (key, prepared, meta, divisor, want_f, fut)
        self._closed = False
        self._busy = 0          # batches dispatched but not yet finalized
        self._coalesce_s = float(
            os.environ.get("NAT_TPU_SERVE_COALESCE_S", "0.25"))
        self.stats = {"spans": 0, "dispatches": 0}
        self._inflight: "_queue.Queue" = _queue.Queue(
            maxsize=self._MAX_INFLIGHT)
        self._worker: Optional[threading.Thread] = None
        self._finalizer: Optional[threading.Thread] = None
        if autostart:
            self._worker = threading.Thread(
                target=self._run, name="nat-span-batcher", daemon=True)
            self._worker.start()
            self._finalizer = threading.Thread(
                target=self._run_finalizer, name="nat-span-finalizer",
                daemon=True)
            self._finalizer.start()

    # -- session-facing API (signature-compatible with tokenize_span) -----
    def submit_span(self, chunk, ext_start, start, length, overlap, sr,
                    want_features: bool = False, pcm_divisor=None) -> Future:
        prepared, meta = self.tok.prepare_span(chunk, ext_start, start,
                                               length, overlap, sr)
        key = (sr, meta.bucket, str(prepared.dtype),
               None if pcm_divisor is None else float(pcm_divisor),
               bool(want_features))
        fut: Future = Future()
        with self._cv:
            if self._closed:
                raise RuntimeError("SpanBatcher is closed")
            self._queue.append((key, prepared, meta, pcm_divisor,
                                want_features, fut))
            self.stats["spans"] += 1
            self._cv.notify()
        return fut

    def tokenize_span(self, chunk, ext_start, start, length, overlap, sr,
                      want_features: bool = False, pcm_divisor=None):
        return self.submit_span(chunk, ext_start, start, length, overlap,
                                sr, want_features=want_features,
                                pcm_divisor=pcm_divisor).result()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=30)
        if self._finalizer is not None:
            self._finalizer.join(timeout=30)

    def _mesh_args(self):
        """Mesh-replicated model state (one device_put per server lifetime):
        params committed to a single device cannot feed a dp-sharded batch."""
        if self.mesh is None:
            return None
        if self._mesh_state is None:
            import jax

            from ..parallel.mesh import replicated

            rep = replicated(self.mesh)
            self._mesh_state = tuple(
                jax.device_put(x, rep)
                for x in (self.tok.params, self.tok.sem_rvq,
                          self.tok.acc_rvq))
        return self._mesh_state

    # -- worker / finalizer (pipelined) -------------------------------------
    def _next_batch(self) -> Optional[list]:
        """Pop the next same-key batch (blocking); None when closed and
        drained."""
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return None
            # Coalescing hold-back (zero added latency — see class doc):
            # only the worker pops, so the queue can only grow here.
            deadline = None
            while (not self._closed and self._busy >= self._COALESCE_BUSY
                   and self._same_key_count() < self.max_group):
                now = time.monotonic()
                if deadline is None:
                    deadline = now + self._coalesce_s
                if now >= deadline:
                    break
                self._cv.wait(timeout=deadline - now)
            key = self._queue[0][0]
            batch, rest = [], []
            for item in self._queue:
                if item[0] == key and len(batch) < self.max_group:
                    batch.append(item)
                else:
                    rest.append(item)
            self._queue = rest
            return batch

    def _same_key_count(self) -> int:
        """Queued items sharing the head's program key (caller holds _cv)."""
        key = self._queue[0][0]
        return sum(1 for item in self._queue if item[0] == key)

    def _run(self) -> None:
        """Dispatch loop: enqueue device forwards only (async under JAX);
        the blocking fetch happens on the finalizer thread so batch k+1
        dispatches while batch k's results stream back."""
        while True:
            batch = self._next_batch()
            if batch is None:
                break
            try:
                chunks = [item[1] for item in batch]
                metas = [item[2] for item in batch]
                out, metas = self.tok.dispatch_prepared_group(
                    chunks, metas, self.max_group, pcm_divisor=batch[0][3],
                    mesh=self.mesh, state_override=self._mesh_args())
                self.stats["dispatches"] += 1
                if hasattr(self.tok, "_prefetch_outputs"):
                    # Host copies start behind the compute, so the
                    # finalizer's device_get finds data already in flight.
                    self.tok._prefetch_outputs(out, batch[0][4])
                handoff = ("ok", out, metas, batch)
            except Exception as exc:
                handoff = ("dispatch_error", exc, None, batch)
            with self._cv:
                self._busy += 1
            self._inflight.put(handoff)
        self._inflight.put(None)  # finalizer shutdown sentinel

    def _run_finalizer(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                break
            tag, out, metas, batch = item
            try:
                if tag == "dispatch_error":
                    self._retry_or_fail(batch, out)
                    continue
                try:
                    results = list(self.tok.finalize_span_group(
                        out, metas, want_features=batch[0][4]))
                    for it, res in zip(batch, results):
                        it[5].set_result(res)
                except Exception as exc:
                    self._retry_or_fail(batch, exc)
            finally:
                with self._cv:
                    self._busy -= 1
                    self._cv.notify_all()  # wakes a coalescing worker

    def _retry_or_fail(self, batch: list, exc: Exception) -> None:
        """Don't let one poisoned request fail innocent co-batched
        connections: retry each item alone (synchronously), so only the
        actual offender surfaces the error."""
        if len(batch) > 1:
            logger.warn(f"batched dispatch failed "
                        f"({type(exc).__name__}: {exc}); retrying "
                        f"{len(batch)} spans individually")
            for item in batch:
                self._dispatch_batch([item])
            return
        for item in batch:
            if not item[5].done():
                item[5].set_exception(exc)

    def _drain_once(self) -> bool:
        """Synchronous dispatch+finalize of one batch (blocking until work
        or close).  Returns False when closed and drained.  The
        deterministic single-threaded path (tests, autostart=False)."""
        batch = self._next_batch()
        if batch is None:
            return False
        self._dispatch_batch(batch)
        return True

    def _dispatch_batch(self, batch: list) -> None:
        futs = [item[5] for item in batch]
        try:
            chunks = [item[1] for item in batch]
            metas = [item[2] for item in batch]
            out, metas = self.tok.dispatch_prepared_group(
                chunks, metas, self.max_group, pcm_divisor=batch[0][3],
                mesh=self.mesh, state_override=self._mesh_args())
            results = list(self.tok.finalize_span_group(
                out, metas, want_features=batch[0][4]))
            self.stats["dispatches"] += 1
            for fut, res in zip(futs, results):
                fut.set_result(res)
        except Exception as exc:
            self._retry_or_fail(batch, exc)


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
                 max_connections: Optional[int] = None, mesh=None) -> None:
        self.pipeline = pipeline
        self.family, self.addr = parse_address(address)
        if max_connections is None:
            max_connections = int(
                os.environ.get("NAT_TPU_SERVE_MAX_CONNS", "32"))
        self.max_connections = max(1, max_connections)
        self._slots = threading.Semaphore(self.max_connections)
        self._closed = threading.Event()
        self._conn_seq = 0
        self._active = 0
        self._active_cv = threading.Condition()
        self._started = time.monotonic()

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
        # Compat-mode buffered requests serialize whole-file (the compat
        # tokenizer has no span interface); neural buffered requests go
        # through stream_audio_array → span/batch machinery and never
        # take this lock.
        self._buffered_lock = threading.Lock()
        # Cross-session span batching (see SpanBatcher).  Active whenever
        # the tokenizer groups spans (accelerators: group 8; CPU: only with
        # NAT_TPU_STREAM_GROUP>1) and quantization is argmin;
        # NAT_TPU_SERVE_BATCH=0 force-disables.
        # Multi-chip serving: NAT_TPU_SERVE_DP=N (or an explicit mesh)
        # shards batched groups over a ("dp", "tp") mesh — concurrent
        # clients' spans spread across chips via one sharded forward.
        if mesh is None:
            dp_env = int(os.environ.get("NAT_TPU_SERVE_DP", "0"))
            if dp_env > 1:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh((dp_env, 1))
        self.mesh = mesh
        self._batcher: Optional[SpanBatcher] = None
        if (os.environ.get("NAT_TPU_SERVE_BATCH") != "0"
                and hasattr(tok, "dispatch_prepared_group")
                and not getattr(tok, "stochastic", False)
                and (tok._stream_group_size() > 1 or mesh is not None)):
            self._batcher = SpanBatcher(tok, mesh=mesh)
            logger.info(
                f"Cross-session span batching on "
                f"(max_group={self._batcher.max_group}"
                + (f", dp={mesh.shape['dp']}" if mesh is not None else "")
                + ")")
        # Pre-compile the forward programs a long-stream client will need
        # (the 30 s bucket at [1] and [G] rows) while the daemon is idle,
        # instead of on the first client's back.  "auto" = accelerators
        # only (CPU compiles are slow and tests drive exact shapes);
        # NAT_TPU_SERVE_PREWARM=1/0 forces.
        prewarm = os.environ.get("NAT_TPU_SERVE_PREWARM", "auto")
        if prewarm != "0" and hasattr(tok, "_forward_for"):
            on_accel = False
            if prewarm in ("1", "true"):
                on_accel = True
            elif prewarm == "auto":
                try:
                    import jax

                    on_accel = any(d.platform != "cpu"
                                   for d in jax.devices())
                except Exception:
                    on_accel = False
            if on_accel:
                threading.Thread(target=self._prewarm, daemon=True,
                                 name="nat-serve-prewarm").start()

    # ------------------------------------------------------------------
    def _prewarm(self) -> None:
        """Compile the streaming forward programs for the configured sample
        rate's largest (30 s) bucket at [1] and [max_group] rows — the
        shapes every long-stream connection needs (shared implementation:
        runtime/prewarm.py, also behind ``nat --prewarm``).  Best-effort:
        any failure just means the first client pays the compile instead."""
        try:
            from .bucketing import FIRST_SPAN_S, ramp_enabled
            from .prewarm import prewarm_forwards

            rows = {1}
            if self._batcher is not None:
                rows.add(self._batcher.max_group)
            done = prewarm_forwards(self.pipeline.tokenizer,
                                    self.pipeline.sample_rate, rows=rows)
            if self._batcher is not None and ramp_enabled():
                # Concurrent clients' ramp spans co-batch into a
                # [max_group, ramp-bucket] forward no single stream ever
                # compiles — warm it so the first burst doesn't.
                done += prewarm_forwards(
                    self.pipeline.tokenizer, self.pipeline.sample_rate,
                    seconds=[FIRST_SPAN_S],
                    rows=[self._batcher.max_group])
            logger.info(f"Prewarmed {len(done)} forward program(s)")
        except Exception as exc:
            logger.debug(f"Prewarm skipped: {type(exc).__name__}: {exc}")

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
            if self.family == "tcp":
                # NDJSON lines are small; Nagle would add up to ~40 ms of
                # coalescing latency per frame line.
                try:
                    conn.setsockopt(socket.IPPROTO_TCP,
                                    socket.TCP_NODELAY, 1)
                except OSError:
                    pass
            # Timed acquire: with every slot busy, a bare acquire() would
            # park this thread holding the accepted socket — SIGTERM's
            # stop_accepting() could then never end serve_forever (shutdown
            # hang), and the eventually-freed slot would serve NEW work
            # accepted before (or despite) the shutdown request.
            while not self._closed.is_set():
                if self._slots.acquire(timeout=0.25):
                    break
            if self._closed.is_set():
                try:
                    conn.close()
                except OSError:
                    pass
                break
            self._conn_seq += 1
            with self._active_cv:
                self._active += 1
            t = threading.Thread(
                target=self._handle, args=(conn, self._conn_seq),
                name=f"nat-serve-{self._conn_seq}", daemon=True)
            t.start()
        logger.info("Server stopped")

    def stop_accepting(self) -> None:
        """Close the listener (in-flight connections keep running).
        ``shutdown`` first: closing alone does not interrupt a thread
        blocked in ``accept`` (the kernel keeps queueing the backlog)."""
        self._closed.set()
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass

    def drain(self, timeout: float = 30.0) -> bool:
        """Wait for in-flight connections to finish (graceful shutdown);
        True when the server went quiet within ``timeout``."""
        with self._active_cv:
            return self._active_cv.wait_for(lambda: self._active == 0,
                                            timeout)

    def close(self) -> None:
        self.stop_accepting()
        if self._batcher is not None:
            self._batcher.close()
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
            # Opt-in idle timeout: a producer that stops sending (and a
            # consumer that stops reading) for this long gets its
            # connection dropped rather than holding a slot forever.
            idle_s = float(os.environ.get("NAT_TPU_SERVE_IDLE_S", "0"))
            if idle_s > 0:
                conn.settimeout(idle_s)
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
        except TimeoutError:
            logger.warn(f"conn#{cid}: idle past NAT_TPU_SERVE_IDLE_S; "
                        "dropping connection")
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
            with self._active_cv:
                self._active -= 1
                self._active_cv.notify_all()

    def _health_status(self) -> dict:
        """Operational status for the ``HEALTH`` in-band probe (one NDJSON
        line; contains no payload data, so it is served unauthenticated)."""
        from ..version import VERSION

        status = {
            "event": "health",
            "status": "ok",
            "version": VERSION,
            "uptime_s": round(time.monotonic() - self._started, 3),
            # This probe's own connection holds a slot; report the others.
            "active_connections": max(0, self._active - 1),
            "connections_total": self._conn_seq,
            "max_connections": self.max_connections,
            "compat_mode": bool(getattr(self.pipeline, "compat_mode",
                                        False)),
            "auth_required": bool(os.environ.get("NAT_TPU_SERVE_AUTH")),
        }
        if self._batcher is not None:
            status["batching"] = dict(self._batcher.stats,
                                      max_group=self._batcher.max_group)
        if self.mesh is not None:
            status["mesh"] = dict(self.mesh.shape)
        return status

    @staticmethod
    def _split_line(head: bytes, rfile, max_line: int = 4096
                    ) -> Tuple[bytes, bytes]:
        """First line (sans newline) of ``head`` + the remainder, reading
        more from ``rfile`` if the sniffed block ended mid-line.  Bounded:
        a binary payload with no early newline (an unauthenticated client
        sending raw audio) must not make the server buffer it all hunting
        for one — past ``max_line`` bytes the whole head is "the line"
        (which can never equal a valid AUTH line)."""
        from ..io.stream_reader import _read_block

        while b"\n" not in head and len(head) < max_line:
            # First-available-block read (not a greedy .read(4096), which
            # on a buffered socket file blocks until 4 KB accumulate — a
            # trickling unauthenticated source would hold the connection
            # slot until then; ADVICE r4).
            more = _read_block(rfile, 1 << 12)
            if not more:
                return head, b""
            head += more
        if b"\n" not in head:
            return head, b""
        line, _, rest = head.partition(b"\n")
        return line, rest

    def _serve_stream(self, rfile, write, cid: int) -> None:
        """One connection = one stdin-daemon session: sniff, answer health
        probes, enforce opt-in auth, then stream incrementally or fall
        back to buffered tokenization."""
        from ..io.stream_reader import (PrefixedStream, make_stream_reader,
                                        read_sniff)

        # First-available-block sniff (not a greedy 64 KB read): a live
        # client's first frames shouldn't wait on buffer-filling.
        head = read_sniff(rfile)
        if not head:
            logger.debug(f"conn#{cid}: empty payload")
            return
        # In-band health probe: HEALTH (+optional newline) -> one status
        # line.  No audio container starts with these bytes, and the probe
        # must work without the auth token (monitoring shouldn't hold
        # tokenization credentials).
        if head.startswith(b"HEALTH"):
            write(json.dumps(self._health_status()))
            return
        expected = os.environ.get("NAT_TPU_SERVE_AUTH", "")
        consumed_auth = False
        if expected:
            line, head = self._split_line(head, rfile)
            if not hmac.compare_digest(line, b"AUTH " + expected.encode()):
                logger.warn(f"conn#{cid}: rejected (bad or missing auth)")
                write(json.dumps({
                    "event": "error",
                    "error": "authentication required: send "
                             "'AUTH <token>\\n' before the audio payload"}))
                return
            consumed_auth = True
        elif head.startswith(b"AUTH "):
            # Auth is disabled but the client sent a token anyway (e.g. a
            # TokenClient whose environment sets NAT_TPU_SERVE_AUTH while
            # the daemon's doesn't).  No audio container begins with these
            # five bytes, so strip the line rather than feeding it into
            # container sniffing as payload — where it would break decode
            # or be reinterpreted as raw PCM (ADVICE r4, medium).
            _, head = self._split_line(head, rfile)
            consumed_auth = True
        if consumed_auth:
            # The AUTH line may have eaten most of the sniffed block: top
            # the remainder back up to the sniff minimum so streamable
            # containers don't silently degrade to the buffered path
            # (ADVICE r4).  read_sniff replays ``head`` first, then reads
            # only if it is still short.
            if len(head.lstrip(b"\x1c")) < 64:
                head = read_sniff(PrefixedStream(head, rfile))
            if not head:
                logger.debug(f"conn#{cid}: empty payload after auth")
                return
            if head.startswith(b"HEALTH"):
                write(json.dumps(self._health_status()))
                return
        session = self.pipeline.session()
        session.span_executor = self._batcher
        if (make_stream_reader(head.lstrip(b"\x1c")) is not None
                and hasattr(session.tokenizer, "tokenize_span")):
            session.stream_stdin(PrefixedStream(head, rfile), write)
            return
        logger.debug(f"conn#{cid}: not incrementally decodable; buffering")
        # Backpressure: buffered (non-incremental) payloads materialize in
        # host RAM before decode; cap them so one client can't OOM the
        # daemon.  Streaming formats are exempt — they process span-by-span
        # with the socket buffer as natural backpressure.
        max_mb = float(os.environ.get("NAT_TPU_SERVE_MAX_BUFFER_MB", "256"))
        cap = int(max_mb * 1_000_000)
        payload = bytearray(head)
        while len(payload) <= cap:
            block = rfile.read(min(1 << 20, cap - len(payload) + 1))
            if not block:
                break
            payload += block
        if len(payload) > cap:
            logger.warn(f"conn#{cid}: buffered payload exceeds "
                        f"{max_mb:g} MB cap; rejecting")
            write(json.dumps({
                "event": "error",
                "error": f"buffered payload exceeds the "
                         f"{max_mb:g} MB server cap "
                         f"(NAT_TPU_SERVE_MAX_BUFFER_MB); send an "
                         f"incrementally decodable container (WAV/AIFF/"
                         f"AU/FLAC/MP3/OGG) to stream without buffering"}))
            return
        self._serve_buffered(session, bytes(payload), write)

    def _serve_buffered(self, session, payload: bytes, write) -> None:
        from ..io.stdinio import (chunks_to_temp_files, cleanup_temp_files,
                                  split_fs_chunks)

        chunks = split_fs_chunks(payload)
        if not chunks:
            raise ValueError("empty stream: no audio before EOF")
        temp_files = chunks_to_temp_files(chunks)
        try:
            if hasattr(session.tokenizer, "tokenize_span"):
                # Neural path: decode whole-file, then feed the same
                # span/batch machinery streaming connections use — N
                # buffered-format clients (M4A, raw PCM, ...) interleave
                # span-by-span and co-batch through the SpanBatcher
                # instead of serializing whole-file under a coarse lock.
                for idx, path in enumerate(temp_files):
                    # _load_audio_ex output is already peak-normalized and
                    # carries the int16 sidecar hint — normalize=False keeps
                    # the served bytes identical to the CLI --stdin path
                    # (a second normalize bitwise-changes quiet audio) and
                    # the hint skips the full PCM16 recovery scan.
                    audio, sr, hint = session._load_audio_ex(path)
                    session.stream_audio_array(
                        audio, sr, write,
                        label="<payload>" if len(temp_files) == 1
                        else f"<payload#{idx}>",
                        pcm16_hint=hint, normalize=False)
                return
            # Compat tokenizer: host-side single-shot, no span interface;
            # whole-file processing stays under the coarse lock.
            with self._buffered_lock:
                for path in temp_files:
                    result = session.process_audio(
                        path, ndjson_streaming=True, want_features=False)
                    for line in result["ndjson_output"].splitlines():
                        write(line)
        finally:
            cleanup_temp_files(temp_files)


def run_server(pipeline, address: str) -> int:
    """CLI entry: serve until SIGINT/SIGTERM, then drain gracefully —
    stop accepting, let in-flight connections finish (bounded by
    ``NAT_TPU_SERVE_DRAIN_S``, default 30; 0 = immediate), close."""
    import signal

    server = TokenServer(pipeline, address)
    stop = lambda *_sig: server.stop_accepting()  # noqa: E731
    signal.signal(signal.SIGINT, stop)
    signal.signal(signal.SIGTERM, stop)
    try:
        server.serve_forever()
        drain_s = float(os.environ.get("NAT_TPU_SERVE_DRAIN_S", "30"))
        if drain_s > 0 and not server.drain(drain_s):
            logger.warn(f"Shutdown: connections still active after "
                        f"{drain_s:.0f}s drain; closing anyway")
    finally:
        server.close()
    return 0

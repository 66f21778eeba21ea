"""Shared machinery for the live TCP ingestion adapters (S1 bgplive /
S2 bmplive): a thread-per-connection accept loop, a PeerUp/OPEN-order
session registry, and atomic UPDATES_SCHEMA parquet micro-batch output
consumed by ``feed.stream_updates_from_files`` with zero engine changes.

The listeners are intentionally NOT Spark jobs: a monitoring station
serves a handful of router sessions (thread-per-connection is the right
scale) and its only output is files. Everything downstream — streaming
RIB materialization, windowed rates, WebSocket fan-out, analytic views —
is the existing engine. Protocol specifics (framing, handshake, decode)
live in the subclasses' ``_consume`` hook.
"""

from __future__ import annotations

import os
import socket
import threading
import time
import uuid

from bgpexplorer_spark.schemas import UPDATES_SCHEMA

_UPDATE_COLS = [f.name for f in UPDATES_SCHEMA.fields]


def _arrow_schema():
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(UPDATES_SCHEMA)


class _SessionRegistry:
    """(peer_addr, peer_as) → dense session_id, first-seen order
    (src/bgpsvc.rs:135-162 analog). Thread-safe; shared across
    connections so a router reconnect keeps its id."""

    def __init__(self) -> None:
        self._ids: dict[tuple[str, int], int] = {}
        self._lock = threading.Lock()

    def get(self, peer_addr: str, peer_as: int) -> int:
        key = (peer_addr, peer_as)
        with self._lock:
            sid = self._ids.get(key)
            if sid is None:
                sid = len(self._ids)
                self._ids[key] = sid
            return sid

    def snapshot(self) -> list[tuple[int, str, int]]:
        with self._lock:
            return [(sid, a, asn) for (a, asn), sid in self._ids.items()]


class LiveListenerBase:
    """Accept protocol sessions on a TCP socket and materialize decoded
    updates as UPDATES_SCHEMA parquet micro-batch files in ``out_dir``
    (tmp+rename — Spark's file sources never observe a partial file).

    Subclasses implement ``_consume(conn, buf, rows, raw) -> tail``:
    split complete frames off ``buf``, append decoded UPDATES_SCHEMA row
    dicts to ``rows`` (and raw archival bytes to ``raw``), reply on
    ``conn`` as the protocol requires, and return the unconsumed tail.
    """

    def __init__(
        self,
        out_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        raw_dir: str | None = None,
        flush_rows: int = 256,
        flush_secs: float = 1.0,
    ) -> None:
        self.out_dir = out_dir
        self.raw_dir = raw_dir
        self.host = host
        self.port = port
        self.flush_rows = flush_rows
        self.flush_secs = flush_secs
        self.registry = _SessionRegistry()
        self._srv: socket.socket | None = None
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self._schema = _arrow_schema()
        os.makedirs(out_dir, exist_ok=True)
        if raw_dir:
            os.makedirs(raw_dir, exist_ok=True)

    # -- lifecycle -----------------------------------------------------

    def start(self) -> tuple[str, int]:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(8)
        srv.settimeout(0.2)
        self._srv = srv
        self.host, self.port = srv.getsockname()
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self.host, self.port

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        if self._srv is not None:
            self._srv.close()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- internals -----------------------------------------------------

    def _accept_loop(self) -> None:
        assert self._srv is not None
        while not self._stop.is_set():
            try:
                conn, _addr = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        buf = b""
        rows: list[dict] = []
        raw: list[bytes] = []
        last_flush = time.monotonic()
        try:
            while not self._stop.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    chunk = None
                except OSError:
                    break
                if chunk == b"":  # orderly shutdown from the router
                    break
                if chunk:
                    buf = self._consume(conn, buf + chunk, rows, raw)
                due = (
                    len(rows) >= self.flush_rows
                    or (rows or raw)
                    and time.monotonic() - last_flush >= self.flush_secs
                )
                if due:
                    self._flush(rows, raw)
                    rows, raw = [], []
                    last_flush = time.monotonic()
                if not self._tick(conn):
                    break  # protocol timer expired — tear the session down
        finally:
            self._flush(rows, raw)
            conn.close()

    def _tick(self, conn) -> bool:
        """Per-loop protocol timer hook (the recv timeout bounds its
        latency to ~0.2 s). Return False to tear the connection down.
        The BGP listener overrides this with RFC 4271 keepalive
        scheduling + hold-timer expiry; BMP has no such timers."""
        return True

    def _consume(self, conn, buf: bytes, rows: list[dict], raw: list[bytes]) -> bytes:
        raise NotImplementedError

    def _flush(self, rows: list[dict], raw: list[bytes]) -> None:
        if rows:
            self._write_parquet(rows)
        if raw and self.raw_dir:
            name = f"capture-{uuid.uuid4().hex}.bin"
            tmp = os.path.join(self.raw_dir, "." + name + ".tmp")
            with open(tmp, "wb") as f:
                f.write(b"".join(raw))
            os.rename(tmp, os.path.join(self.raw_dir, name))

    def _write_parquet(self, rows: list[dict]) -> None:
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        utc = dt.timezone.utc
        recs = []
        for r in rows:
            rec = {c: r.get(c) for c in _UPDATE_COLS}
            ts = rec["ts"]
            if ts is not None and ts.tzinfo is None:
                # decoders emit naive UTC; the arrow field is tz-aware
                rec["ts"] = ts.replace(tzinfo=utc)
            recs.append(rec)
        table = pa.Table.from_pylist(recs, schema=self._schema)
        name = f"part-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.out_dir, "." + name + ".tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.out_dir, name))

    # -- convenience ---------------------------------------------------

    def sessions_df(self, spark):
        """Registry snapshot as the SESSIONS_SCHEMA dimension (J4 input)."""
        from bgpexplorer_spark.schemas import SESSIONS_SCHEMA

        data = [
            (sid, addr, asn, None, None) for sid, addr, asn in self.registry.snapshot()
        ]
        return spark.createDataFrame(data, SESSIONS_SCHEMA)


class DialOutMixin:
    """Active-mode (dial-out) variant of a live adapter: instead of
    accepting connections, connect TO the configured peer, run the
    protocol greeting (``_greet``), then drive the SAME per-connection
    serve loop the passive listener uses; on session loss, reconnect
    with exponential backoff (reference: src/bgpsvc.rs:320-410
    run_peer_active + the auto-respawn loop in run()). Mix in front of a
    listener class: ``class BgpConnector(DialOutMixin, BgpListener)``."""

    def __init__(
        self,
        out_dir: str,
        peer_host: str,
        peer_port: int,
        reconnect: bool = True,
        backoff_initial: float = 0.5,
        backoff_max: float = 30.0,
        connect_timeout: float = 5.0,
        **kw,
    ) -> None:
        super().__init__(out_dir, **kw)
        self.peer_host = peer_host
        self.peer_port = peer_port
        self.reconnect = reconnect
        self.backoff_initial = backoff_initial
        self.backoff_max = backoff_max
        self.connect_timeout = connect_timeout

    def start(self) -> tuple[str, int]:
        t = threading.Thread(target=self._dial_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self.peer_host, self.peer_port

    def _greet(self, conn: socket.socket) -> None:
        """Protocol-specific first move after connect (e.g. BGP sends
        OPEN first in active mode, src/bgppeer.rs:102-165; BMP stations
        just listen). Also the hook to reset per-session state — the
        dial thread is reused across reconnects."""

    def _dial_loop(self) -> None:
        delay = self.backoff_initial
        while not self._stop.is_set():
            try:
                conn = socket.create_connection(
                    (self.peer_host, self.peer_port), timeout=self.connect_timeout
                )
            except OSError:
                if not self.reconnect:
                    return
                self._stop.wait(delay)
                delay = min(delay * 2, self.backoff_max)
                continue
            delay = self.backoff_initial
            try:
                self._greet(conn)
            except OSError:
                conn.close()
            else:
                self._serve(conn)  # returns when the session ends
            if not self.reconnect:
                return
            self._stop.wait(delay)
            delay = min(delay * 2, self.backoff_max)


def send_frames(
    host: str, port: int, frames: list[bytes], chunk: int = 0
) -> None:
    """Test/ops helper: open a session and send frames. ``chunk`` > 0
    fragments the byte stream at arbitrary boundaries to exercise the
    incremental reassembly path."""
    data = b"".join(frames)
    with socket.create_connection((host, port)) as s:
        if chunk <= 0:
            s.sendall(data)
        else:
            for i in range(0, len(data), chunk):
                s.sendall(data[i : i + chunk])
                time.sleep(0.01)

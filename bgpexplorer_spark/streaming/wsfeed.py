"""WebSocket live-feed endpoint (SURVEY.md §2.1 S7, §2.7 ST1/ST2).

The reference upgrades ``GET /api/ws`` (src/main.rs:103-157), then runs a
per-client loop over a lossy broadcast channel
(src/subscriber.rs:58-137): the client sends
``{"Subscribe": {"rib": ..., "filter": ...}}``; the server pushes
``{"sessionid", "attrs", "addrs"}`` update / ``{"sessionid", "addrs"}``
withdraw JSON for events whose rib matches. Ping → Pong; the parsed
filter is stored but NEVER applied (rib-gate only).

Here the same protocol runs over the stdlib HTTP server — the RFC 6455
handshake and framing are ~80 lines, no dependency. Event delivery is
Spark-first: ``LiveFeed.publish_batch`` gates each micro-batch per
subscriber with the SAME compiled 3VL filter Column the batch path uses
(one vectorized filter per subscriber per batch, not per event), so
honoring the subscriber filter — the documented superset of the
reference's store-but-ignore behavior — costs one extra predicate in the
micro-batch plan.
"""

from __future__ import annotations

import base64
import hashlib
import json
import queue
import struct
import threading

from pyspark.sql import DataFrame

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

# --- broadcast feed ---------------------------------------------------------


class Subscriber:
    """One client's slot on the feed: a bounded lossy queue (the
    reference's broadcast capacity is 2, src/bgprib.rs:839 — lossy by
    design; slow consumers drop oldest) + its current subscription."""

    def __init__(self, capacity: int = 64):
        self.q: queue.Queue = queue.Queue(maxsize=capacity)
        self.rib = "ipv4u"  # reference default (src/subscriber.rs:62)
        self.filter_str = ""
        self.apply_filter = False

    def offer(self, item: str) -> None:
        while True:
            try:
                self.q.put_nowait(item)
                return
            except queue.Full:
                try:
                    self.q.get_nowait()  # drop oldest (lossy channel)
                except queue.Empty:
                    pass


class LiveFeed:
    """In-process broadcast hub bridging Spark micro-batches to WebSocket
    clients (the analog of the reference's tokio broadcast channel).

    ``max_rows_per_batch`` bounds what one subscriber can pull through
    the driver per micro-batch: the feed is lossy by design (the
    reference's channel capacity is 2), so a 0.0.0.0/0-subscribed client
    must not be able to materialize a full-table batch driver-side — it
    gets at most the cap, newest-first by event time."""

    def __init__(self, max_rows_per_batch: int = 1024):
        self._subs: list[Subscriber] = []
        self._lock = threading.Lock()
        self.max_rows_per_batch = max_rows_per_batch

    def register(self, sub: Subscriber) -> None:
        with self._lock:
            self._subs.append(sub)

    def unregister(self, sub: Subscriber) -> None:
        with self._lock:
            if sub in self._subs:
                self._subs.remove(sub)

    def publish_batch(self, updates: DataFrame) -> int:
        """Fan one micro-batch out to every subscriber, applying the rib
        gate (reference behavior) and — when the subscriber asked for it —
        the compiled filter Column (superset). Runs ONE Spark filter per
        subscriber per batch; event JSON is rendered once per matching
        row. Per-subscriber rows are capped at ``max_rows_per_batch``
        (newest events win — the queue would drop the oldest anyway), so
        the driver-side materialization is bounded no matter how broad
        the subscription."""
        from pyspark.sql import functions as F

        from bgpexplorer_spark.streaming.feed import subscribe

        with self._lock:
            subs = list(self._subs)
        delivered = 0
        for sub in subs:
            gated = subscribe(
                updates, sub.rib, sub.filter_str, apply_filter=sub.apply_filter
            )
            cap = self.max_rows_per_batch
            # TakeOrdered (top-k), not sort+limit: bounded per partition
            rows = gated.orderBy(F.col("ts").desc()).limit(cap).collect()
            for row in reversed(rows):  # deliver oldest-first of the kept
                sub.offer(event_json(row.asDict(recursive=True)))
                delivered += 1
        return delivered

    def publish_rows(self, rows: list[dict]) -> None:
        """Driver-side event injection (tests, single-event paths):
        rib-gate only, like the reference."""
        with self._lock:
            subs = list(self._subs)
        for sub in subs:
            for r in rows:
                if r.get("rib") == sub.rib:
                    sub.offer(event_json(r))


def event_json(row: dict) -> str:
    """Serialize one updates-row as the reference's event JSON
    (src/subscriber.rs:23-57): updates carry attrs, withdraws don't."""
    from bgpexplorer_spark.operators.ingest import ATTR_COLS

    addrs = {"rib": row.get("rib"), "nlri": row.get("nlri_str")}
    out = {"sessionid": row.get("session_id"), "addrs": addrs}
    if row.get("op") == "update":
        out["attrs"] = {
            k: row.get(k) for k in ATTR_COLS if row.get(k) is not None
        }
    return json.dumps(out, default=str, sort_keys=True)


# --- RFC 6455 plumbing ------------------------------------------------------


def ws_accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def write_frame(sock, payload: bytes, opcode: int = 0x1) -> None:
    """Server→client frame (unmasked)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 65536:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    sock.sendall(head + payload)


def read_frame(sock) -> tuple[int, bytes] | None:
    """Client→server frame; returns (opcode, unmasked payload) or None on
    EOF."""

    def exact(k: int) -> bytes | None:
        buf = b""
        while len(buf) < k:
            chunk = sock.recv(k - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    h = exact(2)
    if h is None:
        return None
    opcode = h[0] & 0x0F
    masked = h[1] & 0x80
    n = h[1] & 0x7F
    if n == 126:
        ext = exact(2)
        if ext is None:
            return None
        n = struct.unpack(">H", ext)[0]
    elif n == 127:
        ext = exact(8)
        if ext is None:
            return None
        n = struct.unpack(">Q", ext)[0]
    mask = exact(4) if masked else b"\x00" * 4
    if mask is None:
        return None
    data = exact(n) if n else b""
    if data is None:
        return None
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, data


def on_ws_client(sock, feed: LiveFeed, apply_filter: bool = False) -> None:
    """The per-client loop (src/subscriber.rs:58-137): select between the
    feed queue (push events) and client frames (Subscribe / Ping /
    Close). Runs until the client closes. ``apply_filter=True`` enables
    the superset mode where publish_batch honors the subscriber's filter."""
    sub = Subscriber()
    sub.apply_filter = apply_filter
    feed.register(sub)
    sock.settimeout(0.1)
    try:
        while True:
            # drain pending events first
            try:
                while True:
                    write_frame(sock, sub.q.get_nowait().encode(), 0x1)
            except queue.Empty:
                pass
            try:
                fr = read_frame(sock)
            except TimeoutError:
                continue
            except OSError:
                break
            if fr is None:
                break
            opcode, data = fr
            if opcode == 0x8:  # close
                write_frame(sock, b"", 0x8)
                break
            if opcode == 0x9:  # ping → pong with same payload
                write_frame(sock, data, 0xA)
                continue
            if opcode in (0x1, 0x2):
                try:
                    cmd = json.loads(data.decode())
                except ValueError:
                    continue  # reference logs and continues
                body = cmd.get("Subscribe")
                if isinstance(body, dict):
                    from bgpexplorer_spark.schemas import RIB_NAMES

                    rib = body.get("rib", "")
                    if rib in RIB_NAMES:  # unparseable rib keeps previous
                        sub.rib = rib
                    sub.filter_str = body.get("filter", "")
    finally:
        feed.unregister(sub)

"""BMP (RFC 7854) dump decoder → UPDATES_SCHEMA rows (SURVEY.md §2.1 S2).

The reference speaks live BMP over TCP (src/bmppeer.rs:65-131: 5-byte
common-header framing, PeerUp session registration, Route Monitoring
messages carrying full BGP UPDATEs). The same frames, captured to a file
(the usual debugging/archival form), decode here as a batch source: the
framing walk and per-peer header parse are pure Python, the BGP UPDATE
payload reuses the MRT module's attribute/NLRI walk
(sources/mrt.py::parse_bgp_update), and Spark distributes whole files via
``binaryFile`` + ``mapInPandas`` exactly like read_mrt.

Handled message types: Route Monitoring (0) → update/withdraw rows;
Peer Up (3) → session registration (the analog of src/bmppeer.rs:45-59
processmsg PeerUp); Peer Down (2) + Peer Up → lifecycle events and
session intervals (``read_bmp_peer_events`` / ``peer_session_intervals``);
Stats Report (1) → per-peer counter rows (``read_bmp_stats``).
Initiation/Termination frames are skipped, not fatal.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from bgpexplorer_spark.sources.mrt import (
    MRT_FIELDS,
    MRT_SCHEMA,
    _v4_str,
    _v6_str,
    parse_bgp_update,
)

BMP_ROUTE_MONITORING = 0
BMP_PEER_DOWN = 2
BMP_PEER_UP = 3
BMP_INITIATION = 4

_PER_PEER_LEN = 42  # type(1) flags(1) RD(8) addr(16) AS(4) BGPID(4) ts(4+4)


def _parse_per_peer(body: bytes, off: int) -> tuple[str, int, float]:
    """Per-peer header (RFC 7854 §4.2) → (peer_addr, peer_as, ts)."""
    flags = body[off + 1]
    addr_raw = body[off + 10 : off + 26]
    if flags & 0x80:  # V flag: IPv6 peer address
        peer_addr = _v6_str(addr_raw)
    else:
        peer_addr = _v4_str(struct.unpack(">I", addr_raw[12:16])[0])
    peer_as = struct.unpack(">I", body[off + 26 : off + 30])[0]
    ts_sec, ts_usec = struct.unpack(">II", body[off + 34 : off + 42])
    return peer_addr, peer_as, ts_sec + ts_usec / 1e6


def parse_bmp(data: bytes) -> Iterator[dict]:
    """One BMP byte stream → decoded update/withdraw rows (MRT_SCHEMA
    field order). Framing per src/bmppeer.rs:65-131: version must be 3,
    length-prefixed messages, junk skipped."""
    import datetime as dt

    for mtype, body in _walk_frames(data):
        if mtype != BMP_ROUTE_MONITORING or len(body) < _PER_PEER_LEN + 19:
            continue
        # one corrupt frame must not abort the stream (nor its Arrow
        # batch): skip the rest of THAT frame only
        try:
            peer_addr, peer_as, ts_f = _parse_per_peer(body, 0)
            p = _PER_PEER_LEN
            # BGP message: 16B marker + length(2) + type(1)
            btype = body[p + 18]
            if btype != 2:
                continue
            p += 19
            ts = dt.datetime.fromtimestamp(ts_f, tz=dt.timezone.utc).replace(
                tzinfo=None
            )
            yield from parse_bgp_update(
                body, p, len(body), ts, peer_addr, peer_as, as4=True
            )
        except (IndexError, struct.error, ValueError, OverflowError, OSError):
            continue


def parse_bmp_sessions(data: bytes) -> list[tuple[str, int]]:
    """Peer Up session registry from the stream (src/bmppeer.rs PeerUp →
    register_session analog): distinct (peer_addr, peer_as) in arrival
    order."""
    out: list[tuple[str, int]] = []
    for mtype, body in _walk_frames(data):
        if mtype == BMP_PEER_UP and len(body) >= _PER_PEER_LEN:
            peer_addr, peer_as, _ = _parse_per_peer(body, 0)
            if (peer_addr, peer_as) not in out:
                out.append((peer_addr, peer_as))
    return out


def read_bmp(spark: SparkSession, path: str) -> DataFrame:
    """BMP capture file(s) → MRT_SCHEMA DataFrame (same downstream as
    read_mrt: assign_sessions → build_history)."""
    import pandas as pd

    names = [f.name for f in MRT_FIELDS]

    def decode(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_bmp(bytes(content)))
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                columns=names
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, MRT_SCHEMA)


def bmp_peers(spark: SparkSession, path: str) -> DataFrame:
    """Distinct (peer_addr, peer_as) of a BMP capture — the sessions
    dimension scan, mirroring sources.mrt.mrt_peers: the SAME decode
    walk as read_bmp (identical peer visibility — a peer appears iff one
    of its Route Monitoring frames emits a row) reduced to the per-file
    distinct set executor-side, so building the dimension never
    re-shuffles the full-width decoded capture."""
    import pandas as pd

    def scan(batches):
        for pdf in batches:
            pairs = set()
            for content in pdf["content"]:
                for r in parse_bmp(bytes(content)):
                    pairs.add((r["peer_addr"], r["peer_as"]))
            yield pd.DataFrame(
                sorted(pairs), columns=["peer_addr", "peer_as"]
            ) if pairs else pd.DataFrame(columns=["peer_addr", "peer_as"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        scan, "peer_addr string, peer_as long"
    ).distinct()


# --- fixture encoders -------------------------------------------------------


def _per_peer(peer_ip: int, peer_as: int, ts_sec: int, v6: bool = False) -> bytes:
    flags = 0x80 if v6 else 0
    addr = bytes(12) + struct.pack(">I", peer_ip) if not v6 else struct.pack(">16s", b"")
    return (
        bytes([0, flags]) + bytes(8) + addr
        + struct.pack(">I", peer_as) + struct.pack(">I", 0x01020304)
        + struct.pack(">II", ts_sec, 0)
    )


def _frame(mtype: int, body: bytes) -> bytes:
    return bytes([3]) + struct.pack(">I", 6 + len(body)) + bytes([mtype]) + body


def encode_bmp_peer_up(peer_ip: int, peer_as: int, ts_sec: int) -> bytes:
    # local addr(16) + ports(4) + two minimal OPEN messages (19B headers)
    open_msg = b"\xff" * 16 + struct.pack(">HB", 19, 1)
    body = _per_peer(peer_ip, peer_as, ts_sec) + bytes(20) + open_msg + open_msg
    return _frame(BMP_PEER_UP, body)


def encode_bmp_route_monitoring(
    peer_ip: int, peer_as: int, ts_sec: int, update_body: bytes
) -> bytes:
    """``update_body`` = the BGP UPDATE after the 19-byte header (use
    mrt.encode_update internals or build directly)."""
    bgp_msg = b"\xff" * 16 + struct.pack(">HB", 19 + len(update_body), 2) + update_body
    return _frame(BMP_ROUTE_MONITORING, _per_peer(peer_ip, peer_as, ts_sec) + bgp_msg)


# --- peer lifecycle + statistics (RFC 7854 §4.8, §4.9, §4.10) ---------------

BMP_STATS = 1
BMP_TERMINATION = 5

# stat types 7 and 8 are 64-bit gauges; everything else here is u32/u64 by
# TLV length (parsed generically below)
PEER_EVENTS_SCHEMA = (
    "event string, peer_addr string, peer_as bigint, ts timestamp, reason int"
)
STATS_SCHEMA = (
    "peer_addr string, peer_as bigint, ts timestamp, stat_type int, stat_value bigint"
)


# A single BMP message can't plausibly exceed this in a capture: route
# monitoring carries one ≤4 KiB BGP PDU + headers; stats reports a few
# hundred TLVs. A larger length field is a corrupted byte, not a frame —
# resync instead of discarding the rest of the capture.
_MAX_FRAME = 1 << 20


def _walk_frames(data: bytes) -> Iterator[tuple[int, bytes]]:
    """The v3 framing walk shared by all BMP parsers (resync on junk,
    src/bmppeer.rs:65-131). Malformed captures are common in the wild:
    a bad version byte or an implausible/undersized length field skips
    ONE byte and rescans (so a single flipped byte costs at most the
    frame it sits in); only a frame that runs past the end of the data
    — indistinguishable from a truncated tail — stops the walk."""
    off, n = 0, len(data)
    while off + 6 <= n:
        if data[off] != 3:
            off += 1
            continue
        msglen = struct.unpack(">I", data[off + 1 : off + 5])[0]
        if msglen < 6 or msglen > _MAX_FRAME:
            off += 1  # corrupted length byte — resync, don't abort
            continue
        if off + msglen > n:
            break  # truncated tail
        yield data[off + 5], data[off + 6 : off + msglen]
        off += msglen


def _ts_naive(ts_f: float):
    import datetime as dt

    return dt.datetime.fromtimestamp(ts_f, tz=dt.timezone.utc).replace(tzinfo=None)


def parse_bmp_peer_events(data: bytes) -> Iterator[dict]:
    """Peer Up (3) / Peer Down (2) frames → session lifecycle events.
    Peer Down carries a 1-byte reason (RFC 7854 §4.9); reason payload
    (e.g. the NOTIFICATION PDU for reasons 1/3) is not decoded."""
    for mtype, body in _walk_frames(data):
        if len(body) < _PER_PEER_LEN:
            continue
        if mtype == BMP_PEER_UP:
            peer_addr, peer_as, ts_f = _parse_per_peer(body, 0)
            yield {
                "event": "up", "peer_addr": peer_addr, "peer_as": peer_as,
                "ts": _ts_naive(ts_f), "reason": None,
            }
        elif mtype == BMP_PEER_DOWN and len(body) >= _PER_PEER_LEN + 1:
            peer_addr, peer_as, ts_f = _parse_per_peer(body, 0)
            yield {
                "event": "down", "peer_addr": peer_addr, "peer_as": peer_as,
                "ts": _ts_naive(ts_f), "reason": body[_PER_PEER_LEN],
            }


def parse_bmp_stats(data: bytes) -> Iterator[dict]:
    """Stats Report (1) frames → one row per TLV counter (RFC 7854 §4.8:
    per-peer header, u32 count, then (type u16, len u16, value) TLVs —
    u32 counters and u64 gauges both land in a BIGINT). Truncated TLVs
    end the frame's walk without failing the stream."""
    for mtype, body in _walk_frames(data):
        if mtype != BMP_STATS or len(body) < _PER_PEER_LEN + 4:
            continue
        peer_addr, peer_as, ts_f = _parse_per_peer(body, 0)
        ts = _ts_naive(ts_f)
        count = struct.unpack(">I", body[_PER_PEER_LEN : _PER_PEER_LEN + 4])[0]
        p = _PER_PEER_LEN + 4
        for _ in range(count):
            if p + 4 > len(body):
                break
            st, ln = struct.unpack(">HH", body[p : p + 4])
            if p + 4 + ln > len(body):
                break
            val = int.from_bytes(body[p + 4 : p + 4 + ln], "big")
            p += 4 + ln
            yield {
                "peer_addr": peer_addr, "peer_as": peer_as, "ts": ts,
                "stat_type": st, "stat_value": val,
            }


def _read_via(spark: SparkSession, path: str, parser, schema: str) -> DataFrame:
    import pandas as pd

    cols = [c.split()[0] for c in schema.split(",")]

    def decode(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parser(bytes(content)))
            yield pd.DataFrame(rows, columns=[c.strip() for c in cols]) if rows \
                else pd.DataFrame(columns=[c.strip() for c in cols])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema)


def read_bmp_peer_events(spark: SparkSession, path: str) -> DataFrame:
    """BMP capture → peer up/down lifecycle events DataFrame."""
    return _read_via(spark, path, parse_bmp_peer_events, PEER_EVENTS_SCHEMA)


def read_bmp_stats(spark: SparkSession, path: str) -> DataFrame:
    """BMP capture → per-peer statistics counters DataFrame."""
    return _read_via(spark, path, parse_bmp_stats, STATS_SCHEMA)


def peer_session_intervals(events: DataFrame) -> DataFrame:
    """Pair each 'up' with the next 'down' of the same peer → session
    intervals (up_ts, down_ts, down_reason); an 'up' with no later 'down'
    is an open session (down_ts/down_reason NULL). One window per
    (peer_addr, peer_as) — the natural shuffle key for any number of
    monitored routers."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # 'event' tiebreak: a same-second bounce orders down before up, so the
    # prior up pairs with the down and the new up stays open — deterministic
    # across runs/partitions
    w = Window.partitionBy("peer_addr", "peer_as").orderBy("ts", "event")
    nxt_evt = F.lead("event").over(w)
    nxt_ts = F.lead("ts").over(w)
    nxt_reason = F.lead("reason").over(w)
    return (
        events.withColumn("_ne", nxt_evt)
        .withColumn("_nt", nxt_ts)
        .withColumn("_nr", nxt_reason)
        .filter(F.col("event") == "up")
        .select(
            "peer_addr", "peer_as",
            F.col("ts").alias("up_ts"),
            F.when(F.col("_ne") == "down", F.col("_nt")).alias("down_ts"),
            F.when(F.col("_ne") == "down", F.col("_nr")).alias("down_reason"),
        )
    )


def encode_bmp_peer_down(peer_ip: int, peer_as: int, ts_sec: int, reason: int) -> bytes:
    return _frame(BMP_PEER_DOWN, _per_peer(peer_ip, peer_as, ts_sec) + bytes([reason]))


def encode_bmp_stats(
    peer_ip: int, peer_as: int, ts_sec: int, stats: list[tuple[int, int]]
) -> bytes:
    """``stats`` = [(stat_type, value)]; types 7/8 encode as u64 gauges,
    the rest as u32 counters (RFC 7854 §4.8)."""
    tlvs = b""
    for st, val in stats:
        width = 8 if st in (7, 8) else 4
        tlvs += struct.pack(">HH", st, width) + val.to_bytes(width, "big")
    body = _per_peer(peer_ip, peer_as, ts_sec) + struct.pack(">I", len(stats)) + tlvs
    return _frame(BMP_STATS, body)

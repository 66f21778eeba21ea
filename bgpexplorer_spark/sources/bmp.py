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
Peer Up (3) → a session-registration row in the peers list (the analog of
src/bmppeer.rs:45-59 processmsg PeerUp). Stats/PeerDown/Initiation/
Termination frames are skipped, not fatal.
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

    off, n = 0, len(data)
    while off + 6 <= n:
        if data[off] != 3:  # resync: reference skips non-v3 bytes
            off += 1
            continue
        msglen = struct.unpack(">I", data[off + 1 : off + 5])[0]
        if msglen < 6 or off + msglen > n:
            break
        mtype = data[off + 5]
        body = data[off + 6 : off + msglen]
        off += msglen
        if mtype != BMP_ROUTE_MONITORING or len(body) < _PER_PEER_LEN + 19:
            continue
        peer_addr, peer_as, ts_f = _parse_per_peer(body, 0)
        p = _PER_PEER_LEN
        # BGP message: 16B marker + length(2) + type(1)
        btype = body[p + 18]
        if btype != 2:
            continue
        p += 19
        ts = dt.datetime.fromtimestamp(ts_f, tz=dt.timezone.utc).replace(tzinfo=None)
        yield from parse_bgp_update(
            body, p, len(body), ts, peer_addr, peer_as, as4=True
        )


def parse_bmp_sessions(data: bytes) -> list[tuple[str, int]]:
    """Peer Up session registry from the stream (src/bmppeer.rs PeerUp →
    register_session analog): distinct (peer_addr, peer_as) in arrival
    order."""
    out: list[tuple[str, int]] = []
    off, n = 0, len(data)
    while off + 6 <= n:
        if data[off] != 3:
            off += 1
            continue
        msglen = struct.unpack(">I", data[off + 1 : off + 5])[0]
        if msglen < 6 or off + msglen > n:
            break
        mtype = data[off + 5]
        body = data[off + 6 : off + msglen]
        off += msglen
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

"""Live BMP-over-TCP ingestion (SURVEY.md §2.1 S2, daemon mode).

The reference's primary deployment is a resident daemon speaking BMP on a
socket: accept a monitoring session, walk the 5-byte common-header framing,
register sessions at PeerUp, and feed decoded Route Monitoring UPDATEs
into the RIB (src/bmppeer.rs:65-131 framing/lifecycle, src/bgpsvc.rs:135-162
session registry). SURVEY scoped the daemon out of the engine; this module
closes the gap as a THIN ADAPTER with zero engine changes:

    router ──TCP──▶ BmpListener ──parquet──▶ stream_updates_from_files
                         │                        └─▶ run_ingest / live_current_state
                         └──raw frames──▶ read_bmp (archival replay)

Decode reuses sources/bmp.py byte-for-byte: ``parse_bmp`` for Route
Monitoring, ``_parse_per_peer`` for PeerUp. Session ids are dense in
PeerUp-arrival order — the same registration semantics as the reference;
a Route Monitoring frame from a peer that never sent PeerUp is
auto-registered (routers are supposed to PeerUp first, but the reference
tolerates the same reordering). BMP is one-way: the station never writes.
"""

from __future__ import annotations

import struct

from bgpexplorer_spark.sources.bmp import (
    _PER_PEER_LEN,
    _parse_per_peer,
    BMP_PEER_UP,
    parse_bmp,
)
from bgpexplorer_spark.streaming.livebase import (  # noqa: F401  (re-export)
    DialOutMixin,
    LiveListenerBase,
    send_frames,
)


class BmpListener(LiveListenerBase):
    """Accept BMP v3 sessions on a TCP socket and materialize decoded
    updates as UPDATES_SCHEMA parquet micro-batch files in ``out_dir``
    (the ingest dir that ``stream_updates_from_files`` watches);
    ``raw_dir`` optionally archives raw frames for ``read_bmp`` replay.
    """

    def _consume(self, conn, buf: bytes, rows: list[dict], raw: list[bytes]) -> bytes:
        """Split complete v3 frames off the front of ``buf``; return the
        unconsumed tail. Same resync discipline as bmp._walk_frames, but
        incremental: a short read keeps the partial frame buffered."""
        off, n = 0, len(buf)
        while off + 6 <= n:
            if buf[off] != 3:
                off += 1  # resync on junk, src/bmppeer.rs:65-131
                continue
            msglen = struct.unpack(">I", buf[off + 1 : off + 5])[0]
            if msglen < 6:
                off += 1
                continue
            if off + msglen > n:
                break  # incomplete — wait for more bytes
            frame = buf[off : off + msglen]
            self._dispatch(frame, rows)
            raw.append(frame)
            off += msglen
        return buf[off:]

    def _dispatch(self, frame: bytes, rows: list[dict]) -> None:
        mtype, body = frame[5], frame[6:]
        if mtype == BMP_PEER_UP and len(body) >= _PER_PEER_LEN:
            peer_addr, peer_as, _ = _parse_per_peer(body, 0)
            self.registry.get(peer_addr, peer_as)
            return
        for r in parse_bmp(frame):
            sid = self.registry.get(r.pop("peer_addr"), r.pop("peer_as"))
            r["session_id"] = sid
            rows.append(r)


class BmpConnector(DialOutMixin, BmpListener):
    """Active-mode BMP station (reference src/bgpsvc.rs:333-339
    PeerMode::BmpActive): dial the monitored router and read its BMP
    stream — BMP is one-way, so there is no greeting; the dial loop
    reconnects with exponential backoff when the session drops."""

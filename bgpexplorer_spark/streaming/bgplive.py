"""Live BGP-over-TCP ingestion (SURVEY.md §2.1 S1, daemon mode).

A passive BGP speaker, the analog of the reference's peer task
(src/bgppeer.rs:72-100 start_passive, 179-258 lifecycle): accept a
router's connection, receive its OPEN, mirror an OPEN back with our
router-id/AS plus an immediate KEEPALIVE, register the session, then
echo KEEPALIVEs and decode UPDATE messages — each UPDATE's NLRI walk is
the SAME ``parse_bgp_update`` the MRT/BMP batch sources use, so live
rows are byte-for-byte consistent with archival decode. NOTIFICATION
ends the session (src/bgppeer.rs:230-246). Output is UPDATES_SCHEMA
parquet micro-batches for ``stream_updates_from_files`` — zero engine
changes — plus optional raw message capture.

4-octet AS numbers (RFC 6793, capability 65) are always offered and
honored when the peer offers them; multiprotocol capabilities
(RFC 4760) advertise the configured address families (the reference's
caps string, parsed by config.parse_caps). ADD-PATH (RFC 7911,
capability 69) is offered receive-side when configured: if the peer
offers send for every family both sides advertise, the session decodes
4-byte path identifiers through the SAME NLRI walk the archival MRT
ADD-PATH subtypes use (sources/mrt.py _read_prefixes).

``BgpConnector`` is the active-mode speaker (src/bgppeer.rs:102-165
start_active + src/bgpsvc.rs:320-410 reconnect loop): dial the router,
send OPEN first, then share this listener's session machinery.
"""

from __future__ import annotations

import datetime as dt
import struct
import time

from bgpexplorer_spark.sources.mrt import parse_bgp_update
from bgpexplorer_spark.streaming.livebase import (  # noqa: F401  (re-export)
    DialOutMixin,
    LiveListenerBase,
    send_frames,
)

# IANA AFI/SAFI pairs for the multiprotocol capability (RFC 4760/2858),
# keyed by the reference's caps-string names (src/config.rs:189-235)
MP_CAPS: dict[str, tuple[int, int]] = {
    "ipv4u": (1, 1), "ipv4lu": (1, 4), "vpnv4u": (1, 128),
    "vpnv4m": (1, 129), "ipv4mdt": (1, 66), "mvpn": (1, 5),
    "vpls": (25, 65), "evpn": (25, 70),
    "ipv6u": (2, 1), "ipv6lu": (2, 4), "vpnv6u": (2, 128),
    "vpnv6m": (2, 129), "ipv6mdt": (2, 66),
}

BGP_OPEN = 1
BGP_UPDATE = 2
BGP_NOTIFICATION = 3
BGP_KEEPALIVE = 4

_MARKER = b"\xff" * 16
AS_TRANS = 23456


def encode_bgp_message(mtype: int, body: bytes = b"") -> bytes:
    return _MARKER + struct.pack(">HB", 19 + len(body), mtype) + body


def encode_bgp_open(
    as_num: int, hold_time: int, router_id: int,
    caps: "list[str] | None" = None, asn32: bool = True,
    addpath: "dict[str, int] | None" = None,
) -> bytes:
    """OPEN with the 4-octet-AS capability (the 2-byte field carries
    AS_TRANS when the AS doesn't fit, RFC 6793 §3), one multiprotocol
    capability per named family in ``caps`` (the reference's caps-string
    vocabulary, src/config.rs:189-235), and — when ``addpath`` maps
    family names to an RFC 7911 Send/Receive value (1=receive, 2=send,
    3=both) — one ADD-PATH capability (code 69) covering them."""
    cap = b""
    for name in caps or []:
        afi, safi = MP_CAPS[name]
        cap += bytes([2, 6, 1, 4]) + struct.pack(">HBB", afi, 0, safi)
    if addpath:
        ap = b"".join(
            struct.pack(">HBB", *MP_CAPS[name], sr)
            for name, sr in sorted(addpath.items())
        )
        cap += bytes([2, len(ap) + 2, 69, len(ap)]) + ap
    if asn32:
        cap += bytes([2, 6, 65, 4]) + struct.pack(">I", as_num)
    body = (
        bytes([4])
        + struct.pack(">HHI", as_num if as_num < 65536 else AS_TRANS,
                      hold_time, router_id)
        + bytes([len(cap)])
        + cap
    )
    return encode_bgp_message(BGP_OPEN, body)


def encode_bgp_notification(code: int, subcode: int = 0, data: bytes = b"") -> bytes:
    """NOTIFICATION message (RFC 4271 §4.5); code 4 = Hold Timer Expired."""
    return encode_bgp_message(BGP_NOTIFICATION, bytes([code, subcode]) + data)


def encode_bgp_keepalive() -> bytes:
    return encode_bgp_message(BGP_KEEPALIVE)


def parse_bgp_open(body: bytes, with_mp: bool = False,
                   with_addpath: bool = False):
    """OPEN body → (peer_as, hold_time, as4[, mp_families][, addpath]).
    The 4-octet-AS capability (code 65) overrides the 2-byte my-AS
    field; ``with_mp=True`` also returns the advertised multiprotocol
    (afi, safi) set; ``with_addpath=True`` additionally returns the
    RFC 7911 capability as a {(afi, safi): send_receive} dict."""
    if len(body) < 10 or body[0] != 4:
        raise ValueError("unsupported BGP version")
    my_as, hold_time = struct.unpack(">HH", body[1:5])
    peer_as, as4 = my_as, False
    mp: set[tuple[int, int]] = set()
    ap: dict[tuple[int, int], int] = {}
    optlen = body[9]
    p, end = 10, min(10 + optlen, len(body))
    while p + 2 <= end:
        ptype, plen = body[p], body[p + 1]
        val = body[p + 2 : p + 2 + plen]
        p += 2 + plen
        if ptype != 2:  # only capability params (RFC 5492)
            continue
        q = 0
        while q + 2 <= len(val):
            code, clen = val[q], val[q + 1]
            if code == 65 and clen == 4:
                peer_as = struct.unpack(">I", val[q + 2 : q + 6])[0]
                as4 = True
            elif code == 1 and clen == 4:
                afi, _res, safi = struct.unpack(">HBB", val[q + 2 : q + 6])
                mp.add((afi, safi))
            elif code == 69:  # ADD-PATH: repeated (afi, safi, send/recv)
                for a in range(0, clen - 3, 4):
                    afi, safi, sr = struct.unpack(
                        ">HBB", val[q + 2 + a : q + 6 + a])
                    ap[(afi, safi)] = sr
            q += 2 + clen
    out = [peer_as, hold_time, as4]
    if with_mp:
        out.append(mp)
    if with_addpath:
        out.append(ap)
    return tuple(out)


class BgpListener(LiveListenerBase):
    """Passive BGP speaker: accept sessions, handshake, decode UPDATEs
    into UPDATES_SCHEMA parquet micro-batches in ``out_dir``.

    ``as_num`` / ``router_id`` / ``hold_time`` are this station's OPEN
    parameters (the reference takes them from [main] config,
    src/config.rs). ``addpath=True`` offers the RFC 7911 capability
    (receive side) for every configured family; path identifiers decode
    when the peer offers send for all families both sides advertise —
    the NLRI walk's addpath flag is per-session, like the MRT ADDPATH
    message subtypes it shares code with."""

    active = False  # active-mode subclasses send OPEN first

    def __init__(
        self, out_dir: str, as_num: int = 64512, router_id: int = 0x0A00007B,
        hold_time: int = 180, caps: "list[str] | None" = None,
        addpath: bool = False, **kw,
    ) -> None:
        import threading

        super().__init__(out_dir, **kw)
        self.as_num = as_num
        self.router_id = router_id
        self.hold_time = hold_time
        self.caps = list(caps) if caps else ["ipv4u"]  # reference minimal
        self.addpath = addpath
        # per-connection session state: each connection is served by
        # exactly one thread (livebase thread-per-connection), so
        # thread-local storage is the natural per-session slot
        self._tls = threading.local()

    def _open_bytes(self, hold_time: "int | None" = None) -> bytes:
        """Our OPEN (+ receive-side ADD-PATH offer when configured)."""
        return encode_bgp_open(
            self.as_num,
            self.hold_time if hold_time is None else hold_time,
            self.router_id, caps=self.caps,
            addpath={c: 1 for c in self.caps} if self.addpath else None,
        )

    def _negotiate_addpath(self, peer_mp, peer_ap) -> bool:
        """RFC 7911: a path id prefixes NLRI of an (afi, safi) iff BOTH
        sides advertised ADD-PATH for it (we receive, peer sends). The
        shared UPDATE walk carries one per-session flag — same
        granularity as the MRT ADDPATH subtypes — so the session decodes
        add-path only when EVERY family both sides advertise negotiated
        it (a per-family mismatch would mis-frame the NLRI)."""
        if not self.addpath:
            return False
        # a peer with no MP capability implicitly speaks ipv4u (RFC 4760)
        shared = {MP_CAPS[c] for c in self.caps} & (peer_mp or {(1, 1)})
        return bool(shared) and all(
            peer_ap.get(fam, 0) & 2 for fam in shared
        )

    def _consume(self, conn, buf: bytes, rows: list[dict], raw: list[bytes]) -> bytes:
        if getattr(self._tls, "dead", False):
            return b""  # session torn down by NOTIFICATION — drain only
        off, n = 0, len(buf)
        while off + 19 <= n:
            if buf[off : off + 16] != _MARKER:
                off += 1  # resync (a healthy session never needs this)
                continue
            msglen, mtype = struct.unpack(">HB", buf[off + 16 : off + 19])
            if msglen < 19 or msglen > 4096:
                off += 1
                continue
            if off + msglen > n:
                break  # incomplete — wait for more bytes
            body = buf[off + 19 : off + msglen]
            if self._dispatch(conn, mtype, body, rows) is False:
                raw.append(buf[off : off + msglen])
                return b""  # NOTIFICATION: drop the rest of the stream
            raw.append(buf[off : off + msglen])
            off += msglen
        return buf[off:]

    def _tick(self, conn) -> bool:
        """RFC 4271 timers, the reference's lifecycle cadence
        (src/bgppeer.rs:181-258): proactively send KEEPALIVE every
        negotiated hold/3 (not only as an echo), and when the peer has
        been silent for a full hold time, send NOTIFICATION code 4
        (Hold Timer Expired), clear the session slot, and drop the
        connection. Negotiated hold 0 disables both timers (RFC 4271
        §4.2). Runs on the connection's own serve thread at the recv
        timeout's ~0.2 s resolution."""
        ht = getattr(self._tls, "hold_time", 0)
        if not ht or getattr(self._tls, "dead", False) \
                or getattr(self._tls, "session", None) is None:
            return True
        now = time.monotonic()
        if now - self._tls.last_sent >= ht / 3.0:
            try:
                conn.sendall(encode_bgp_keepalive())
                self._tls.last_sent = now
            except OSError:
                return False
        if now - self._tls.last_recv >= ht:
            try:
                conn.sendall(encode_bgp_notification(4))
            except OSError:
                pass
            self._tls.dead = True
            self._tls.session = None
            return False
        return True

    def _dispatch(self, conn, mtype: int, body: bytes, rows: list[dict]):
        # any complete message from the peer restarts its hold timer
        # (RFC 4271 §8: KeepaliveTimer_Expires / UpdateMsg both reset)
        self._tls.last_recv = time.monotonic()
        if mtype == BGP_OPEN:
            peer_as, hold_time, as4, peer_mp, peer_ap = parse_bgp_open(
                body, with_mp=True, with_addpath=True)
            peer_addr = conn.getpeername()[0]
            self._tls.session = (
                self.registry.get(peer_addr, peer_as), peer_addr, peer_as, as4,
                self._negotiate_addpath(peer_mp, peer_ap),
            )
            # negotiated hold time is the lower of the two proposals
            # (RFC 4271 §4.2); 0 is valid and means "no keepalives" —
            # echo it rather than coercing to our own
            negotiated = min(self.hold_time, hold_time)
            self._tls.hold_time = negotiated
            self._tls.last_sent = self._tls.last_recv = time.monotonic()
            try:
                if self.active:
                    # we already sent OPEN on connect (src/bgppeer.rs:
                    # 102-165 start_active) — just confirm
                    conn.sendall(encode_bgp_keepalive())
                else:
                    # mirror OPEN (our identity, src/bgppeer.rs:85-93) and
                    # confirm with an immediate KEEPALIVE so the peer
                    # reaches Established
                    conn.sendall(self._open_bytes(negotiated)
                                 + encode_bgp_keepalive())
            except OSError:
                pass
        elif mtype == BGP_KEEPALIVE:
            try:
                conn.sendall(encode_bgp_keepalive())  # src/bgppeer.rs:225-229
                self._tls.last_sent = time.monotonic()
            except OSError:
                pass
        elif mtype == BGP_UPDATE:
            sess = getattr(self._tls, "session", None)
            if sess is None:
                return None  # UPDATE before OPEN — not a session, drop
            sid, peer_addr, peer_as, as4, addpath = sess
            ts = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            try:
                decoded = list(parse_bgp_update(
                    body, 0, len(body), ts, peer_addr, peer_as, as4=as4,
                    addpath=addpath,
                ))
            except (IndexError, struct.error, ValueError, OverflowError):
                return None  # malformed UPDATE: drop it, keep the session
            for r in decoded:
                r.pop("peer_addr"), r.pop("peer_as")
                r["session_id"] = sid
                rows.append(r)
        elif mtype == BGP_NOTIFICATION:
            self._tls.dead = True
            self._tls.session = None
            return False  # peer is tearing down (src/bgppeer.rs:230-246)
        return None


class BgpConnector(DialOutMixin, BgpListener):
    """Active-mode BGP speaker (reference src/bgppeer.rs:102-165
    ``start_active`` + src/bgpsvc.rs:320-410 ``run_peer_active`` with
    its auto-reconnect respawn loop): dial the configured router, send
    OPEN first, then run the SAME session machinery as the passive
    listener — the peer's OPEN is answered with just a KEEPALIVE (the
    ``active`` flag short-circuits the OPEN mirror), KEEPALIVEs are
    echoed, UPDATEs decode into UPDATES_SCHEMA parquet micro-batches,
    NOTIFICATION tears the session down and the dial loop reconnects
    with exponential backoff.

    This is the deployment shape for a monitoring station behind NAT or
    an import policy that requires the collector to initiate.
    """

    active = True

    def _greet(self, conn) -> None:
        # the dial thread is reused across reconnects: clear the
        # NOTIFICATION tombstone, any stale session, and the previous
        # connection's hold-timer state before OPEN
        self._tls.dead = False
        self._tls.session = None
        self._tls.hold_time = 0
        conn.sendall(self._open_bytes())

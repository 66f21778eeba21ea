"""Live BGP speaker e2e (SURVEY §2.1 S1 daemon mode): a simulated
router opens a real TCP session, handshakes (OPEN/OPEN+KEEPALIVE),
exchanges keepalives, announces and withdraws routes, and the decoded
stream feeds live_current_state (src/bgppeer.rs:72-100, 179-258)."""

from __future__ import annotations

import socket
import struct
import tempfile
import time

from bgpexplorer_spark.sources.mrt import encode_bgp_update_body
from bgpexplorer_spark.streaming.bgplive import (
    BGP_KEEPALIVE,
    BGP_NOTIFICATION,
    BGP_OPEN,
    BgpListener,
    encode_bgp_keepalive,
    encode_bgp_message,
    encode_bgp_open,
    parse_bgp_open,
)
from bgpexplorer_spark.streaming.feed import (
    live_current_state,
    stream_updates_from_files,
)


def _recv_msg(s: socket.socket) -> tuple[int, bytes]:
    hdr = b""
    while len(hdr) < 19:
        hdr += s.recv(19 - len(hdr))
    msglen, mtype = struct.unpack(">HB", hdr[16:19])
    body = b""
    while len(body) < msglen - 19:
        body += s.recv(msglen - 19 - len(body))
    return mtype, body


def _wait_for_files(d, timeout=10.0):
    import os

    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if any(n.endswith(".parquet") for n in os.listdir(d)):
            return
        time.sleep(0.1)
    raise AssertionError(f"no parquet batch appeared in {d}")


def test_bgp_session_to_current_state(spark):
    out = tempfile.mkdtemp()
    with BgpListener(out, as_num=64512, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            # router (4-byte AS 200000 → AS_TRANS in the 2-byte field)
            s.sendall(encode_bgp_open(200000, 90, 0x0A000001))
            mtype, body = _recv_msg(s)
            assert mtype == BGP_OPEN
            st_as, st_hold, st_as4 = parse_bgp_open(body)
            assert (st_as, st_as4) == (64512, True)
            assert st_hold <= 90  # station honors the lower hold time
            assert _recv_msg(s)[0] == BGP_KEEPALIVE  # immediate confirm
            s.sendall(encode_bgp_keepalive())
            assert _recv_msg(s)[0] == BGP_KEEPALIVE  # echo

            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0B000000, 24)], origin=0,
                aspath=[(2, [200000, 3356])], nexthop=0x0A000001,
            )))
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0C000000, 16)], origin=0,
                aspath=[(2, [200000])], nexthop=0x0A000001,
            )))
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                withdrawn=[(0x0B000000, 24)],
            )))
            time.sleep(0.6)
        _wait_for_files(out)
        sessions = lsn.registry.snapshot()
    assert sessions == [(0, "127.0.0.1", 200000)]

    upd = spark.read.parquet(out)
    rows = {(r.op, r.nlri_str, r.session_id) for r in upd.collect()}
    assert rows == {
        ("update", "11.0.0.0/24", 0),
        ("update", "12.0.0.0/16", 0),
        ("withdraw", "11.0.0.0/24", 0),
    }
    # AS4: the 4-byte path decoded through the negotiated capability
    paths = {tuple(seg.asns) for r in upd.filter("op = 'update'").collect()
             for seg in r.aspath}
    assert (200000, 3356) in paths

    stream = stream_updates_from_files(spark, out)
    q = (
        live_current_state(stream)
        .writeStream.format("memory").queryName("bgplive_cs").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    state = {
        r.nlri_str: r.active
        for r in spark.sql("SELECT * FROM bgplive_cs").collect()
    }
    assert state == {"11.0.0.0/24": False, "12.0.0.0/16": True}


def test_bgp_notification_ends_session(spark):
    out = tempfile.mkdtemp()
    with BgpListener(out, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65010, 30, 0x01010101))
            _recv_msg(s), _recv_msg(s)  # OPEN + KEEPALIVE
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0D000000, 8)], origin=0,
                aspath=[(2, [65010])], nexthop=0x01010101,
            )))
            # NOTIFICATION (cease): everything after it must be dropped,
            # even when it arrives in a later TCP segment
            s.sendall(encode_bgp_message(BGP_NOTIFICATION, bytes([6, 0])))
            time.sleep(0.3)
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0E000000, 8)], origin=0,
                aspath=[(2, [65010])], nexthop=0x01010101,
            )))
            time.sleep(0.6)
        _wait_for_files(out)
    upd = spark.read.parquet(out)
    assert {r.nlri_str for r in upd.collect()} == {"13.0.0.0/8"}


def test_update_before_open_is_dropped():
    out = tempfile.mkdtemp()
    with BgpListener(out, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0B000000, 24)], origin=0,
                aspath=[(2, [65001])], nexthop=0x0A000001,
            )))
            time.sleep(0.5)
        assert lsn.registry.snapshot() == []
    import os

    assert not any(n.endswith(".parquet") for n in os.listdir(out))


def test_concurrent_router_sessions(spark):
    """Two routers connected simultaneously: session ids stay distinct
    and every route lands under the right session (registry lock +
    per-connection thread state under real concurrency)."""
    import threading

    out = tempfile.mkdtemp()

    def router(port, asn, router_id, net):
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(encode_bgp_open(asn, 60, router_id))
            _recv_msg(s), _recv_msg(s)
            for i in range(5):
                s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                    nlri=[(net + (i << 8), 24)], origin=0,
                    aspath=[(2, [asn, 3356])], nexthop=router_id,
                )))
                time.sleep(0.02)
            time.sleep(0.5)

    with BgpListener(out, flush_secs=0.2) as lsn:
        t1 = threading.Thread(target=router,
                              args=(lsn.port, 65001, 0x0A000001, 0x0B000000))
        t2 = threading.Thread(target=router,
                              args=(lsn.port, 65002, 0x0A000002, 0x0C000000))
        t1.start(); t2.start(); t1.join(); t2.join()
        time.sleep(0.5)
        reg = {asn: sid for sid, _a, asn in lsn.registry.snapshot()}
    assert set(reg) == {65001, 65002} and len(set(reg.values())) == 2

    upd = spark.read.parquet(out)
    per = {
        (r.session_id, r.nlri_str.split(".")[0]) for r in upd.collect()
    }
    # every 11.x route under 65001's sid, every 12.x under 65002's sid
    assert per == {(reg[65001], "11"), (reg[65002], "12")}
    assert upd.count() == 10


def test_malformed_update_skipped_session_survives(spark):
    """A garbled UPDATE body (claims more attribute bytes than it has)
    is dropped without tearing down the session; the next valid UPDATE
    still decodes."""
    out = tempfile.mkdtemp()
    with BgpListener(out, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65011, 30, 0x01010101))
            _recv_msg(s), _recv_msg(s)
            # withdrawn-len 0, attrs-len 200 but only 4 attr bytes present
            bad = struct.pack(">H", 0) + struct.pack(">H", 200) + b"\x40\x01\x01\x00"
            s.sendall(encode_bgp_message(2, bad))
            time.sleep(0.2)
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0D000000, 8)], origin=0,
                aspath=[(2, [65011])], nexthop=0x01010101,
            )))
            time.sleep(0.6)
        _wait_for_files(out)
    upd = spark.read.parquet(out)
    assert {r.nlri_str for r in upd.collect()} == {"13.0.0.0/8"}


def test_hold_timer_keepalive_cadence_and_expiry():
    """RFC 4271 timer enforcement (src/bgppeer.rs:181-258 semantics):
    with a negotiated 3 s hold time the listener proactively sends
    KEEPALIVE every ~1 s (hold/3) without being prompted, and when the
    peer goes fully silent for a hold time it receives NOTIFICATION
    code 4 (Hold Timer Expired) and the connection is closed."""
    out = tempfile.mkdtemp()
    with BgpListener(out, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65010, 3, 0x01010101))
            assert _recv_msg(s)[0] == BGP_OPEN
            assert _recv_msg(s)[0] == BGP_KEEPALIVE  # immediate confirm
            t0 = time.monotonic()
            # stay SILENT: the next two keepalives must be listener-
            # initiated on the hold/3 cadence (~1 s apart), not echoes
            ka_times = []
            mtype = BGP_KEEPALIVE
            while mtype == BGP_KEEPALIVE and len(ka_times) < 6:
                mtype, body = _recv_msg(s)
                ka_times.append(time.monotonic() - t0)
            # at least two unprompted keepalives before expiry
            assert len([t for t in ka_times if t < 3.0]) >= 2
            # then the hold timer (3 s of our silence) expires:
            # NOTIFICATION code 4, and the socket closes
            assert mtype == BGP_NOTIFICATION and body[0] == 4
            expiry_at = ka_times[-1]
            assert 2.5 <= expiry_at <= 6.0
            assert s.recv(4096) == b""  # orderly close from the listener


def test_hold_time_zero_disables_timers():
    """Negotiated hold 0 means no keepalives and no expiry (RFC 4271
    §4.2): a silent session stays up."""
    out = tempfile.mkdtemp()
    with BgpListener(out, flush_secs=0.2, hold_time=0) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=2) as s:
            s.sendall(encode_bgp_open(65010, 3, 0x01010101))
            assert _recv_msg(s)[0] == BGP_OPEN
            assert _recv_msg(s)[0] == BGP_KEEPALIVE
            # no more traffic: neither keepalives nor a notification
            try:
                extra = _recv_msg(s)
            except socket.timeout:
                extra = None
            assert extra is None

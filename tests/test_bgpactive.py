"""Active-mode BGP peering + live ADD-PATH e2e (SURVEY §2.1 S1;
reference src/bgppeer.rs:102-165 start_active, src/bgpsvc.rs:320-410
run_peer_active + auto-reconnect): the collector dials a mock router,
sends OPEN first, handshakes, and decoded UPDATEs flow into
UPDATES_SCHEMA parquet; a dropped session reconnects with backoff;
RFC 7911 ADD-PATH negotiated on a live socket yields path_id != 0
through the same NLRI walk the archival ADDPATH subtypes use."""

from __future__ import annotations

import os
import socket
import struct
import tempfile
import time

from bgpexplorer_spark.sources.mrt import encode_bgp_update_body
from bgpexplorer_spark.streaming.bgplive import (
    BGP_KEEPALIVE,
    BGP_OPEN,
    BgpConnector,
    BgpListener,
    encode_bgp_keepalive,
    encode_bgp_message,
    encode_bgp_open,
    parse_bgp_open,
)


def _recv_msg(s: socket.socket) -> tuple[int, bytes]:
    hdr = b""
    while len(hdr) < 19:
        chunk = s.recv(19 - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    msglen, mtype = struct.unpack(">HB", hdr[16:19])
    body = b""
    while len(body) < msglen - 19:
        body += s.recv(msglen - 19 - len(body))
    return mtype, body


def _wait_for_files(d, timeout=10.0, minimum=1):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if sum(n.endswith(".parquet") for n in os.listdir(d)) >= minimum:
            return
        time.sleep(0.1)
    raise AssertionError(f"no parquet batch appeared in {d}")


def _router_socket() -> socket.socket:
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    srv.settimeout(10)
    return srv


def test_active_connector_dials_and_ingests(spark):
    """Connector sends OPEN first; the router's OPEN is answered with
    just a KEEPALIVE (no second OPEN); UPDATEs land in parquet under the
    dialed peer's session."""
    out = tempfile.mkdtemp()
    with _router_socket() as srv:
        host, port = srv.getsockname()
        with BgpConnector(out, host, port, as_num=64512,
                          flush_secs=0.2, reconnect=False) as conn_lsn:
            s, _ = srv.accept()
            with s:
                mtype, body = _recv_msg(s)  # collector speaks first
                assert mtype == BGP_OPEN
                st_as, _hold, st_as4 = parse_bgp_open(body)
                assert (st_as, st_as4) == (64512, True)
                s.sendall(encode_bgp_open(65020, 90, 0x0A000001))
                assert _recv_msg(s)[0] == BGP_KEEPALIVE  # confirm, not OPEN
                s.sendall(encode_bgp_keepalive())
                assert _recv_msg(s)[0] == BGP_KEEPALIVE  # echo
                s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                    nlri=[(0x0B000000, 24)], origin=0,
                    aspath=[(2, [65020, 3356])], nexthop=0x0A000001,
                )))
                time.sleep(0.6)
            _wait_for_files(out)
            assert conn_lsn.registry.snapshot() == [(0, "127.0.0.1", 65020)]
    upd = spark.read.parquet(out)
    assert {(r.op, r.nlri_str, r.session_id) for r in upd.collect()} == {
        ("update", "11.0.0.0/24", 0),
    }


def test_active_connector_reconnects(spark):
    """Session loss → redial with backoff; the rejoined session keeps
    its registry id (same (addr, AS) key, src/bgpsvc.rs:361-410)."""
    out = tempfile.mkdtemp()
    with _router_socket() as srv:
        host, port = srv.getsockname()
        with BgpConnector(out, host, port, flush_secs=0.2,
                          backoff_initial=0.1, backoff_max=0.5):
            for i, net in enumerate((0x0B000000, 0x0C000000)):
                s, _ = srv.accept()
                with s:
                    assert _recv_msg(s)[0] == BGP_OPEN
                    s.sendall(encode_bgp_open(65021, 90, 0x0A000001))
                    assert _recv_msg(s)[0] == BGP_KEEPALIVE
                    s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                        nlri=[(net, 24)], origin=0,
                        aspath=[(2, [65021])], nexthop=0x0A000001,
                    )))
                    time.sleep(0.6)
                # socket closes here → connector must dial again
            _wait_for_files(out)
    upd = spark.read.parquet(out)
    rows = {(r.nlri_str, r.session_id) for r in upd.collect()}
    assert rows == {("11.0.0.0/24", 0), ("12.0.0.0/24", 0)}


def test_live_addpath_negotiated(spark):
    """Listener offers ADD-PATH receive; a router offering send gets its
    4-byte path ids decoded (RFC 7911); a router NOT offering it on a
    second session still decodes plain NLRI (per-session flag)."""
    out = tempfile.mkdtemp()
    with BgpListener(out, as_num=64512, addpath=True, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(
                65030, 90, 0x0A000001, caps=["ipv4u"], addpath={"ipv4u": 3}))
            mtype, body = _recv_msg(s)
            assert mtype == BGP_OPEN
            *_rest, st_ap = parse_bgp_open(body, with_addpath=True)
            assert st_ap == {(1, 1): 1}  # our receive-side offer mirrored
            assert _recv_msg(s)[0] == BGP_KEEPALIVE
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0B000000, 24, 7), (0x0B000000, 24, 9)], origin=0,
                aspath=[(2, [65030])], nexthop=0x0A000001, addpath=True,
            )))
            time.sleep(0.6)
        # second router: no ADD-PATH capability → plain NLRI framing
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65031, 90, 0x0A000002, caps=["ipv4u"]))
            _recv_msg(s), _recv_msg(s)
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                nlri=[(0x0C000000, 16)], origin=0,
                aspath=[(2, [65031])], nexthop=0x0A000002,
            )))
            time.sleep(0.6)
        _wait_for_files(out)
    upd = spark.read.parquet(out)
    rows = {(r.nlri_str, r.path_id) for r in upd.collect()}
    assert rows == {
        ("11.0.0.0/24", 7), ("11.0.0.0/24", 9), ("12.0.0.0/16", 0),
    }


def test_hold_time_zero_is_echoed():
    """RFC 4271 allows hold time 0 (no keepalives); the negotiated value
    min(ours, peer's) = 0 must be echoed, not coerced to ours."""
    out = tempfile.mkdtemp()
    with BgpListener(out, hold_time=180, flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65040, 0, 0x0A000001))
            mtype, body = _recv_msg(s)
            assert mtype == BGP_OPEN
            _as, hold, _as4 = parse_bgp_open(body)
            assert hold == 0


def test_start_listeners_boots_active_peer(spark, tmp_path):
    """INI with a bgpactive section boots a dialing BgpConnector whose
    decoded updates land in out_dir (config.start_listeners e2e)."""
    from bgpexplorer_spark.config import from_inifile, start_listeners

    out = tempfile.mkdtemp()
    with _router_socket() as srv:
        host, port = srv.getsockname()
        ini = tmp_path / "active.ini"
        ini.write_text(
            "[main]\nhttplisten=127.0.0.1:0\npeeras=64512\n"
            "routerid=10.0.0.123\n"
            f"[router1]\nmode=bgpactive\npeer={host}:{port}\n"
            "caps=ipv4u,addpath\n"
        )
        lsns = start_listeners(from_inifile(str(ini)), out)
        try:
            s, _ = srv.accept()
            with s:
                mtype, body = _recv_msg(s)
                assert mtype == BGP_OPEN
                *_rest, ap = parse_bgp_open(body, with_addpath=True)
                assert ap == {(1, 1): 1}  # caps 'addpath' token wired in
                s.sendall(encode_bgp_open(
                    65050, 90, 0x0A000001, caps=["ipv4u"],
                    addpath={"ipv4u": 2}))
                assert _recv_msg(s)[0] == BGP_KEEPALIVE
                s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                    nlri=[(0x0D000000, 24, 3)], origin=0,
                    aspath=[(2, [65050])], nexthop=0x0A000001, addpath=True,
                )))
                time.sleep(0.6)
            _wait_for_files(out)
        finally:
            for lsn in lsns:
                lsn.stop()
    upd = spark.read.parquet(out)
    assert {(r.nlri_str, r.path_id) for r in upd.collect()} == {
        ("13.0.0.0/24", 3),
    }


def test_passive_caps_union(tmp_path):
    """Two bgppassive peers with different caps: the shared listener's
    OPEN advertises the union (ADVICE: caps_strs[0] dropped families)."""
    from bgpexplorer_spark.config import from_inifile, start_listeners

    out = tempfile.mkdtemp()
    ini = tmp_path / "passive.ini"
    ini.write_text(
        "[main]\nhttplisten=127.0.0.1:0\npeeras=64512\n"
        "routerid=10.0.0.123\nprotolisten=127.0.0.1:0\n"
        "[r1]\nmode=bgppassive\ncaps=ipv4u\n"
        "[r2]\nmode=bgppassive\ncaps=ipv6u,vpnv4u\n"
    )
    lsns = start_listeners(from_inifile(str(ini)), out)
    try:
        lsn = lsns[0]
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65060, 90, 0x0A000001))
            mtype, body = _recv_msg(s)
            assert mtype == BGP_OPEN
            _as, _h, _as4, mp = parse_bgp_open(body, with_mp=True)
            assert mp == {(1, 1), (2, 1), (1, 128)}
    finally:
        for lsn in lsns:
            lsn.stop()


def test_live_vpn_family_update(spark):
    """A vpnv4u UPDATE over a live socket decodes through the same
    family matrix as the archival walk: RD + label stack + canonical
    nlri_str land in the micro-batch parquet."""
    from bgpexplorer_spark.sources.mrt import encode_labeled_nlri

    out = tempfile.mkdtemp()
    with BgpListener(out, as_num=64512, caps=["ipv4u", "vpnv4u"],
                     flush_secs=0.2) as lsn:
        with socket.create_connection((lsn.host, lsn.port), timeout=10) as s:
            s.sendall(encode_bgp_open(65070, 90, 0x0A000001,
                                      caps=["ipv4u", "vpnv4u"]))
            _recv_msg(s), _recv_msg(s)
            payload = encode_labeled_nlri([100], 0x0A000000, 24, rd=(100, 1000))
            s.sendall(encode_bgp_message(2, encode_bgp_update_body(
                origin=0, aspath=[(2, [65070])],
                mp_reach=(1, 128, bytes(8) + b"\x0a\x00\x00\x01", payload),
            )))
            time.sleep(0.6)
        _wait_for_files(out)
    upd = spark.read.parquet(out)
    [r] = upd.collect()
    assert (r.rib, r.nlri_str) == ("vpnv4u", "L100:100:1000:10.0.0.0/24")
    assert (r.rd_hi, r.rd_lo, r.labels) == (100, 1000, [100])

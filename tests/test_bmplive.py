"""Live BMP TCP adapter e2e (SURVEY §2.1 S2 daemon mode): frames over a
real socket → UPDATES_SCHEMA micro-batch files → streaming ingest →
live_current_state shows the route (src/bmppeer.rs:65-131 lifecycle)."""

from __future__ import annotations

import tempfile
import time

from bgpexplorer_spark.sources.bmp import (
    encode_bmp_peer_up,
    encode_bmp_route_monitoring,
    read_bmp,
)
from bgpexplorer_spark.sources.mrt import encode_bgp_update_body
from bgpexplorer_spark.streaming.bmplive import BmpListener, send_frames
from bgpexplorer_spark.streaming.feed import (
    live_current_state,
    stream_updates_from_files,
)

PEER1 = (0x0A000001, 65001)  # 10.0.0.1
PEER2 = (0x0A000002, 65002)


def _rm(peer, ts, **kw):
    return encode_bmp_route_monitoring(
        peer[0], peer[1], ts, encode_bgp_update_body(**kw)
    )


def _frames():
    return [
        encode_bmp_peer_up(*PEER1, 100),
        encode_bmp_peer_up(*PEER2, 100),
        _rm(PEER1, 101, nlri=[(0x0B000000, 24)], origin=0,
            aspath=[(2, [65001, 3356])], nexthop=0x0A000001),
        _rm(PEER2, 102, nlri=[(0x0C000000, 16)], origin=0,
            aspath=[(2, [65002, 174])], nexthop=0x0A000002),
        _rm(PEER1, 103, withdrawn=[(0x0B000000, 24)]),
    ]


def _wait_for_files(d, timeout=10.0):
    import os

    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if any(n.endswith(".parquet") for n in os.listdir(d)):
            return
        time.sleep(0.1)
    raise AssertionError(f"no parquet batch appeared in {d}")


def test_live_socket_to_current_state(spark):
    out = tempfile.mkdtemp()
    raw = tempfile.mkdtemp()
    with BmpListener(out, raw_dir=raw, flush_secs=0.2) as lsn:
        # fragment the byte stream mid-frame to exercise reassembly, and
        # prepend junk to exercise the resync walk
        frames = _frames()
        send_frames(lsn.host, lsn.port, [b"\x00\xff\x07" + frames[0]] + frames[1:],
                    chunk=33)
        _wait_for_files(out)
        time.sleep(0.5)  # let the final flush land
        sessions = {(a, asn): sid for sid, a, asn in lsn.registry.snapshot()}
    # PeerUp-arrival-order dense ids, reconnect-stable
    assert sessions == {("10.0.0.1", 65001): 0, ("10.0.0.2", 65002): 1}

    stream = stream_updates_from_files(spark, out)
    q = (
        live_current_state(stream)
        .writeStream.format("memory").queryName("bmplive_cs").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        (r.nlri_str, r.session_id): r.active
        for r in spark.sql("SELECT * FROM bmplive_cs").collect()
    }
    # peer1's announce was withdrawn at t=103; peer2's route is live
    assert rows == {("11.0.0.0/24", 0): False, ("12.0.0.0/16", 1): True}

    # archival replay path: the raw capture decodes to the same 3 events
    replay = read_bmp(spark, raw)
    got = [(r.op, r.nlri_str, r.peer_addr) for r in
           replay.orderBy("ts").collect()]
    assert got == [
        ("update", "11.0.0.0/24", "10.0.0.1"),
        ("update", "12.0.0.0/16", "10.0.0.2"),
        ("withdraw", "11.0.0.0/24", "10.0.0.1"),
    ]


def test_listener_registry_dimension_and_reconnect(spark):
    out = tempfile.mkdtemp()
    with BmpListener(out, flush_secs=0.2) as lsn:
        send_frames(lsn.host, lsn.port, [
            encode_bmp_peer_up(*PEER1, 100),
            _rm(PEER1, 101, nlri=[(0x0B000000, 24)], origin=0,
                aspath=[(2, [65001])], nexthop=0x0A000001),
        ])
        _wait_for_files(out)
        # second connection: same peer keeps id 0, a new peer gets 1; a
        # Route Monitoring frame with NO prior PeerUp auto-registers
        send_frames(lsn.host, lsn.port, [
            encode_bmp_peer_up(*PEER1, 200),
            _rm(PEER2, 201, nlri=[(0x0C000000, 16)], origin=0,
                aspath=[(2, [65002])], nexthop=0x0A000002),
        ])
        time.sleep(0.6)
        sdf = lsn.sessions_df(spark)
    rows = {(r.session_id, r.peer1_addr, r.peer1_as) for r in sdf.collect()}
    assert rows == {(0, "10.0.0.1", 65001), (1, "10.0.0.2", 65002)}

    upd = spark.read.parquet(out)
    assert {(r.session_id, r.nlri_str) for r in upd.collect()} == {
        (0, "11.0.0.0/24"), (1, "12.0.0.0/16"),
    }

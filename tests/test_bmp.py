"""BMP (RFC 7854) dump decode — S2 framing + Route Monitoring
(reference src/bmppeer.rs:65-131 framing, 45-59 PeerUp registration)."""

from __future__ import annotations

from bgpexplorer_spark.sources.bmp import (
    encode_bmp_peer_up,
    encode_bmp_route_monitoring,
    parse_bmp,
    parse_bmp_sessions,
    read_bmp,
)
from bgpexplorer_spark.sources.mrt import MRT_SCHEMA, encode_bgp_update_body


def _rm(peer_ip, peer_as, ts, **kw):
    return encode_bmp_route_monitoring(
        peer_ip, peer_as, ts, encode_bgp_update_body(**kw)
    )


def test_route_monitoring_roundtrip():
    stream = encode_bmp_peer_up(0x0AFF0001, 65010, 1704067100)
    stream += _rm(
        0x0AFF0001, 65010, 1704067200,
        nlri=[(0x0A000000, 8)], origin=0,
        aspath=[(2, [100, 200])], nexthop=0xC0000201, comms=[65537],
    )
    stream += _rm(
        0x0AFF0001, 65010, 1704067201,
        withdrawn=[(0x0A000000, 8)],
    )
    rows = list(parse_bmp(stream))
    assert [(r["op"], r["nlri_str"]) for r in rows] == [
        ("update", "10.0.0.0/8"), ("withdraw", "10.0.0.0/8"),
    ]
    r = rows[0]
    assert r["peer_addr"] == "10.255.0.1" and r["peer_as"] == 65010
    assert r["origin"] == "IGP" and r["comms"] == [65537]
    assert r["aspath"] == [{"kind": "Seq", "asns": [100, 200]}]
    assert r["ts"].isoformat() == "2024-01-01T00:00:00"
    assert parse_bmp_sessions(stream) == [("10.255.0.1", 65010)]


def test_junk_resync():
    good = _rm(
        0x0AFF0001, 65010, 1704067200,
        nlri=[(0x0B000000, 16)], origin=1, aspath=[(2, [300])], nexthop=1,
    )
    # leading garbage (non-v3 bytes) then a valid frame, then a truncated one
    stream = b"\x00\x07\x99" + good + b"\x03\x00\x00\xff"
    rows = list(parse_bmp(stream))
    assert len(rows) == 1 and rows[0]["nlri_str"] == "11.0.0.0/16"
    assert rows[0]["origin"] == "EGP"


def test_read_bmp_spark(spark, tmp_path):
    stream = encode_bmp_peer_up(0x0AFF0000, 65000, 1704067000)
    for i in range(20):
        stream += _rm(
            0x0AFF0000 + i % 2, 65000 + i % 2, 1704067200 + i,
            nlri=[(0x0A000000 + (i % 4) * 65536, 16)],
            origin=i % 3, aspath=[(2, [100 + i % 5])], nexthop=7,
        )
    p = tmp_path / "capture.bmp"
    p.write_bytes(stream)
    df = read_bmp(spark, str(p))
    assert df.schema == MRT_SCHEMA
    rows = df.collect()
    assert len(rows) == 20
    assert {r.peer_as for r in rows} == {65000, 65001}

    from bgpexplorer_spark.operators.ingest import build_history
    from bgpexplorer_spark.sources.mrt import assign_sessions

    upd, sessions = assign_sessions(df)
    assert sessions.count() == 2
    assert build_history(upd).count() == 20


def test_bmp_roundtrip_property():
    """Property fuzz of the BMP framing + per-peer header + UPDATE walk:
    randomized frames (interleaved with junk) roundtrip exactly."""
    import random

    rng = random.Random(77)
    for trial in range(150):
        peer_ip, peer_as = rng.getrandbits(32), rng.getrandbits(32)
        ts = rng.randint(0, 2**31 - 1)
        plen = rng.randint(0, 32)
        addr = rng.getrandbits(32) & (0xFFFFFFFF << (32 - plen) if plen else 0)
        origin = rng.choice([0, 1, 2])
        stream = b""
        if rng.random() < 0.3:
            stream += bytes([rng.randint(0, 2)]) * rng.randint(1, 5)  # junk → resync
        stream += _rm(
            peer_ip, peer_as, ts,
            nlri=[(addr, plen)], origin=origin,
            aspath=[(2, [rng.getrandbits(32)])], nexthop=rng.getrandbits(32),
        )
        rows = list(parse_bmp(stream))
        assert len(rows) == 1, trial
        r = rows[0]
        assert r["addr_v4"] == addr and r["prefixlen"] == plen, trial
        assert r["peer_as"] == peer_as, trial
        assert r["origin"] == {0: "IGP", 1: "EGP", 2: "Incomplete"}[origin]
        assert int(
            r["ts"].replace(tzinfo=__import__("datetime").timezone.utc).timestamp()
        ) == ts, trial

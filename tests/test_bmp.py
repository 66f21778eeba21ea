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


# --- peer lifecycle + stats (RFC 7854 §4.8-4.10) ---------------------------


def test_peer_events_and_stats_roundtrip():
    from bgpexplorer_spark.sources.bmp import (
        encode_bmp_peer_down, encode_bmp_peer_up, encode_bmp_stats,
        parse_bmp_peer_events, parse_bmp_stats,
    )

    stream = encode_bmp_peer_up(0x0A000001, 65001, 1704067000)
    stream += encode_bmp_stats(0x0A000001, 65001, 1704067100, [(0, 42), (7, 2**40)])
    stream += b"\x99junk"  # resync survives mid-stream garbage
    stream += encode_bmp_peer_down(0x0A000001, 65001, 1704067200, 2)
    evts = list(parse_bmp_peer_events(stream))
    assert [e["event"] for e in evts] == ["up", "down"]
    assert evts[1]["reason"] == 2
    stats = list(parse_bmp_stats(stream))
    assert [(s["stat_type"], s["stat_value"]) for s in stats] == [(0, 42), (7, 2**40)]


def test_stats_truncated_tlv_not_fatal():
    from bgpexplorer_spark.sources.bmp import (
        encode_bmp_peer_up, encode_bmp_stats, parse_bmp_peer_events, parse_bmp_stats,
    )

    good = encode_bmp_stats(0x0A000001, 65001, 1704067000, [(0, 7)])
    # corrupt: claim 5 TLVs but provide 1 — the walk stops, stream continues
    bad = bytearray(good)
    bad[6 + 42 : 6 + 46] = (5).to_bytes(4, "big")
    stream = bytes(bad) + encode_bmp_peer_up(0x0A000002, 65002, 1704067100)
    stats = list(parse_bmp_stats(stream))
    assert [(s["stat_type"], s["stat_value"]) for s in stats] == [(0, 7)]
    assert [e["event"] for e in parse_bmp_peer_events(stream)] == ["up"]


def test_session_intervals_pairing(spark, tmp_path):
    from bgpexplorer_spark.sources.bmp import (
        encode_bmp_peer_down, encode_bmp_peer_up,
        peer_session_intervals, read_bmp_peer_events,
    )

    stream = encode_bmp_peer_up(0x0A000001, 65001, 1000000000)
    stream += encode_bmp_peer_down(0x0A000001, 65001, 1000000100, 3)
    stream += encode_bmp_peer_up(0x0A000001, 65001, 1000000200)  # reopened
    stream += encode_bmp_peer_up(0x0A000002, 65002, 1000000050)  # never down
    f = tmp_path / "cap.bmp"
    f.write_bytes(stream)
    iv = peer_session_intervals(read_bmp_peer_events(spark, str(f))).collect()
    by_peer = {}
    for r in iv:
        by_peer.setdefault(r.peer_addr, []).append(r)
    one = sorted(by_peer["10.0.0.1"], key=lambda r: r.up_ts)
    assert len(one) == 2
    assert one[0].down_reason == 3 and one[0].down_ts is not None
    assert one[1].down_ts is None  # open session
    assert by_peer["10.0.0.2"][0].down_ts is None


def test_lifecycle_and_stats_fuzz_roundtrip():
    """Property fuzz of the lifecycle/stats walk: 150 randomized
    up/down/stats frames interleaved with junk and Route Monitoring
    roundtrip exactly, in order, per parser."""
    import random

    from bgpexplorer_spark.sources.bmp import (
        encode_bmp_peer_down, encode_bmp_peer_up, encode_bmp_stats,
        encode_bmp_route_monitoring, parse_bmp_peer_events, parse_bmp_stats,
    )
    from bgpexplorer_spark.sources.mrt import encode_bgp_update_body

    rng = random.Random(41)
    stream = b""
    want_events, want_stats = [], []
    for i in range(150):
        ip, asn, ts = rng.randrange(2**32), rng.randrange(1, 2**31), 1704067000 + i
        kind = rng.randrange(4)
        if kind == 0:
            stream += encode_bmp_peer_up(ip, asn, ts)
            want_events.append(("up", asn, None))
        elif kind == 1:
            reason = rng.randrange(1, 7)
            stream += encode_bmp_peer_down(ip, asn, ts, reason)
            want_events.append(("down", asn, reason))
        elif kind == 2:
            stats = [
                (rng.choice([0, 1, 2, 7, 8]), rng.randrange(2**31))
                for _ in range(rng.randrange(0, 5))
            ]
            stream += encode_bmp_stats(ip, asn, ts, stats)
            want_stats.extend((asn, st, v) for st, v in stats)
        else:
            body = encode_bgp_update_body(
                nlri=[(rng.randrange(2**32) & 0xFFFF0000, 16)],
                origin=0, aspath=[(2, [100])], nexthop=0x01010101,
            )
            stream += encode_bmp_route_monitoring(ip, asn, ts, body)
        if rng.random() < 0.3:
            stream += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 5)))
    got_events = [
        (e["event"], e["peer_as"], e["reason"]) for e in parse_bmp_peer_events(stream)
    ]
    got_stats = [
        (s["peer_as"], s["stat_type"], s["stat_value"]) for s in parse_bmp_stats(stream)
    ]
    assert got_events == want_events
    assert got_stats == want_stats


# --- hypothesis byte-flip sweep over the framing path ----------------------
# Malformed captures are common in the wild; no single corrupted byte may
# crash the decoders or abort the rest of the capture (VERDICT r05 item 9).

from hypothesis import given, settings, strategies as st  # noqa: E402

from bgpexplorer_spark.sources.bmp import (  # noqa: E402
    encode_bmp_peer_down,
    encode_bmp_stats,
    parse_bmp_peer_events,
    parse_bmp_stats,
)


def _valid_frames(n_groups: int) -> list[bytes]:
    frames = []
    for i in range(n_groups):
        peer, asn, ts = 0x0AFF0000 + i, 65000 + i, 1704067100 + i
        frames.append(encode_bmp_peer_up(peer, asn, ts))
        frames.append(_rm(
            peer, asn, ts + 1,
            nlri=[(0x0A000000 + (i << 16), 16)], origin=i % 3,
            aspath=[(2, [100 + i])], nexthop=0xC0000201,
        ))
        frames.append(encode_bmp_stats(peer, asn, ts + 2, [(0, 5 + i)]))
        frames.append(encode_bmp_peer_down(peer, asn, ts + 3, reason=2))
    return frames


_FRAMES = _valid_frames(3)
_BASE = b"".join(_FRAMES)
# byte offset where each frame ends, aligned with the peer index i//4
_FRAME_ENDS = []
_acc = 0
for _f in _FRAMES:
    _acc += len(_f)
    _FRAME_ENDS.append(_acc)


@settings(max_examples=250, deadline=None)
@given(
    pos=st.integers(0, len(_BASE) - 1),
    newbyte=st.integers(0, 255),
)
def test_bmp_byte_flip_never_raises(pos, newbyte):
    """Flip ONE byte anywhere in a 12-frame capture: every parser must
    terminate without an unhandled raise, and — since the walk resyncs
    instead of aborting — every frame that ends strictly BEFORE the
    corrupted byte still decodes (a flip can only eat forward; spurious
    extra rows from re-synced garbage are allowed, lost prefixes are
    not)."""
    data = _BASE[:pos] + bytes([newbyte]) + _BASE[pos + 1 :]
    rows = list(parse_bmp(data))
    events = list(parse_bmp_peer_events(data))
    stats = list(parse_bmp_stats(data))
    sessions = parse_bmp_sessions(data)

    got_rm = {r["peer_as"] for r in rows}
    got_ev = {(e["event"], e["peer_as"]) for e in events}
    got_st = {s["peer_as"] for s in stats}
    got_sess = set(sessions)
    for k, end in enumerate(_FRAME_ENDS):
        if end > pos:
            break  # this frame contains or follows the flip
        i, kind = k // 4, k % 4
        peer_as = 65000 + i
        if kind == 0:
            assert ("up", peer_as) in got_ev
            assert (f"10.255.0.{i}", peer_as) in got_sess
        elif kind == 1:
            assert peer_as in got_rm
        elif kind == 2:
            assert peer_as in got_st
        else:
            assert ("down", peer_as) in got_ev


@settings(max_examples=120, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64), cut=st.integers(0, len(_BASE)))
def test_bmp_junk_injection_and_truncation(junk, cut):
    """Arbitrary junk between frames resyncs; truncation mid-frame stops
    cleanly at the last whole frame. Never raises, never loops."""
    data = _BASE[:cut] + junk + _BASE[cut:]
    for parser in (parse_bmp, parse_bmp_peer_events, parse_bmp_stats):
        list(parser(data))
    truncated = _BASE[:cut]
    for parser in (parse_bmp, parse_bmp_peer_events, parse_bmp_stats):
        list(parser(truncated))


def test_bmp_corrupt_length_resyncs_not_aborts():
    """A corrupted LENGTH field (the nastiest flip: version byte still 3,
    length now implausible) must not discard the rest of the capture —
    the walk resyncs and later frames decode."""
    f1 = _rm(0x0AFF0001, 65010, 1704067200,
             nlri=[(0x0A000000, 8)], origin=0,
             aspath=[(2, [100])], nexthop=1)
    f2 = _rm(0x0AFF0002, 65011, 1704067300,
             nlri=[(0x0B000000, 8)], origin=1,
             aspath=[(2, [200])], nexthop=2)
    corrupted = bytearray(f1 + f2)
    corrupted[1:5] = (0xFFFFFFFF).to_bytes(4, "big")  # giant bogus length
    rows = list(parse_bmp(bytes(corrupted)))
    assert [r["peer_as"] for r in rows] == [65011]  # f2 survives
    undersized = bytearray(f1 + f2)
    undersized[1:5] = (3).to_bytes(4, "big")  # < header size
    rows2 = list(parse_bmp(bytes(undersized)))
    assert len(rows2) >= 1  # resync finds at least f2


def test_bmp_peers_matches_decoded_distinct(spark, tmp_path):
    """bmp_peers (the sessions-dimension scan) must see exactly the
    peers read_bmp's rows see — Route Monitoring only; a peer that only
    ever sent lifecycle/stats frames emits no rows and must NOT appear."""
    from bgpexplorer_spark.sources.bmp import bmp_peers, read_bmp

    stream = encode_bmp_peer_up(0x0AFF0009, 65009, 1704067000)  # rows: none
    for i in range(15):
        stream += _rm(
            0x0AFF0000 + i % 3, 65000 + i % 3, 1704067200 + i,
            nlri=[(0x0A000000 + (i % 4) * 65536, 16)],
            origin=i % 3, aspath=[(2, [100 + i])], nexthop=7,
        )
    p = tmp_path / "cap.bmp"
    p.write_bytes(stream)
    full = {
        (r.peer_addr, r.peer_as)
        for r in read_bmp(spark, str(p)).select("peer_addr", "peer_as")
        .distinct().collect()
    }
    skim = {(r.peer_addr, r.peer_as) for r in bmp_peers(spark, str(p)).collect()}
    assert skim == full and ("10.255.0.9", 65009) not in skim

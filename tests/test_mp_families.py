"""Full multiprotocol NLRI family matrix (SURVEY §1.1 — the 15 RIBs the
reference ingests, src/bgprib.rs:807-821): wire decode of labeled
unicast (RFC 8277), VPN unicast/multicast (RFC 4364), MDT (RFC 6037),
VPLS (RFC 4761), EVPN (RFC 7432), MVPN (RFC 6514), and FlowSpec
(RFC 8955) through the shared parse_bgp_update walk, with canonical
nlri_str forms matching the filter fixtures (tests/ribdata.py)."""

from __future__ import annotations

import datetime as dt
import struct

from bgpexplorer_spark.sources.mrt import (
    encode_bgp_update_body,
    encode_evpn_nlri,
    encode_flowspec_nlri,
    encode_labeled_nlri,
    encode_mdt_nlri,
    encode_mvpn_nlri,
    encode_rd,
    encode_vpls_nlri,
    parse_bgp_update,
)

_TS = dt.datetime(2024, 1, 1)


def _rows(body: bytes, addpath: bool = False) -> list[dict]:
    return list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1", 65001,
                                 addpath=addpath))


def _mp_body(afi, safi, payload, nh=b"\x0a\x00\x00\x01", **kw):
    return encode_bgp_update_body(
        origin=0, aspath=[(2, [65001])], mp_reach=(afi, safi, nh, payload), **kw
    )


def test_vpnv4_unicast():
    payload = encode_labeled_nlri([100], 0x0A000000, 24, rd=(100, 1000))
    # VPN nexthop carries an 8-byte RD prefix (RFC 4364 §4.3.2)
    rows = _rows(_mp_body(1, 128, payload, nh=bytes(8) + b"\x0a\x00\x00\x01"))
    [r] = rows
    assert r["rib"] == "vpnv4u"
    assert r["nlri_str"] == "L100:100:1000:10.0.0.0/24"
    assert (r["rd_hi"], r["rd_lo"]) == (100, 1000)
    assert r["labels"] == [100]
    assert (r["addr_v4"], r["prefixlen"]) == (0x0A000000, 24)
    assert r["nexthop_v4"] == 0x0A000001


def test_vpnv6_unicast_and_multicast():
    v6 = bytes([0x2C, 0x0A]) + bytes(14)
    payload = encode_labeled_nlri([7, 8], v6, 64, v6=True, rd=(200, 5))
    [r] = _rows(_mp_body(2, 128, payload, nh=bytes(8) + bytes(16)))
    assert r["rib"] == "vpnv6u" and r["labels"] == [7, 8]
    assert r["nlri_str"] == "L7,8:200:5:2c0a::/64"
    [r] = _rows(_mp_body(2, 129, payload, nh=bytes(8) + bytes(16)))
    assert r["rib"] == "vpnv6m"


def test_labeled_unicast_both_families():
    [r] = _rows(_mp_body(1, 4, encode_labeled_nlri([33], 0x0B000000, 16)))
    assert (r["rib"], r["labels"], r["nlri_str"]) == (
        "ipv4lu", [33], "L33:11.0.0.0/16")
    v6 = bytes([0x2C, 0x0B]) + bytes(14)
    [r] = _rows(_mp_body(2, 4, encode_labeled_nlri([44], v6, 32, v6=True),
                         nh=bytes(16)))
    assert (r["rib"], r["labels"], r["nlri_str"]) == (
        "ipv6lu", [44], "L44:2c0b::/32")


def test_ip_form_rd_roundtrip():
    from bgpexplorer_spark.functions.codecs import parse_rd

    hi, lo = parse_rd("1.2.3.4:5")
    assert encode_rd(hi, lo)[:2] == b"\x00\x01"  # type-1 wire RD
    payload = encode_labeled_nlri([9], 0x0A000000, 24, rd=(hi, lo))
    [r] = _rows(_mp_body(1, 128, payload, nh=bytes(8) + b"\x0a\x00\x00\x01"))
    assert (r["rd_hi"], r["rd_lo"]) == (hi, lo)


def test_mdt():
    payload = encode_mdt_nlri((1, 1), 0x0A010101, 0xE8010101)
    [r] = _rows(_mp_body(1, 66, payload))
    assert r["rib"] == "ipv4mdt"
    assert r["nlri_str"] == "1:1:10.1.1.1/32:G232.1.1.1"
    assert r["mdt_group_v4"] == 0xE8010101
    assert (r["addr_v4"], r["prefixlen"]) == (0x0A010101, 32)


def test_vpls():
    payload = encode_vpls_nlri((2, 2), ve_id=77, offset=100, vrange=200,
                               label_base=4096)
    [r] = _rows(_mp_body(25, 65, payload))
    assert r["rib"] == "l2vpls"
    assert r["nlri_str"] == "L2:77:100-200:2:2:0.0.0.0/0"
    assert (r["l2_site"], r["l2_offset"], r["l2_range"]) == (77, 100, 200)
    assert r["labels"] == [4096]


def test_evpn_types():
    mac = bytes([0, 0x11, 0x22, 0x33, 0x44, 0x55])
    t2 = encode_evpn_nlri(2, (1, 1), mac=mac, ip=b"\x0a\x00\x00\x01", label=9)
    t3 = encode_evpn_nlri(3, (2, 2), ip=b"\x0a\x00\x00\x02")
    t5 = encode_evpn_nlri(5, (3, 3), ip=b"\x0a\x00\x00\x00", plen=24)
    rows = _rows(_mp_body(25, 70, t2 + t3 + t5))
    assert [r["rib"] for r in rows] == ["evpn"] * 3
    assert [r["evpn_type"] for r in rows] == [2, 3, 5]
    assert rows[0]["nlri_str"] == "E2:1:1:10.0.0.1/32"
    assert rows[1]["nlri_str"] == "E3:2:2:10.0.0.2/32"
    assert rows[2]["nlri_str"] == "E5:3:3:10.0.0.0/24"
    assert (rows[2]["addr_v4"], rows[2]["prefixlen"]) == (0x0A000000, 24)


def test_mvpn_types():
    t1 = encode_mvpn_nlri(1, (1, 1), originator=0x0A000009)
    t5 = encode_mvpn_nlri(5, (2, 2), source=0x0A000001, group=0xE8010101)
    rows = _rows(_mp_body(1, 5, t1 + t5))
    assert [r["mvpn_type"] for r in rows] == [1, 5]
    assert rows[0]["nlri_str"] == "T1:1:1:10.0.0.9/32"
    assert rows[0]["mvpn_originator_v4"] == 0x0A000009
    assert rows[1]["nlri_str"] == "T5:2:2:10.0.0.1/32"
    assert (rows[1]["mvpn_source_v4"], rows[1]["mvpn_group_v4"]) == (
        0x0A000001, 0xE8010101)


def test_flowspec_dst_prefix():
    [r] = _rows(_mp_body(1, 133, encode_flowspec_nlri(0x0B000000, 24)))
    assert (r["rib"], r["nlri_str"]) == ("fs4u", "FS:11.0.0.0/24")
    assert (r["addr_v4"], r["prefixlen"]) == (0x0B000000, 24)


def test_mp_unreach_withdraws():
    payload = encode_labeled_nlri([100], 0x0A000000, 24, rd=(100, 1000))
    body = encode_bgp_update_body(mp_unreach=(1, 128, payload))
    [r] = _rows(body)
    assert r["op"] == "withdraw"
    assert r["rib"] == "vpnv4u" and r["nlri_str"] == "L100:100:1000:10.0.0.0/24"


def test_addpath_vpn():
    payload = encode_labeled_nlri([5], 0x0A000000, 24, rd=(9, 9), path_id=42)
    [r] = _rows(_mp_body(1, 128, payload, nh=bytes(8) + b"\x0a\x00\x00\x01"),
                addpath=True)
    assert (r["path_id"], r["rib"]) == (42, "vpnv4u")


def test_unknown_family_dropped():
    rows = _rows(_mp_body(99, 99, b"\x01\x02\x03"))
    assert rows == []


def test_v6_unicast_unchanged():
    """The existing v6u path still decodes through the generalized walk."""
    body = encode_bgp_update_body(
        origin=0, aspath=[(2, [65001])],
        nlri6=[(bytes([0x2C, 0x0C]) + bytes(14), 32)],
        nexthop6=bytes([0xFE, 0x80]) + bytes(14),
    )
    [r] = _rows(body)
    assert (r["rib"], r["nlri_str"]) == ("ipv6u", "2c0c::/32")
    assert r["nexthop_v6"] == bytes([0xFE, 0x80]) + bytes(14)


def test_td2_rib_generic_vpn_and_evpn():
    """TABLE_DUMP_V2 RIB_GENERIC (RFC 6396 §4.3.3): full-RIB snapshot
    entries for VPN and EVPN families through the same family dispatch
    the live walk uses."""
    from bgpexplorer_spark.sources.mrt import (
        encode_peer_index,
        encode_td2_generic,
        parse_mrt,
    )

    data = encode_peer_index([(0x0A000001, 65001), (0x0A000002, 65002)])
    data += encode_td2_generic(
        1, 1, 128,
        encode_labeled_nlri([55], 0x0A000000, 24, rd=(7, 8)),
        [
            {"peer_idx": 0, "orig_time": 1704067200, "origin": 0,
             "aspath": [(2, [65001])], "nexthop": 0x0A000001},
            {"peer_idx": 1, "orig_time": 1704067260, "origin": 0,
             "aspath": [(2, [65002])], "nexthop": 0x0A000002},
        ],
    )
    data += encode_td2_generic(
        2, 25, 70,
        encode_evpn_nlri(3, (9, 9), ip=b"\x0a\x00\x00\x05"),
        [{"peer_idx": 0, "orig_time": 1704067300, "origin": 0,
          "aspath": [(2, [65001])], "nexthop": 0x0A000001}],
    )
    rows = list(parse_mrt(data))
    assert len(rows) == 3
    assert {r["nlri_str"] for r in rows[:2]} == {"L55:7:8:10.0.0.0/24"}
    assert {r["peer_as"] for r in rows[:2]} == {65001, 65002}
    assert rows[0]["rib"] == "vpnv4u" and rows[0]["labels"] == [55]
    assert rows[2]["rib"] == "evpn"
    assert rows[2]["nlri_str"] == "E3:9:9:10.0.0.5/32"


def test_mvpn_all_types_decode():
    """Types 2/3/4/6/7 (RFC 6514 §4): RD always; t3 source+group+
    originator; t4's RD and S-PMSI source/group come from the embedded
    route, originator from the leaf; t6/t7 carry the RP in the source
    slot."""
    t2 = encode_mvpn_nlri(2, (4, 4), body=b"\x00\x00\xfd\xe9")
    t3 = encode_mvpn_nlri(3, (5, 5), source=0x0A000001, group=0xE8010101,
                          originator=0x0A000099)
    spmsi = encode_mvpn_nlri(3, (6, 6), source=0x0A000002, group=0xE8010102,
                             originator=0x0A000098)
    t4 = encode_mvpn_nlri(4, (0, 0), spmsi=spmsi, originator=0x0A000097)
    t6 = encode_mvpn_nlri(6, (7, 7), source_as=65001, source=0x0A000003,
                          group=0xE8010103)
    rows = _rows(_mp_body(1, 5, t2 + t3 + t4 + t6))
    assert [r["mvpn_type"] for r in rows] == [2, 3, 4, 6]
    assert rows[0]["nlri_str"] == "T2:4:4:0.0.0.0/0"
    r3 = rows[1]
    assert (r3["mvpn_source_v4"], r3["mvpn_group_v4"],
            r3["mvpn_originator_v4"]) == (0x0A000001, 0xE8010101, 0x0A000099)
    assert r3["nlri_str"] == "T3:5:5:10.0.0.1/32"
    r4 = rows[2]
    assert (r4["rd_hi"], r4["rd_lo"]) == (6, 6)  # embedded route's RD
    assert r4["mvpn_originator_v4"] == 0x0A000097  # the LEAF originator
    assert (r4["mvpn_source_v4"], r4["mvpn_group_v4"]) == (
        0x0A000002, 0xE8010102)
    r6 = rows[3]
    assert (r6["mvpn_source_v4"], r6["mvpn_group_v4"]) == (
        0x0A000003, 0xE8010103)
    assert r6["nlri_str"] == "T6:7:7:10.0.0.3/32"


def test_evpn_t1_t4_and_t5_gateway():
    """t1 is rd-only with the A-D label kept; t4 matches the ES
    originator IP; t5's matchable address is the GATEWAY
    (src/ribfilter.rs:424-431) while the display keeps the prefix."""
    t1 = encode_evpn_nlri(1, (4, 4), body=struct.pack(">HHHHH", 0, 0, 0, 0, 0)
                          + bytes(4) + b"\x00\x01\x01")
    t4 = encode_evpn_nlri(4, (5, 5), body=bytes(10) + bytes([32])
                          + b"\x0a\x00\x00\x07")
    t5 = encode_evpn_nlri(5, (6, 6), ip=b"\x0b\x00\x00\x00", plen=24,
                          gw=b"\x0a\x00\x00\x63", label=3)
    rows = _rows(_mp_body(25, 70, t1 + t4 + t5))
    assert [r["evpn_type"] for r in rows] == [1, 4, 5]
    assert rows[0]["nlri_str"] == "E1:4:4:0.0.0.0/0"
    assert rows[1]["nlri_str"] == "E4:5:5:10.0.0.7/32"
    assert rows[1]["addr_v4"] == 0x0A000007
    r5 = rows[2]
    assert r5["nlri_str"] == "E5:6:6:11.0.0.0/24"   # display: the prefix
    assert r5["addr_v4"] == 0x0A000063               # match key: the GW
    assert r5["prefixlen"] == 24


def test_parse_mrt_never_raises_on_corrupted_archives():
    """Dump archives contain junk: bit-flipped records must be skipped,
    never abort the file (which would kill a whole Arrow batch in
    read_mrt). Covers every family decoder plus TD2 paths."""
    import random

    from bgpexplorer_spark.sources.mrt import (
        encode_mdt_nlri,
        encode_peer_index,
        encode_td2_generic,
        encode_update,
        parse_mrt,
        parse_mrt_state_changes,
    )

    base = b""
    for i in range(12):
        fam = i % 6
        kw = dict(ts_sec=1704067200 + i, peer_as=65000, peer_ip=0x0AFF0001,
                  origin=0, aspath=[(2, [65000])])
        mp = [
            (1, 128, bytes(8) + b"\x0a\x00\x00\x01",
             encode_labeled_nlri([16], 0x0A000000, 24, rd=(1, 2))),
            (1, 4, b"\x0a\x00\x00\x01", encode_labeled_nlri([33], 0x0B000000, 16)),
            (1, 66, b"\x0a\x00\x00\x01",
             encode_mdt_nlri((1, 2), 0x0A010101, 0xE8010101)),
            (25, 65, b"\x0a\x00\x00\x01",
             encode_vpls_nlri((2, 2), 1, 0, 8, 100)),
            (25, 70, b"\x0a\x00\x00\x01",
             encode_evpn_nlri(2, (1, 1), mac=bytes(6), ip=b"\x0a\x00\x00\x01")),
            (1, 5, b"\x0a\x00\x00\x01",
             encode_mvpn_nlri(5, (3, 3), source=0x0A000001, group=0xE8010101)),
        ][fam]
        base += encode_update(**kw, mp_reach=mp)
    base += encode_peer_index([(0x0A000001, 65001)])
    base += encode_td2_generic(
        1, 1, 128, encode_labeled_nlri([5], 0x0A000000, 24, rd=(1, 1)),
        [{"peer_idx": 0, "orig_time": 1704067200, "origin": 0,
          "aspath": [(2, [65001])], "nexthop": 0x0A000001}])

    rnd = random.Random(7)
    for _ in range(400):
        b = bytearray(base)
        for _f in range(rnd.randint(1, 8)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        list(parse_mrt(bytes(b)))            # must never raise
        list(parse_mrt_state_changes(bytes(b)))


def test_parse_bmp_never_raises_on_corrupted_streams():
    import random

    from bgpexplorer_spark.sources.bmp import (
        encode_bmp_route_monitoring,
        parse_bmp,
    )

    base = b"".join(
        encode_bmp_route_monitoring(
            0x0A000001, 65001, 1704067200 + i,
            encode_bgp_update_body(
                nlri=[(0x0B000000 + i * 65536, 24)], origin=0,
                aspath=[(2, [65001])], nexthop=0x0A000001,
            ),
        )
        for i in range(8)
    )
    rnd = random.Random(8)
    for _ in range(400):
        b = bytearray(base)
        for _f in range(rnd.randint(1, 8)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        list(parse_bmp(bytes(b)))  # must never raise


def test_as4path_reconstruction():
    """RFC 6793 §4.2.3: a 2-octet session's AS_PATH carries AS_TRANS
    placeholders; AS4_PATH restores the true 4-octet tail, leading
    excess ASNs of AS_PATH are kept, AS_SETs are atomic, a too-long
    AS4_PATH is ignored, and AS4_AGGREGATOR replaces an AS_TRANS
    aggregator."""
    body = encode_bgp_update_body(
        nlri=[(0x0B000000, 24)], origin=0,
        aspath16=[(2, [65001, 23456, 23456])],
        as4path=[(2, [400000, 500000])],
        aggregator16=(23456, 0x0A000001),
        as4aggregator=(400000, 0x0A000001),
        nexthop=0x0A000001,
    )
    [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1", 65001,
                                as4=False))
    assert [(s["kind"], s["asns"]) for s in r["aspath"]] == [
        ("Seq", [65001]), ("Seq", [400000, 500000]),
    ]
    assert r["aggregator_as"] == 400000

    # AS_SET is atomic: set counts as ONE AS number and is never split
    body = encode_bgp_update_body(
        nlri=[(0x0B000000, 24)], origin=0,
        aspath16=[(1, [65001, 65002]), (2, [23456, 23456])],
        as4path=[(2, [400000, 500000])],
        nexthop=0x0A000001,
    )
    [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1", 65001,
                                as4=False))
    assert [(s["kind"], s["asns"]) for s in r["aspath"]] == [
        ("Set", [65001, 65002]), ("Seq", [400000, 500000]),
    ]

    # AS4_PATH longer than AS_PATH: ignored (RFC 6793 §4.2.3)
    body = encode_bgp_update_body(
        nlri=[(0x0B000000, 24)], origin=0,
        aspath16=[(2, [65001])],
        as4path=[(2, [400000, 500000])],
        nexthop=0x0A000001,
    )
    [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1", 65001,
                                as4=False))
    assert [(s["kind"], s["asns"]) for s in r["aspath"]] == [("Seq", [65001])]

    # a 4-octet session never consults AS4_PATH
    body = encode_bgp_update_body(
        nlri=[(0x0B000000, 24)], origin=0,
        aspath=[(2, [65001, 400000])],
        nexthop=0x0A000001,
    )
    [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1", 65001,
                                as4=True))
    assert [(s["kind"], s["asns"]) for s in r["aspath"]] == [
        ("Seq", [65001, 400000])]


def _one(afi, safi, payload, nh=b"\x0a\x00\x00\x01"):
    [r] = _rows(_mp_body(afi, safi, payload, nh=nh))
    return r


def test_family_roundtrip_property():
    """Property round-trips for the family codecs: random RDs (all three
    wire types), label stacks, prefixes, and MVPN/VPLS fields survive
    encode → UPDATE → decode exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bgpexplorer_spark.functions.codecs import RD_IP_FLAG

    rd_plain = st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFFFFFF))
    rd_ip = st.tuples(
        st.integers(0, 0xFFFFFFFF), st.integers(0, 0xFFFF)
    ).map(lambda t: (RD_IP_FLAG | (t[0] >> 16),
                     ((t[0] & 0xFFFF) << 16) | t[1]))
    rds = st.one_of(rd_plain, rd_ip)

    @settings(max_examples=60, deadline=None)
    @given(
        rd=rds,
        labels=st.lists(st.integers(0, (1 << 20) - 1), min_size=1, max_size=3),
        addr=st.integers(0, 0xFFFFFFFF),
        plen=st.integers(8, 32),
    )
    def vpn(rd, labels, addr, plen):
        addr &= (0xFFFFFFFF << (32 - plen)) & 0xFFFFFFFF
        r = _one(1, 128, encode_labeled_nlri(labels, addr, plen, rd=rd),
                 nh=bytes(8) + b"\x0a\x00\x00\x01")
        assert (r["rd_hi"], r["rd_lo"]) == rd
        assert r["labels"] == labels
        assert (r["addr_v4"], r["prefixlen"]) == (addr, plen)

    @settings(max_examples=40, deadline=None)
    @given(rd=rds, src=st.integers(0, 0xFFFFFFFF), grp=st.integers(0, 0xFFFFFFFF))
    def mvpn5(rd, src, grp):
        r = _one(1, 5, encode_mvpn_nlri(5, rd, source=src, group=grp))
        assert (r["rd_hi"], r["rd_lo"]) == rd
        assert (r["mvpn_source_v4"], r["mvpn_group_v4"]) == (src, grp)

    @settings(max_examples=40, deadline=None)
    @given(
        rd=rds, ve=st.integers(0, 0xFFFF), off=st.integers(0, 0xFFFF),
        rng=st.integers(0, 0xFFFF), base=st.integers(0, (1 << 20) - 1),
    )
    def vpls(rd, ve, off, rng, base):
        r = _one(25, 65, encode_vpls_nlri(rd, ve, off, rng, base))
        assert (r["rd_hi"], r["rd_lo"]) == rd
        assert (r["l2_site"], r["l2_offset"], r["l2_range"]) == (ve, off, rng)
        assert r["labels"] == [base]

    vpn()
    mvpn5()
    vpls()


def test_as4_merge_rfc6793_properties():
    """RFC 6793 §4.2.3 invariants over hypothesis-generated
    (AS_PATH, AS4_PATH) segment pairs: when AS_PATH carries at least as
    many AS numbers as AS4_PATH (an AS_SET counting as one), the result
    is the leading excess of AS_PATH followed by AS4_PATH verbatim and
    its AS-number count equals AS_PATH's; AS_SETs are never split; an
    over-long AS4_PATH is ignored outright; AS4_AGGREGATOR replaces the
    aggregator only when AS_PATH's aggregator is AS_TRANS."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bgpexplorer_spark.sources.mrt import _merge_as4path

    seg = st.tuples(
        st.sampled_from(["Seq", "Set"]),
        st.lists(st.integers(1, 0xFFFFFFFF), min_size=1, max_size=4),
    ).map(lambda t: {"kind": t[0], "asns": list(t[1])})
    segs = st.lists(seg, min_size=0, max_size=4)

    def count(path):
        return sum(1 if s["kind"] == "Set" else len(s["asns"]) for s in path)

    def tokens(path):
        out = []
        for s in path:
            if s["kind"] == "Set":
                out.append(("Set", tuple(s["asns"])))
            else:
                out.extend(("AS", a) for a in s["asns"])
        return out

    @settings(max_examples=250, deadline=None)
    @given(aspath=segs, as4path=segs)
    def merge(aspath, as4path):
        out = _merge_as4path(
            [dict(s) for s in aspath], [dict(s) for s in as4path]
        )
        n, n4 = count(aspath), count(as4path)
        if n4 > n:
            assert out == aspath          # over-long AS4_PATH ignored
            return
        assert count(out) == n            # length preserved (Set = 1)
        # result IS the leading (n - n4) AS numbers of AS_PATH, then
        # AS4_PATH verbatim (tokens() emits one token per AS number, so
        # slicing by n - n4 is exact) — hence no AS_SET is ever split
        assert tokens(out) == tokens(aspath)[: n - n4] + tokens(as4path)
        in_sets = [s["asns"] for s in aspath + as4path if s["kind"] == "Set"]
        for s in out:
            if s["kind"] == "Set":
                assert s["asns"] in in_sets

    @settings(max_examples=100, deadline=None)
    @given(
        aggr_as=st.one_of(st.just(23456), st.integers(1, 0xFFFF)),
        as4_as=st.integers(0x10000, 0xFFFFFFFF),
    )
    def aggregator(aggr_as, as4_as):
        body = encode_bgp_update_body(
            nlri=[(0x0B000000, 24)], origin=0,
            aspath16=[(2, [65001])],
            aggregator16=(aggr_as, 0x0A000001),
            as4aggregator=(as4_as, 0x0A000001),
            nexthop=0x0A000001,
        )
        [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1",
                                    65001, as4=False))
        assert r["aggregator_as"] == (as4_as if aggr_as == 23456 else aggr_as)

    @settings(max_examples=120, deadline=None)
    @given(
        path=st.lists(st.integers(1, 0xFFFFFFFF), min_size=1, max_size=8),
        split=st.integers(0, 8),
    )
    def wire(path, split):
        # a 2-octet speaker sends AS_PATH with AS_TRANS placeholders and
        # AS4_PATH carrying the trailing (post-split) true ASNs; the
        # leading split ASNs are recoverable only in 2-octet form
        split = min(split, len(path))
        body = encode_bgp_update_body(
            nlri=[(0x0B000000, 24)], origin=0,
            aspath16=[(2, [23456 if a > 0xFFFF else a for a in path])],
            as4path=[(2, path[split:])] if path[split:] else None,
            nexthop=0x0A000001,
        )
        [r] = list(parse_bgp_update(body, 0, len(body), _TS, "10.0.0.1",
                                    65001, as4=False))
        got = [a for s in r["aspath"] for a in s["asns"]]
        want = [23456 if a > 0xFFFF else a for a in path[:split]] \
            + path[split:]
        assert got == want

    merge()
    aggregator()
    wire()

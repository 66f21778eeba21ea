"""Property tests of the IP Column algebra vs Python's ipaddress module
(SURVEY.md §7 step 1)."""

from __future__ import annotations

import ipaddress
import random

from pyspark.sql import functions as F

from bgpexplorer_spark.functions import codecs, iputil

random.seed(42)

def test_parse_literals():
    assert iputil.parse_v4("10.1.2.3") == (10 << 24) + (1 << 16) + (2 << 8) + 3
    assert iputil.parse_v6("::1") == b"\x00" * 15 + b"\x01"
    assert iputil.v4_net_range(iputil.parse_v4("10.1.2.3"), 24) == (
        iputil.parse_v4("10.1.2.0"),
        iputil.parse_v4("10.1.2.255"),
    )
    f, l = iputil.v6_net_range(iputil.parse_v6("2c0a:dead::beef"), 64)
    assert f == iputil.parse_v6("2c0a:dead::")
    assert l == iputil.parse_v6("2c0a:dead::ffff:ffff:ffff:ffff")

def test_multicast_split():
    assert iputil.is_multicast_v4(iputil.parse_v4("224.0.0.1"))
    assert iputil.is_multicast_v4(iputil.parse_v4("239.1.2.3"))
    assert not iputil.is_multicast_v4(iputil.parse_v4("255.255.255.255"))  # broadcast excluded
    assert not iputil.is_multicast_v4(iputil.parse_v4("10.0.0.1"))
    assert iputil.is_multicast_v6(iputil.parse_v6("ff02::1"))
    assert not iputil.is_multicast_v6(iputil.parse_v6("2c0a::1"))

def test_v4_roundtrip_and_net_last(spark):
    addrs = [random.randint(0, iputil.V4_MAX) for _ in range(64)]
    rows = []
    for a in addrs:
        plen = random.randint(0, 32)
        net = ipaddress.ip_network((a, plen), strict=False)
        rows.append((int(net.network_address), plen, str(net.network_address), int(net.broadcast_address)))
    df = spark.createDataFrame(rows, "addr bigint, plen int, dotted string, want_last bigint")
    got = df.select(
        (iputil.v4_to_dotted(F.col("addr")) == F.col("dotted")).alias("fmt_ok"),
        (iputil.v4_from_dotted(F.col("dotted")) == F.col("addr")).alias("parse_ok"),
        (iputil.v4_net_last_col(F.col("addr"), F.col("plen")) == F.col("want_last")).alias("last_ok"),
    ).collect()
    assert all(r.fmt_ok and r.parse_ok and r.last_ok for r in got)

def test_v6_net_last_col(spark):
    rows = []
    for _ in range(48):
        a = random.getrandbits(128)
        plen = random.choice([0, 1, 7, 8, 9, 48, 64, 96, 127, 128])
        net = ipaddress.ip_network((a, plen), strict=False)
        rows.append(
            (int(net.network_address).to_bytes(16, "big"), plen,
             int(net.broadcast_address).to_bytes(16, "big"))
        )
    df = spark.createDataFrame(rows, "addr binary, plen int, want_last binary")
    got = df.select(
        (iputil.v6_net_last_col(F.col("addr"), F.col("plen")) == F.col("want_last")).alias("ok")
    ).collect()
    assert all(r.ok for r in got)

def test_v4_containment_predicates(spark):
    # routes: (addr, plen) canonical
    routes = ["10.0.0.1/32", "11.0.0.1/32", "10.0.0.0/24", "10.0.0.0/8", "0.0.0.0/0"]
    rows = []
    for r in routes:
        n = ipaddress.ip_network(r)
        rows.append((int(n.network_address), n.prefixlen, r))
    df = spark.createDataFrame(rows, "addr bigint, plen int, name string")

    def count_subnet(flt: str) -> int:
        n = ipaddress.ip_network(flt)
        first, last = int(n.network_address), int(n.broadcast_address)
        return df.filter(
            iputil.v4_subnet_contains(F.col("addr"), F.col("plen"), first, last, n.prefixlen)
        ).count()

    # FIXTURES F-A expectations (on the first three routes) plus extras
    assert count_subnet("10.0.0.0/25") == 1
    assert count_subnet("10.0.0.0/16") == 2
    assert count_subnet("11.0.0.0/16") == 1
    assert count_subnet("12.0.0.0/16") == 0
    assert count_subnet("0.0.0.0/0") == 5

    def supernets_of(flt: str) -> set[str]:
        n = ipaddress.ip_network(flt)
        first, last = int(n.network_address), int(n.broadcast_address)
        return {
            r.name
            for r in df.filter(
                iputil.v4_supernet_contains(F.col("addr"), F.col("plen"), first, last)
            ).collect()
        }

    # FIXTURES F-H: supernets of 10.0.0.1/32
    assert supernets_of("10.0.0.1/32") == {"10.0.0.1/32", "10.0.0.0/24", "10.0.0.0/8", "0.0.0.0/0"}

def test_codecs(spark):
    assert codecs.parse_community("100:200") == 100 * 65536 + 200
    assert codecs.parse_rd("100:1000") == (100, 1000)
    df = spark.createDataFrame([(100 * 65536 + 200,)], "c bigint")
    assert df.select(codecs.community_to_str(F.col("c")).alias("s")).first().s == "100:200"

def test_aspath_contiguous_subseq(spark):
    rows = [
        ([100, 200, 300], "a"),
        ([200, 300, 400], "b"),
        ([100, 300], "c"),
        ([], "d"),
        ([200], "e"),
    ]
    df = spark.createDataFrame(rows, "path array<bigint>, name string")

    def matching(needle):
        return {
            r.name
            for r in df.filter(codecs.array_contiguous_subseq(F.col("path"), needle)).collect()
        }

    assert matching([200, 300]) == {"a", "b"}
    assert matching([100, 200, 300]) == {"a"}
    assert matching([100, 300]) == {"c"}  # contiguous only — not 'a'
    assert matching([200]) == {"a", "b", "e"}
    assert matching([999]) == set()

def test_v6_to_str_matches_canonical(spark):
    """Property: iputil.v6_to_str (pure Column algebra) must equal
    Python's RFC 5952 canonical rendering (== Rust Ipv6Addr Display for
    every non-IPv4-mapped case; mapped renders ::ffff:a.b.c.d in both) —
    the string the reference regex-scans for v6 nexthops
    (src/ribfilter.rs:1463-1470)."""
    rng = random.Random(42)
    cases = [
        bytes(16),                                    # ::
        bytes(15) + b"\x01",                          # ::1
        bytes([0x20, 0x01, 0x0D, 0xB8] + [0] * 12),   # 2001:db8::
        bytes(10) + b"\xff\xff" + bytes([192, 0, 2, 1]),  # ::ffff:192.0.2.1
        bytes([0xFE, 0x80] + [0] * 13 + [0x42]),
        bytes([0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 3]),  # tie runs
        bytes([0, 1] * 8),                            # no zero groups? 0:1 pattern
        bytes([0, 0, 0, 1] * 4),                      # alternating zero runs
    ]
    for _ in range(60):
        b = bytearray(rng.randbytes(16))
        # bias towards zero-heavy addresses so compression paths are hit
        for i in range(16):
            if rng.random() < 0.6:
                b[i] = 0
        cases.append(bytes(b))
    def rust_render(c: bytes) -> str:
        ip = ipaddress.IPv6Address(c)
        # Rust Display renders IPv4-mapped dotted (::ffff:a.b.c.d);
        # Python keeps hex groups there — model Rust
        if ip.ipv4_mapped is not None:
            return f"::ffff:{ip.ipv4_mapped}"
        return str(ip)

    df = spark.createDataFrame([(c,) for c in cases], "addr binary")
    got = [r.s for r in df.select(iputil.v6_to_str(F.col("addr")).alias("s")).collect()]
    want = [rust_render(c) for c in cases]
    assert got == want, [
        (w, g) for w, g in zip(want, got) if w != g
    ]

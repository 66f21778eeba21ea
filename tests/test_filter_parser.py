"""Parser round-trip vectors — FIXTURES.md F-J (reference tests
src/ribfilter.rs:1656-1758)."""

from __future__ import annotations

from bgpexplorer_spark.filterlang.terms import (
    ASPathTerm,
    CommunityTerm,
    ExtCommTerm,
    NH4Term,
    NH6Term,
    NumTerm,
    RDTerm,
    RegexTerm,
    V4Term,
    V6Term,
    parse_filter,
    parse_item,
)
from bgpexplorer_spark.functions.iputil import parse_v4, parse_v6

def test_v4_host_and_net():
    assert parse_item("10.6.7.8") == V4Term(parse_v4("10.6.7.8"), 32, False)
    assert parse_item("10.6.7.0/24") == V4Term(parse_v4("10.6.7.0"), 24, False)
    # non-canonical input is canonicalized to the network address
    assert parse_item("10.6.7.8/24") == V4Term(parse_v4("10.6.7.0"), 24, False)

def test_v4_multicast():
    t = parse_item("224.1.2.0/24")
    assert isinstance(t, V4Term) and t.multicast
    assert not parse_item("223.255.255.0/24").multicast
    # 224.0.0.0/3 is NOT within 224.0.0.0/4 → not multicast-classified
    assert not parse_item("224.0.0.0/3").multicast

def test_v6():
    assert parse_item("2c0a:dead:beef:b00b::beef:b00b") == V6Term(
        parse_v6("2c0a:dead:beef:b00b::beef:b00b"), 128, False
    )
    assert parse_item("2c0a:dead:beef:b00b::/64") == V6Term(
        parse_v6("2c0a:dead:beef:b00b::"), 64, False
    )
    assert parse_item("ff02::/16").multicast

def test_nh():
    assert parse_item("nh:10.6.7.0/24") == NH4Term(parse_v4("10.6.7.0"), 24)
    assert parse_item("nh:10.6.7.1") == NH4Term(parse_v4("10.6.7.1"), 32)
    assert parse_item("nh:2c0a:dead:beef:b00b::/64") == NH6Term(
        parse_v6("2c0a:dead:beef:b00b::"), 64
    )

def test_rd():
    assert parse_item("rd:100:1000") == RDTerm(100, 1000)
    ip = parse_v4("1.2.3.4")
    assert parse_item("rd:1.2.3.4:5") == RDTerm(0x10000 | (ip >> 16), ((ip & 0xFFFF) << 16) | 5)

def test_aspath_forms():
    for s in ("as:", "as:^", "as:^$", "as:$"):
        assert parse_item(s) == ASPathTerm("empty"), s
    assert parse_item("as:2345") == ASPathTerm("contains", (2345,))
    assert parse_item("as:100,2345") == ASPathTerm("contains", (100, 2345))
    assert parse_item("as:^2345") == ASPathTerm("startswith", (2345,))
    assert parse_item("as:2345$") == ASPathTerm("endswith", (2345,))
    assert parse_item("as:^100,2345$") == ASPathTerm("full", (100, 2345))

def test_community():
    assert parse_item("community:100:2345") == CommunityTerm((100 << 16) | 2345)
    # any c*: prefix accepted (reference regex ^c[^:]*:)
    assert parse_item("comm:1:2") == CommunityTerm((1 << 16) | 2)

def test_rt():
    assert parse_item("rt:100") == ExtCommTerm("num", n=100)
    assert parse_item("rt:400:500") == ExtCommTerm("pair", a=400, b=500)
    ip = parse_v4("1.2.3.4")
    assert parse_item("rt:1.2.3.4") == ExtCommTerm("ip", ip_first=ip)
    assert parse_item("target:1.2.3.4:7") == ExtCommTerm("ipnum", n=7, ip_first=ip)
    assert parse_item("ext-target:9:9") == ExtCommTerm("pair", a=9, b=9)

def test_num_regex_and_junk():
    assert parse_item("42") == NumTerm(42)
    assert parse_item("re:10\\.0\\.0") == RegexTerm("10\\.0\\.0")
    assert parse_item("100:200") is None     # not valid v6, nothing else matches
    assert parse_item("hello") is None

def test_hexy_tokens_dropped_by_ipv6_arm():
    """The reference tries the IPv6 regex right after IPv4 and early-returns
    None on parse failure — so all-hex-and-colon tokens never reach the
    community/rt arms (src/ribfilter.rs:945-1040)."""
    assert parse_item("c:100:200") is None    # hexy → tried as v6, dropped
    assert parse_item("cafe:1:2") is None
    assert parse_item("ad:1:2") is None
    # non-hex letters still dispatch past the v6 arm
    assert parse_item("comm:100:200") == CommunityTerm((100 << 16) | 200)

def test_as_double_caret_is_contains():
    # reference compares the caret group against exactly '^'
    assert parse_item("as:^^100") == ASPathTerm("contains", (100,))
    assert parse_item("as:^^100$") == ASPathTerm("endswith", (100,))

def test_rd_ip_form_masks_assigned_number():
    ip = parse_v4("1.2.3.4")
    # vls[4] & 0xffff: 65541 = 0x10005 → masked to 5
    assert parse_item("rd:1.2.3.4:65541") == RDTerm(
        0x10000 | (ip >> 16), ((ip & 0xFFFF) << 16) | 5
    )

def test_polarity():
    terms = parse_filter("+10.0.0.0/8 -as:100 42 junkjunk")
    assert len(terms) == 3
    assert not terms[0].negated and isinstance(terms[0].item, V4Term)
    assert terms[1].negated and terms[1].item == ASPathTerm("contains", (100,))
    assert not terms[2].negated and terms[2].item == NumTerm(42)

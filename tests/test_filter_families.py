"""Filter semantics for the remaining RIB families: ipv6, labeled v6,
l2vpls, evpn, mdt, plus RD IP-form, rt: num/ip forms, nexthop v6, regex
attrs, multicast gating (SURVEY §2.3; key dispatch
src/ribfilter.rs:218-540)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bgpexplorer_spark.filterlang.compile import matches
from bgpexplorer_spark.operators.ingest import build_history

from tests.ribdata import make_updates, u

def _hist(spark, rows):
    return build_history(make_updates(spark, rows))

def _nlris(hist, flt, rib, supernet=False):
    return {
        r.nlri_str
        for r in hist.filter(F.col("rib") == rib)
        .filter(matches(flt, rib, supernet))
        .select("nlri_str")
        .collect()
    }

# --- ipv6u ------------------------------------------------------------------

@pytest.fixture(scope="module")
def rib_v6(spark):
    return _hist(
        spark,
        [
            u("2c0a:dead::1/128", rib="ipv6u", t=1),
            u("2c0a:dead::/64", rib="ipv6u", t=2),
            u("2c0a:beef::/64", rib="ipv6u", t=3),
            u("ff02::1/128", rib="ipv6u", t=4),
        ],
    ).cache()

def test_v6_subnet(rib_v6):
    assert _nlris(rib_v6, "2c0a:dead::/64", "ipv6u") == {
        "2c0a:dead::1/128", "2c0a:dead::/64",
    }
    assert _nlris(rib_v6, "2c0a::/16", "ipv6u") == {
        "2c0a:dead::1/128", "2c0a:dead::/64", "2c0a:beef::/64",
    }
    assert _nlris(rib_v6, "3c0a::/16", "ipv6u") == set()

def test_v6_multicast_gate(rib_v6):
    # unicast filter never matches the multicast route; ff00::/8 filter
    # matches only it
    assert "ff02::1/128" not in _nlris(rib_v6, "::/0", "ipv6u")
    assert _nlris(rib_v6, "ff02::/16", "ipv6u") == {"ff02::1/128"}

def test_v6_num_soft(rib_v6):
    # Num vs v6 key is SOFT (src/ribfilter.rs:1409-1411): plen==n → Yes,
    # else Unknown → alone it cannot emit, so only matching plens emitted
    assert _nlris(rib_v6, "64", "ipv6u") == {"2c0a:dead::/64", "2c0a:beef::/64"}

def test_v6_supernet(rib_v6):
    got = _nlris(rib_v6, "2c0a:dead::1", "ipv6u", supernet=True)
    assert got == {"2c0a:dead::1/128", "2c0a:dead::/64"}

def test_v6_labeled_and_vpn(spark):
    hist = _hist(
        spark,
        [
            u("2c0a:dead::/64", rib="ipv6lu", labels=[5], t=1),
            u("2c0a:dead::/64", rib="vpnv6u", rd="7:7", labels=[6], t=2),
            u("2c0a:beef::/64", rib="vpnv6u", rd="8:8", labels=[7], t=3),
        ],
    )
    assert _nlris(hist, "2c0a:dead::/48", "ipv6lu") == {"L5:2c0a:dead::/64"}
    assert _nlris(hist, "rd:7:7", "vpnv6u") == {"L6:7:7:2c0a:dead::/64"}
    assert _nlris(hist, "rd:7:7 2c0a:dead::/48", "vpnv6u") == {"L6:7:7:2c0a:dead::/64"}
    assert _nlris(hist, "rd:8:8 2c0a:dead::/48", "vpnv6u") == set()

# --- l2vpls -----------------------------------------------------------------

def test_l2vpls(spark):
    hist = _hist(
        spark,
        [
            u("0.0.0.0/0", rib="l2vpls", rd="1:1", l2=(5, 0, 10), t=1),
            u("0.0.0.0/0", rib="l2vpls", rd="2:2", l2=(77, 100, 200), t=2),
        ],
    )
    # Num matches site or offset<=n<=range (HARD, src/ribfilter.rs:306-319)
    assert _nlris(hist, "5", "l2vpls") == {"L2:5:0-10:1:1:0.0.0.0/0"}
    assert _nlris(hist, "150", "l2vpls") == {"L2:77:100-200:2:2:0.0.0.0/0"}
    assert _nlris(hist, "rd:2:2", "l2vpls") == {"L2:77:100-200:2:2:0.0.0.0/0"}
    assert _nlris(hist, "999", "l2vpls") == set()

# --- evpn -------------------------------------------------------------------

def test_evpn(spark):
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", rib="evpn", rd="1:1", evpn=2, t=1),
            u("10.0.0.2/32", rib="evpn", rd="2:2", evpn=3, t=2),
            u("0.0.0.0/0", rib="evpn", rd="3:3", evpn=1, t=3),
        ],
    )
    # types 2-5: rd first, else ip host match; type 1: rd only
    assert _nlris(hist, "10.0.0.0/24", "evpn") == {
        "E2:1:1:10.0.0.1/32", "E3:2:2:10.0.0.2/32",
    }
    assert _nlris(hist, "rd:3:3", "evpn") == {"E1:3:3:0.0.0.0/0"}
    assert _nlris(hist, "10.0.0.0/24 rd:1:1", "evpn") == {"E2:1:1:10.0.0.1/32"}

# --- mdt --------------------------------------------------------------------

def test_mdt(spark):
    hist = _hist(
        spark,
        [
            u("10.1.1.1/32", rib="ipv4mdt", rd="1:1", mdt_group="232.1.1.1", t=1),
            u("10.2.2.2/32", rib="ipv4mdt", rd="2:2", mdt_group="232.2.2.2", t=2),
        ],
    )
    # majority vote over (addr prefix, group host): unicast filter matches
    # source; multicast filter matches group (src/ribfilter.rs:444-453)
    assert _nlris(hist, "10.1.0.0/16", "ipv4mdt") == {"1:1:10.1.1.1/32:G232.1.1.1"}
    assert _nlris(hist, "232.2.0.0/16", "ipv4mdt") == {"2:2:10.2.2.2/32:G232.2.2.2"}
    assert _nlris(hist, "rd:1:1", "ipv4mdt") == {"1:1:10.1.1.1/32:G232.1.1.1"}

# --- fs4u: no matching implemented (src/ribfilter.rs:454) -------------------

def test_fs4u_never_matches(spark):
    hist = _hist(spark, [u("10.0.0.0/24", rib="fs4u", t=1)])
    assert _nlris(hist, "10.0.0.0/8", "fs4u") == set()
    assert _nlris(hist, "", "fs4u") == {"10.0.0.0/24"}  # empty filter = all

# --- term forms: rd IP-form, rt variants, nh v6, regex attrs ---------------

def test_rd_ip_form(spark):
    from bgpexplorer_spark.functions.codecs import parse_rd

    hi, lo = parse_rd("1.2.3.4:5")
    rows = [u("10.0.0.1/32", rib="vpnv4u", t=1)]
    rows[0]["rd_hi"], rows[0]["rd_lo"] = hi, lo
    hist = _hist(spark, rows)
    assert hist.filter(matches("rd:1.2.3.4:5", "vpnv4u")).count() == 1
    assert hist.filter(matches("rd:1.2.3.5:5", "vpnv4u")).count() == 0

def test_rt_num_and_ip_forms(spark):
    from bgpexplorer_spark.functions.iputil import parse_v4

    ip = parse_v4("1.2.3.4")
    # ctype 1 ext-comm embedding 1.2.3.4 in (a low16, b high16) with low16(b)=7
    a = ip >> 16
    b = ((ip & 0xFFFF) << 16) | 7
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", rib="ipv4u", t=1, extcomms=[(1, 2, a, b)]),
            u("10.0.0.2/32", rib="ipv4u", t=2, extcomms=[(0, 2, 400, 500)]),
        ],
    )
    # rt:N soft: matches a, b, or b>>16
    assert hist.filter(matches("rt:400", "ipv4u")).count() == 1
    assert hist.filter(matches("rt:500", "ipv4u")).count() == 1
    # rt:A:B pair
    assert hist.filter(matches("rt:400:500", "ipv4u")).count() == 1
    # rt:IP and rt:IP:N decode the embedded address (ctype==1 only)
    assert {r.nlri_str for r in hist.filter(matches("rt:1.2.3.4", "ipv4u")).collect()} == {"10.0.0.1/32"}
    assert hist.filter(matches("rt:1.2.3.4:7", "ipv4u")).count() == 1
    assert hist.filter(matches("rt:1.2.3.4:8", "ipv4u")).count() == 0

def test_nh_v6_and_regex_attrs(spark):
    hist = _hist(
        spark,
        [
            u("2c0a::1/128", rib="ipv6u", t=1, nexthop="2001:db8::1",
              comms=[(100 << 16) | 200]),
            u("2c0a::2/128", rib="ipv6u", t=2, nexthop="2001:db9::1"),
        ],
    )
    assert hist.filter(matches("nh:2001:db8::/32", "ipv6u")).count() == 1
    assert hist.filter(matches("nh:2001::/16", "ipv6u")).count() == 2
    # regex against rendered attrs: community display "100:200"
    assert hist.filter(matches("re:100:200", "ipv6u")).count() == 1

def test_multicast_v4_classes(spark):
    hist = _hist(
        spark,
        [
            u("224.1.1.0/24", rib="ipv4m", t=1),
            u("10.0.0.0/24", rib="ipv4m", t=2),
        ],
    )
    # MCV4 filter only sees multicast routes; V4 filter only unicast
    assert _nlris(hist, "224.0.0.0/4", "ipv4m") == {"224.1.1.0/24"}
    assert _nlris(hist, "10.0.0.0/8", "ipv4m") == {"10.0.0.0/24"}
    assert _nlris(hist, "0.0.0.0/0", "ipv4m") == {"10.0.0.0/24"}  # V4 term: mc routes Unknown

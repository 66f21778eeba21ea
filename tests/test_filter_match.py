"""Filter match semantics on synthetic mini-RIBs — FIXTURES.md F-A..F-H
(reference tests src/ribfilter.rs:1760-2429)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bgpexplorer_spark.filterlang import filter_to_column
from bgpexplorer_spark.filterlang.compile import matches
from bgpexplorer_spark.operators.ingest import build_history

from tests.ribdata import make_updates, u

def _hist(spark, rows):
    return build_history(make_updates(spark, rows))

def _count(hist, flt, rib, supernet=False):
    return (
        hist.filter(F.col("rib") == rib)
        .filter(matches(flt, rib, supernet))
        .select("nlri_str")
        .distinct()
        .count()
    )

# --- F-A: ipv4u subnet matching (src/ribfilter.rs:1861-1892) ---------------

@pytest.fixture(scope="module")
def rib_fa(spark):
    return _hist(
        spark,
        [
            u("10.0.0.1/32", t=1),
            u("11.0.0.1/32", t=2),
            u("10.0.0.0/24", t=3),
        ],
    ).cache()

@pytest.mark.parametrize(
    "flt,want",
    [("10.0.0.0/25", 1), ("10.0.0.0/16", 2), ("11.0.0.0/16", 1), ("12.0.0.0/16", 0)],
)
def test_fa_subnet(rib_fa, flt, want):
    assert _count(rib_fa, flt, "ipv4u") == want

# --- F-B: vpnv4u RD + number polymorphism (src/ribfilter.rs:1894-1944) -----

@pytest.fixture(scope="module")
def rib_fb(spark):
    return _hist(
        spark,
        [
            u("10.0.0.1/32", rib="vpnv4u", rd="100:1000", t=1),
            u("11.0.0.1/32", rib="vpnv4u", rd="100:1000", t=2),
            u("10.0.0.0/24", rib="vpnv4u", rd="100:1000", t=3),
            u("10.0.0.1/32", rib="vpnv4u", rd="1001:100", t=4),
        ],
    ).cache()

@pytest.mark.parametrize(
    "flt,want",
    [
        ("10.0.0.0/25", 2),
        ("10.0.0.0/16", 3),
        ("rd:100:1000", 3),
        ("rd:100:1000 10.0.0.0/16", 2),
        ("100", 4),
        ("1001", 1),
        ("1000", 3),
    ],
)
def test_fb_rd_and_num(rib_fb, flt, want):
    assert _count(rib_fb, flt, "vpnv4u") == want

# --- F-C: regex (src/ribfilter.rs:1946-1979) -------------------------------

def test_fc_regex(rib_fb):
    assert _count(rib_fb, r"re:10\.0\.0", "vpnv4u") == 3
    assert _count(rib_fb, "rd:100:1000", "vpnv4u") == 3

# --- F-D: route-target conjunction (src/ribfilter.rs:1981-2097) ------------

def test_fd_route_target(spark):
    rt1 = [(0, 2, 200, 300)]
    rt2 = [(0, 2, 400, 500)]
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", rib="vpnv4u", rd="100:1000", t=1, extcomms=rt1),
            u("11.0.0.1/32", rib="vpnv4u", rd="100:1000", t=2, extcomms=rt1),
            u("10.0.0.0/24", rib="vpnv4u", rd="100:1000", t=3, extcomms=rt1),
            u("10.0.0.1/32", rib="vpnv4u", rd="1001:100", t=4, extcomms=rt1),
            u("10.0.0.2/32", rib="vpnv4u", rd="100:1000", t=5, extcomms=rt2),
            u("11.0.0.2/32", rib="vpnv4u", rd="100:1000", t=6, extcomms=rt2),
            u("10.0.1.0/24", rib="vpnv4u", rd="100:1000", t=7, extcomms=rt2),
            u("10.0.0.2/32", rib="vpnv4u", rd="1001:100", t=8, extcomms=rt2),
        ],
    )
    assert _count(hist, "rt:400:500 10.0.0.0/24", "vpnv4u") == 2

# --- F-E: labeled VPN scans (src/ribfilter.rs:2198-2309) -------------------

@pytest.fixture(scope="module")
def rib_fe(spark):
    rows = [
        u("10.0.0.255/32", rib="vpnv4u", rd="1:1", labels=[1], t=1),
        u("10.0.0.1/32", rib="vpnv4u", rd="1:1", labels=[2], t=2),
        u("10.0.0.1/32", rib="vpnv4u", rd="1:3", labels=[3], t=3),
        u("11.0.0.1/32", rib="vpnv4u", rd="1:4", labels=[4], t=4),
        u("10.0.0.2/32", rib="vpnv4u", rd="1:5", labels=[5], t=5),
        u("10.0.0.0/24", rib="vpnv4u", rd="1:6", labels=[6], t=6),
        u("10.0.0.0/32", rib="vpnv4u", rd="1:7", labels=[7], t=7),
        u("12.0.0.1/32", rib="vpnv4u", rd="1:4", labels=[8], t=8),
    ]
    return _hist(spark, rows).cache()

@pytest.mark.parametrize(
    "flt,want",
    [("10.0.0.0/24", 6), ("rd:1:4", 2), ("rd:1:1", 2), ("10.0.0.1", 2)],
)
def test_fe_labeled(rib_fe, flt, want):
    assert _count(rib_fe, flt, "vpnv4u") == want

# --- F-F: three-valued conjunction (src/ribfilter.rs:2311-2370) ------------

def test_ff_three_valued(spark):
    hist = _hist(
        spark,
        [
            u("10.0.0.255/32", rib="vpnv4u", rd="1:1", labels=[1], t=1,
              extcomms=[(0, 2, 1, 1)]),
            u("0.0.0.0/0", rib="vpnv4u", rd="1:1", labels=[1], t=2,
              extcomms=[(0, 2, 1, 1)]),
        ],
    )
    # r1 matches subnet+rt conjunction
    assert _count(hist, "10.0.0.0/24 rt:1:1", "vpnv4u") == 1
    # with rt 1:2 attrs nothing matches (rt term Unknown → conjunction Unknown)
    hist2 = _hist(
        spark,
        [u("10.0.0.255/32", rib="vpnv4u", rd="1:1", labels=[1], t=1,
           extcomms=[(0, 2, 1, 2)])],
    )
    assert _count(hist2, "10.0.0.0/24 rt:1:1", "vpnv4u") == 0
    # r2 (0.0.0.0/0) never Yes under subnet match, IS Yes under supernet;
    # r1 (10.0.0.255/32) does not contain 10.0.0.0/24 → No under supernet
    assert _count(hist, "10.0.0.0/24 rt:1:1", "vpnv4u", supernet=True) == 1

def test_ff_unknown_not_counted_as_no(spark):
    # soft rt: term alone can't veto: route without extcomms → Unknown → not
    # emitted; but conjunction with a No stays No (early reject)
    hist = _hist(spark, [u("10.0.0.1/32", rib="vpnv4u", rd="1:1", t=1)])
    assert _count(hist, "rt:9:9", "vpnv4u") == 0
    assert _count(hist, "11.0.0.0/8 rt:9:9", "vpnv4u") == 0

# --- F-G: MVPN type-5 (src/ribfilter.rs:2371-2429) -------------------------

@pytest.fixture(scope="module")
def rib_fg(spark):
    return _hist(
        spark,
        [
            u("0.0.0.0/0", rib="mvpn", rd="1:1", mvpn=(5, "10.1.1.1", "224.1.1.1"),
              t=1),
            u("0.0.0.0/0", rib="mvpn", rd="2:1", mvpn=(5, "11.1.1.1", "225.1.1.1"),
              t=2),
        ],
    ).cache()

@pytest.mark.parametrize(
    "flt,want_nlris",
    [
        ("10.1.1.0/24", {"T5:1:1:0.0.0.0/0"}),
        ("11.1.1.0/24", {"T5:2:1:0.0.0.0/0"}),
        ("224.1.1.0/24", {"T5:1:1:0.0.0.0/0"}),
        ("225.1.1.0/24", {"T5:2:1:0.0.0.0/0"}),
    ],
)
def test_fg_mvpn_t5(rib_fg, flt, want_nlris):
    got = {
        r.nlri_str
        for r in rib_fg.filter(matches(flt, "mvpn")).select("nlri_str").collect()
    }
    assert got == want_nlris

# --- F-H: supernet / LPM (src/ribfilter.rs:1826-1859) ----------------------

def test_fh_supernet(spark):
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", t=1),
            u("10.0.0.0/8", t=2),
            u("10.0.0.0/24", t=3),
            u("11.0.0.1/32", t=4),
        ],
    )
    got = {
        r.nlri_str
        for r in hist.filter(matches("10.0.0.1", "ipv4u", supernet=True))
        .select("nlri_str")
        .collect()
    }
    assert got == {"10.0.0.1/32", "10.0.0.0/8", "10.0.0.0/24"}

# --- polarity / negation ----------------------------------------------------

def test_negation(rib_fa):
    # Reference quirk (src/ribfilter.rs:1584-1588): key-Yes + attr-Unknown
    # returns Yes for ALL polarities, so '-<prefix>' cannot veto routes the
    # prefix matches — and key-No + '-' gives Yes. Every route matches.
    assert _count(rib_fa, "-10.0.0.0/16", "ipv4u") == 3
    assert _count(rib_fa, "-12.0.0.0/16", "ipv4u") == 3

def test_aspath_match(spark):
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", t=1, aspath=[("Seq", [100, 200, 300])]),
            u("10.0.0.2/32", t=2, aspath=[("Seq", [200, 300, 400])]),
            u("10.0.0.3/32", t=3),  # empty path
        ],
    )
    assert _count(hist, "as:200,300", "ipv4u") == 2
    assert _count(hist, "as:^100", "ipv4u") == 1
    assert _count(hist, "as:400$", "ipv4u") == 1
    assert _count(hist, "as:^100,200,300$", "ipv4u") == 1
    assert _count(hist, "as:", "ipv4u") == 1
    assert _count(hist, "as:100,300", "ipv4u") == 0  # contiguous only

def test_community_and_nh(spark):
    hist = _hist(
        spark,
        [
            u("10.0.0.1/32", t=1, comms=[(100 << 16) | 200], nexthop="192.168.1.1"),
            u("10.0.0.2/32", t=2, comms=[(300 << 16) | 400], nexthop="192.168.2.1"),
        ],
    )
    assert _count(hist, "community:100:200", "ipv4u") == 1
    assert _count(hist, "-community:100:200", "ipv4u") == 1
    assert _count(hist, "nh:192.168.1.0/24", "ipv4u") == 1
    assert _count(hist, "nh:192.168.0.0/16", "ipv4u") == 2

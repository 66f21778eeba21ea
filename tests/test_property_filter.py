"""Property-based equivalence: the Spark filter compiler vs an
independent pure-Python model of the reference's 3-valued semantics
(src/ribfilter.rs:36-110, 1267-1648). Random mini-RIBs x random filters;
any divergence is a compiler bug.

The Python model is written from the reference semantics directly (not
from compile.py), so agreement is meaningful.
"""

from __future__ import annotations

import ipaddress
import re as _re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bgpexplorer_spark.filterlang.compile import matches
from bgpexplorer_spark.filterlang.terms import (
    ASPathTerm,
    CommunityTerm,
    ExtCommTerm,
    FilterTerm,
    NH4Term,
    NumTerm,
    RDTerm,
    RegexTerm,
    V4Term,
    V6Term,
    parse_filter,
)
from bgpexplorer_spark.operators.ingest import build_history

from tests.ribdata import make_updates, u

# --- pure-Python reference model (Yes=True, No=False, Unknown=None) --------

def _py_key_v4(item, route):
    addr, plen = route["addr"], route["plen"]
    route_mc = plen >= 4 and (addr >> 28) == 0xE
    if isinstance(item, V4Term):
        first = item.addr
        last = first | ((1 << (32 - item.plen)) - 1) if item.plen < 32 else first
        contains = first <= addr <= last and plen >= item.plen
        if item.multicast:
            return contains if route_mc else None
        return None if route_mc else contains
    if isinstance(item, NumTerm):
        return plen == item.n  # HARD for v4
    if isinstance(item, RegexTerm):
        # soft vs stringified key (src/ribfilter.rs:1387-1389)
        return True if _re.search(item.pattern, route["nlri"]) else None
    return None

def _py_key_v6(item, route):
    addr, plen = route["addr"], route["plen"]
    route_mc = plen >= 8 and (addr >> 120) == 0xFF
    if isinstance(item, V6Term):
        first = int.from_bytes(item.addr, "big")
        mask = ((1 << item.plen) - 1) << (128 - item.plen) if item.plen else 0
        first &= mask
        last = first | (((1 << 128) - 1) ^ mask)
        contains = first <= addr <= last and plen >= item.plen
        if item.multicast:
            return contains if route_mc else None
        return None if route_mc else contains
    if isinstance(item, NumTerm):
        return True if plen == item.n else None  # SOFT for v6 (rs:1409-1411)
    if isinstance(item, RegexTerm):
        return True if _re.search(item.pattern, route["nlri"]) else None
    return None

def _py_key_rd(item, route):
    rd = route.get("rd")
    if rd is None:
        return None
    if isinstance(item, RDTerm):
        return rd == (item.hi, item.lo)
    if isinstance(item, NumTerm):
        return True if item.n in rd else None  # soft
    return None

def _py_key(item, route, rib):
    if rib == "ipv6u":
        return _py_key_v6(item, route)
    if rib == "vpnv4u":
        r = _py_key_rd(item, route)
        return r if r is not None else _py_key_v4(item, route)
    return _py_key_v4(item, route)

def _py_attr(item, route):
    if isinstance(item, NH4Term):
        nh = route.get("nh")
        if nh is None:
            return None  # BgpAddr::None → Unknown (src/ribfilter.rs:1435)
        first = item.addr
        last = first | ((1 << (32 - item.plen)) - 1) if item.plen < 32 else first
        return first <= nh <= last
    if isinstance(item, CommunityTerm):
        return item.value in route.get("comms", [])
    if isinstance(item, ExtCommTerm) and item.kind == "pair":
        ecs = route.get("extcomms", [])
        if not ecs:
            return None
        return True if any(a == item.a and b == item.b for (_, _, a, b) in ecs) else None
    if isinstance(item, ASPathTerm):
        path = route.get("aspath", [])
        k = len(item.asns)
        if item.mode == "empty":
            return len(path) == 0
        if item.mode == "full":
            return tuple(path) == item.asns
        if item.mode == "startswith":
            return len(path) >= k and tuple(path[:k]) == item.asns
        if item.mode == "endswith":
            return len(path) >= k and tuple(path[-k:]) == item.asns
        return any(
            tuple(path[i : i + k]) == item.asns for i in range(len(path) - k + 1)
        )
    return None

def _py_term(term, route, rib):
    k = _py_key(term.item, route, rib)
    a = _py_attr(term.item, route)

    def pol(x):
        return (not x) if term.negated else x

    if k is True:
        if a is None:
            return True  # polarity-bypass quirk
        return pol(a)
    if k is False:
        return pol(False)
    if a is None:
        return None
    return pol(a)

def _py_match(terms, route, rib):
    out = True
    for t in terms:
        r = _py_term(t, route, rib)
        if r is False:
            return False
        if r is None:
            out = None
    return out

# --- strategies -------------------------------------------------------------

def _route(i, has_rd):
    return st.fixed_dictionaries(
        {
            "addr_raw": st.integers(0, (1 << 32) - 1),
            "plen": st.integers(0, 32),
            "rd": st.tuples(st.integers(0, 3), st.integers(0, 3)) if has_rd else st.none(),
            "aspath": st.lists(st.integers(100, 103), max_size=4),
            "comms": st.lists(st.integers(0, 3), max_size=3),
            "extcomms": st.lists(
                st.tuples(st.just(0), st.just(2), st.integers(0, 2), st.integers(0, 2)),
                max_size=2,
            ),
            # 172.16.{0,1,2}.1 spread across /23 boundaries, or absent
            "nh": st.sampled_from(
                [None] + [(172 << 24) | (16 << 16) | (o << 8) | 1 for o in (0, 1, 2)]
            ),
        }
    )

_FILTERS = [
    "10.0.0.0/8", "224.0.0.0/4", "0.0.0.0/0", "128.0.0.0/1", "-10.0.0.0/8",
    "24", "0", "2", "as:", "as:100", "as:100,101", "as:^100", "as:101$",
    "as:^100,101$", "-as:100", "community:0:1", "-community:0:1",
    "rt:1:1", "rd:1:2", "-rd:1:2", "10.0.0.0/8 as:100", "rd:1:2 24",
    "224.0.0.0/5 community:0:2", "re:", "1 2",
    # nh: hard attr term (Unknown when nexthop absent); regex patterns
    # chosen so only the stringified KEY can match (no '/' in attr renders)
    "nh:172.16.0.0/23", "-nh:172.16.0.0/23", "10.0.0.0/8 nh:172.16.0.0/16",
    "re:/16$", "-re:/16$",
]

_V6_FILTERS = [
    "2c0a::/16", "2c0a::/64", "::/0", "8000::/1", "-2c0a::/16",
    "ff02::/16", "ff00::/8", "64", "128", "0", "-64",
    "as:100", "2c0a::/16 as:100", "re:", "re:/64$",
]

@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence_v6(spark, data):
    """IPv6 subnet containment / multicast gate / soft-Num on the
    lex-comparable BINARY(16) form — SURVEY's top-listed risk."""
    stems = [0x2C0A, 0x2C0B, 0xFF02, 0x2001]
    routes = data.draw(
        st.lists(
            st.fixed_dictionaries(
                {
                    "stem": st.sampled_from(stems),
                    "low": st.integers(0, (1 << 112) - 1),
                    "plen": st.integers(0, 128),
                    "aspath": st.lists(st.integers(100, 102), max_size=3),
                }
            ),
            min_size=1, max_size=6,
        )
    )
    rows, model_routes = [], []
    for i, r in enumerate(routes):
        raw = (r["stem"] << 112) | r["low"]
        net = ipaddress.ip_network((raw, r["plen"]), strict=False)
        spec = u(
            f"{net.network_address}/{r['plen']}", rib="ipv6u", t=i,
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
            session_id=i,
        )
        rows.append(spec)
        model_routes.append(
            {
                "addr": int(net.network_address), "plen": r["plen"],
                "aspath": r["aspath"], "comms": [], "extcomms": [],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    cols = [matches(f, "ipv6u").alias(f"m{j}") for j, f in enumerate(_V6_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_V6_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_V6_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = _py_match(terms, mr, "ipv6u") is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, (
                f"filter={f!r} route={mr} want={want} have={have}"
            )

@pytest.mark.parametrize("rib", ["ipv4u", "vpnv4u"])
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence(spark, rib, data):
    routes = data.draw(st.lists(_route(0, rib == "vpnv4u"), min_size=1, max_size=6))
    rows = []
    model_routes = []
    for i, r in enumerate(routes):
        net = ipaddress.ip_network((r["addr_raw"], r["plen"]), strict=False)
        addr = int(net.network_address)
        spec = u(
            f"{net.network_address}/{r['plen']}",
            rib=rib,
            t=i,
            rd=f"{r['rd'][0]}:{r['rd'][1]}" if r["rd"] else None,
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
            comms=[c for c in r["comms"]] or None,
            extcomms=r["extcomms"] or None,
            nexthop=str(ipaddress.IPv4Address(r["nh"])) if r["nh"] is not None else None,
            session_id=i,  # distinct keys so rows never merge
        )
        rows.append(spec)
        model_routes.append(
            {
                "addr": addr, "plen": r["plen"],
                "rd": r["rd"], "aspath": r["aspath"],
                "comms": r["comms"], "extcomms": r["extcomms"],
                "nh": r["nh"],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    # evaluate every filter in ONE pass; key by (nlri, session) because two
    # drawn routes can normalize to the same NLRI string
    cols = [matches(f, rib).alias(f"m{j}") for j, f in enumerate(_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = _py_match(terms, mr, rib) is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, (
                f"filter={f!r} rib={rib} route={mr} want={want} have={have}"
            )

# ---------------------------------------------------------------------------
# Write-path equivalence: build_history vs a direct replay of the
# reference's per-key BTreeMap semantics (src/bgprib.rs:584-683) —
# update insert, withdraw tombstone-as-of (never-seen dropped), differ
# dedup, newest-N retention.
# ---------------------------------------------------------------------------

def _replay(events, mode, depth):
    """events: time-ordered [(nlri, session, op, variant)]; returns
    {(nlri, session, t, active, variant)} of surviving history rows."""
    last_update = {}   # key -> variant (forward fill source)
    kept = {}          # key -> list of (t, active, variant)
    for t, (nlri, sess, op, var) in enumerate(events):
        key = (nlri, sess)
        if op == "update":
            last_update[key] = var
            entry = (True, var)
        else:
            if key not in last_update:
                continue  # withdraw before any update: dropped (rs:594-597)
            entry = (False, last_update[key])
        seq = kept.setdefault(key, [])
        if mode == "differ" and seq and (seq[-1][1], seq[-1][2]) == entry:
            continue
        seq.append((t, *entry))
    out = set()
    for (nlri, sess), seq in kept.items():
        tail = seq[-depth:] if depth else seq
        out.update((nlri, sess, t, a, v) for (t, a, v) in tail)
    return out

@pytest.mark.parametrize(
    "mode,depth", [("every", None), ("differ", None), ("every", 2), ("differ", 2)]
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_build_history_equivalence(spark, mode, depth, data):
    events = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(["10.0.0.0/24", "10.0.1.0/24"]),
                st.sampled_from([0, 1]),
                st.sampled_from(["update", "update", "withdraw"]),
                st.sampled_from([0, 1, 2]),
            ),
            min_size=1, max_size=14,
        )
    )
    rows = [
        u(
            nlri, t=t, session_id=sess, op=op,
            aspath=[("Seq", [100 + var])] if op == "update" else None,
            comms=[var] if op == "update" else None,
        )
        for t, (nlri, sess, op, var) in enumerate(events)
    ]
    hist = build_history(
        make_updates(spark, rows), history_mode=mode, history_depth=depth
    )
    import datetime as _dt

    from tests.ribdata import T0

    got = {
        (
            r.nlri_str, r.session_id,
            int((r.ts.replace(tzinfo=_dt.timezone.utc) - T0).total_seconds()),
            r.active, int(r.aspath_flat[0]) - 100,
        )
        for r in hist.select("nlri_str", "session_id", "ts", "active", "aspath_flat").collect()
    }
    want = _replay(events, mode, depth)
    assert got == want, f"mode={mode} depth={depth} events={events}"

# ---------------------------------------------------------------------------
# MVPN majority vote (multi, src/ribfilter.rs:59-81) — T5 rd → else
# multi(source, group); T1 rd → else originator (chain).
# ---------------------------------------------------------------------------

def _py_comp_v4(item, addr):
    """Nested /32 component (match via BgpAddrV4 — the prefix-multicast
    gate degenerates to the first-nibble check)."""
    if addr is None or not isinstance(item, V4Term):
        return None
    mc = (addr >> 28) == 0xE
    first = item.addr
    last = first | ((1 << (32 - item.plen)) - 1) if item.plen < 32 else first
    in_net = first <= addr <= last
    if item.multicast:
        return in_net if mc else None
    return None if mc else in_net

def _py_multi(results):
    cy = sum(1 for r in results if r is True)
    cn = sum(1 for r in results if r is False)
    if cy > cn:
        return True
    if cn > cy:
        return False
    return None

def _py_key_mvpn(item, route):
    r = _py_key_rd(item, route)
    if r is not None:
        return r
    t = route["mvpn_type"]
    if t == 5:
        return _py_multi(
            [_py_comp_v4(item, route["src"]), _py_comp_v4(item, route["grp"])]
        )
    if t == 1:
        return _py_comp_v4(item, route["orig"])
    return None

_MVPN_FILTERS = [
    "224.0.0.0/4", "-224.0.0.0/4", "10.0.0.0/8", "-10.0.0.0/8",
    "224.1.0.0/16", "10.1.0.0/16", "rd:1:2", "-rd:1:2", "2",
    "10.0.0.0/8 224.0.0.0/4", "rd:1:2 224.0.0.0/4", "as:100",
]

_MVPN_ADDRS = [None, 0x0A000001, 0x0A010001, 0x0B000001, 0xE0010001, 0xE1000001]

@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence_mvpn(spark, data):
    routes = data.draw(
        st.lists(
            st.fixed_dictionaries(
                {
                    "type": st.sampled_from([1, 5]),
                    "rd": st.tuples(st.integers(0, 2), st.integers(1, 3)),
                    "src": st.sampled_from(_MVPN_ADDRS),
                    "grp": st.sampled_from(_MVPN_ADDRS),
                    "orig": st.sampled_from(_MVPN_ADDRS),
                    "aspath": st.lists(st.integers(100, 101), max_size=2),
                }
            ),
            min_size=1, max_size=6,
        )
    )
    rows, model_routes = [], []
    for i, r in enumerate(routes):
        v4 = lambda a: str(ipaddress.IPv4Address(a)) if a is not None else None
        spec = u(
            "0.0.0.0/32", rib="mvpn", t=i, session_id=i,
            rd=f"{r['rd'][0]}:{r['rd'][1]}",
            mvpn=(r["type"], v4(r["src"]) if r["type"] == 5 else None,
                  v4(r["grp"]) if r["type"] == 5 else None),
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
            mvpn_originator_v4=r["orig"] if r["type"] == 1 else None,
        )
        rows.append(spec)
        model_routes.append(
            {
                "mvpn_type": r["type"], "rd": r["rd"],
                "src": r["src"] if r["type"] == 5 else None,
                "grp": r["grp"] if r["type"] == 5 else None,
                "orig": r["orig"] if r["type"] == 1 else None,
                "aspath": r["aspath"], "comms": [], "extcomms": [],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    cols = [matches(f, "mvpn").alias(f"m{j}") for j, f in enumerate(_MVPN_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_MVPN_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_MVPN_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = True
            for t in terms:
                k = _py_key_mvpn(t.item, mr)
                a = _py_attr(t.item, mr)
                pol = (lambda x: not x) if t.negated else (lambda x: x)
                if k is True:
                    res = True if a is None else pol(a)
                elif k is False:
                    res = pol(False)
                elif a is None:
                    res = None
                else:
                    res = pol(a)
                if res is False:
                    want = False
                    break
                if res is None:
                    want = None
            want = want is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, (
                f"filter={f!r} route={mr} want={want} have={have}"
            )

# ---------------------------------------------------------------------------
# EVPN dispatch (src/ribfilter.rs:389-443): type 1 rd-only; types 2-5
# rd → else host-IP match with the service.rs multicast gate.
# ---------------------------------------------------------------------------

def _py_host_v4(item, addr):
    if addr is None or not isinstance(item, V4Term):
        return None
    mc = (addr >> 24) >= 224 and addr != 0xFFFFFFFF  # service.rs:36-38
    first = item.addr
    last = first | ((1 << (32 - item.plen)) - 1) if item.plen < 32 else first
    in_net = first <= addr <= last
    if item.multicast:
        return in_net if mc else None
    return None if mc else in_net

def _py_key_evpn(item, route):
    r = _py_key_rd(item, route)
    if route["evpn_type"] == 1:
        return r
    if r is not None:
        return r
    return _py_host_v4(item, route.get("addr"))

_EVPN_FILTERS = [
    "10.0.0.0/8", "-10.0.0.0/8", "10.1.0.0/16", "224.0.0.0/4",
    "rd:1:2", "-rd:1:2", "2", "rd:1:2 10.0.0.0/8", "as:100",
]

@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence_evpn(spark, data):
    routes = data.draw(
        st.lists(
            st.fixed_dictionaries(
                {
                    "type": st.sampled_from([1, 2, 3, 5]),
                    "rd": st.tuples(st.integers(0, 2), st.integers(1, 3)),
                    "ip": st.sampled_from([0x0A000001, 0x0A010001, 0x0B000001, 0xE0000001]),
                    "aspath": st.lists(st.integers(100, 101), max_size=2),
                }
            ),
            min_size=1, max_size=6,
        )
    )
    rows, model_routes = [], []
    for i, r in enumerate(routes):
        spec = u(
            f"{ipaddress.IPv4Address(r['ip'])}/32", rib="evpn", t=i, session_id=i,
            rd=f"{r['rd'][0]}:{r['rd'][1]}", evpn=r["type"],
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
        )
        rows.append(spec)
        model_routes.append(
            {
                "evpn_type": r["type"], "rd": r["rd"], "addr": r["ip"],
                "aspath": r["aspath"], "comms": [], "extcomms": [],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    cols = [matches(f, "evpn").alias(f"m{j}") for j, f in enumerate(_EVPN_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_EVPN_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_EVPN_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = True
            for t in terms:
                k = _py_key_evpn(t.item, mr)
                a = _py_attr(t.item, mr)
                pol = (lambda x: not x) if t.negated else (lambda x: x)
                if k is True:
                    res = True if a is None else pol(a)
                elif k is False:
                    res = pol(False)
                elif a is None:
                    res = None
                else:
                    res = pol(a)
                if res is False:
                    want = False
                    break
                if res is None:
                    want = None
            want = want is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, (
                f"filter={f!r} route={mr} want={want} have={have}"
            )

# ---------------------------------------------------------------------------
# l2vpls (src/ribfilter.rs:306-319): rd equality / Num hard on
# site-or-offset..range; and ipv4mdt (444-448): rd chain → multi(prefix
# match, multicast-group host match).
# ---------------------------------------------------------------------------

def _py_key_l2(item, route):
    if isinstance(item, RDTerm):
        return route["rd"] == (item.hi, item.lo)
    if isinstance(item, NumTerm):
        site, off, rng = route["l2"]
        return site == item.n or (off <= item.n <= rng)
    return None

_L2_FILTERS = ["2", "5", "-5", "0", "rd:1:2", "-rd:1:2", "rd:1:2 5", "as:100"]

@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence_l2vpls(spark, data):
    routes = data.draw(
        st.lists(
            st.fixed_dictionaries(
                {
                    "rd": st.tuples(st.integers(0, 2), st.integers(1, 3)),
                    "site": st.integers(0, 6),
                    "off": st.integers(0, 4),
                    "rng": st.integers(0, 9),
                    "aspath": st.lists(st.integers(100, 101), max_size=2),
                }
            ),
            min_size=1, max_size=6,
        )
    )
    rows, model_routes = [], []
    for i, r in enumerate(routes):
        spec = u(
            "0.0.0.0/32", rib="l2vpls", t=i, session_id=i,
            rd=f"{r['rd'][0]}:{r['rd'][1]}",
            l2=(r["site"], r["off"], r["rng"]),
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
        )
        rows.append(spec)
        model_routes.append(
            {
                "rd": r["rd"], "l2": (r["site"], r["off"], r["rng"]),
                "aspath": r["aspath"], "comms": [], "extcomms": [],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    cols = [matches(f, "l2vpls").alias(f"m{j}") for j, f in enumerate(_L2_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_L2_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_L2_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = True
            for t in terms:
                k = _py_key_l2(t.item, mr)
                a = _py_attr(t.item, mr)
                pol = (lambda x: not x) if t.negated else (lambda x: x)
                if k is True:
                    res = True if a is None else pol(a)
                elif k is False:
                    res = pol(False)
                elif a is None:
                    res = None
                else:
                    res = pol(a)
                if res is False:
                    want = False
                    break
                if res is None:
                    want = None
            want = want is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, f"filter={f!r} route={mr} want={want} have={have}"

def _py_key_mdt(item, route):
    r = _py_key_rd(item, route)
    if r is not None:
        return r
    prefix = _py_key_v4(
        item, {"addr": route["addr"], "plen": route["plen"], "nlri": route["nlri"]}
    )
    group = _py_host_v4(item, route["grp"])
    return _py_multi([prefix, group])

_MDT_FILTERS = [
    "10.0.0.0/8", "-10.0.0.0/8", "224.0.0.0/4", "232.0.0.0/8",
    "rd:1:2", "24", "10.0.0.0/8 224.0.0.0/4", "as:100",
]

@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_filter_equivalence_mdt(spark, data):
    routes = data.draw(
        st.lists(
            st.fixed_dictionaries(
                {
                    "addr_raw": st.sampled_from([0x0A000000, 0x0A010000, 0x0B000000]),
                    "plen": st.sampled_from([16, 24, 32]),
                    "rd": st.tuples(st.integers(0, 2), st.integers(1, 3)),
                    "grp": st.sampled_from([0xE0000001, 0xE8000001, 0xE9000001]),
                    "aspath": st.lists(st.integers(100, 101), max_size=2),
                }
            ),
            min_size=1, max_size=6,
        )
    )
    rows, model_routes = [], []
    for i, r in enumerate(routes):
        net = ipaddress.ip_network((r["addr_raw"], r["plen"]), strict=False)
        spec = u(
            f"{net.network_address}/{r['plen']}", rib="ipv4mdt", t=i, session_id=i,
            rd=f"{r['rd'][0]}:{r['rd'][1]}",
            mdt_group=str(ipaddress.IPv4Address(r["grp"])),
            aspath=[("Seq", r["aspath"])] if r["aspath"] else None,
        )
        rows.append(spec)
        model_routes.append(
            {
                "addr": int(net.network_address), "plen": r["plen"],
                "rd": r["rd"], "grp": r["grp"],
                "aspath": r["aspath"], "comms": [], "extcomms": [],
                "nlri": spec["nlri_str"],
            }
        )
    hist = build_history(make_updates(spark, rows))
    cols = [matches(f, "ipv4mdt").alias(f"m{j}") for j, f in enumerate(_MDT_FILTERS)]
    got = hist.select(F.col("nlri_str"), F.col("session_id"), *cols).collect()
    spark_result = {
        (row.nlri_str, row.session_id): [row[f"m{j}"] for j in range(len(_MDT_FILTERS))]
        for row in got
    }
    for j, f in enumerate(_MDT_FILTERS):
        terms = parse_filter(f)
        for i, mr in enumerate(model_routes):
            want = True
            for t in terms:
                k = _py_key_mdt(t.item, mr)
                a = _py_attr(t.item, mr)
                pol = (lambda x: not x) if t.negated else (lambda x: x)
                if k is True:
                    res = True if a is None else pol(a)
                elif k is False:
                    res = pol(False)
                elif a is None:
                    res = None
                else:
                    res = pol(a)
                if res is False:
                    want = False
                    break
                if res is None:
                    want = None
            want = want is True
            have = spark_result[(mr["nlri"], i)][j]
            assert have == want, f"filter={f!r} route={mr} want={want} have={have}"

"""3-valued filter compiler: parsed terms → one Spark Column.

Truth encoding: a term/filter evaluates to a **nullable boolean Column** —
``true`` = Yes, ``false`` = No, ``NULL`` = Unknown (the reference's
FilterItemMatchResult, src/ribfilter.rs:36-110). This makes the whole-filter
conjunction literally the SQL ``AND``: Kleene 3VL (any false ⇒ false; all
true ⇒ true; else NULL) is exactly RouteFilter::match_route's fold
(src/ribfilter.rs:760-794). A route/history row is emitted iff the filter
column IS TRUE (src/ribfilter.rs:606-609).

Per-term semantics (FilterTerm::match_route truth table,
src/ribfilter.rs:1562-1604), with ``k`` = key match, ``a`` = attr match,
``pol`` = polarity application (``-`` swaps Yes/No, Unknown unchanged):

    k=No                  → pol(No)
    k=Yes, a=No           → pol(No)
    k=Yes, a=Yes          → pol(Yes)
    k=Yes, a=Unknown      → Yes        (bypasses polarity — reference quirk)
    k=Unknown, a≠Unknown  → pol(a)
    k=Unknown, a=Unknown  → Unknown

Key-match dispatch is static per rib (the HTTP API always addresses one
rib, src/ribservice.rs:260-277), so the compiled Column contains only the
arms that rib needs; composite keys chain rd→inner and MVPN/MDT use the
majority vote ``multi`` (src/ribfilter.rs:59-81).

Everything is built-in Column algebra — codegen-able, and the V4/V6 terms
reduce to range predicates on the sortable address forms, which parquet
min/max stats prune at 100 TB (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bgpexplorer_spark.filterlang.terms import (
    ASPathTerm,
    CommunityTerm,
    ExtCommTerm,
    FilterTerm,
    Item,
    NH4Term,
    NH6Term,
    NumTerm,
    RDTerm,
    RegexTerm,
    V4Term,
    V6Term,
    parse_filter,
)
from bgpexplorer_spark.functions import codecs, iputil
from bgpexplorer_spark.functions.iputil import v4_net_range, v6_net_range

# --- 3VL helpers ------------------------------------------------------------

def _YES() -> Column:
    return F.lit(True)

def _NO() -> Column:
    return F.lit(False)

def _UNKNOWN() -> Column:
    return F.lit(None).cast("boolean")

def hard(b: Column) -> Column:
    """bool → Yes/No (never Unknown): coalesce nulls to No."""
    return F.coalesce(b, _NO())

def soft(b: Column) -> Column:
    """bool → Yes/Unknown (FilterItemMatchResult::soft,
    src/ribfilter.rs:52-58). No otherwise() branch: false/NULL both fall
    through to NULL, referencing ``b`` exactly once — combinators here
    keep single references so the compiled filter tree stays within
    janino's method-size budget (each extra reference of a subtree
    multiplies the generated Java)."""
    return F.when(b, _YES())

def chain(first: Column, second: Column) -> Column:
    """'if first is Unknown, try second' — the rd→inner-prefix delegation
    of WithRd/MVPN/EVPN keys (src/ribfilter.rs:458-470 etc.). Unknown IS
    NULL, so this is exactly coalesce (one reference per subtree)."""
    return F.coalesce(first, second)

def multi(*results: Column) -> Column:
    """Majority vote: #Yes > #No ⇒ Yes; #No > #Yes ⇒ No; tie ⇒ Unknown
    (src/ribfilter.rs:59-81). Encoded as a ±1/0 score sum + signum so
    each vote subtree is referenced twice total, not per-comparison —
    the naive two-counter form inlined each vote ~8×, which together
    with term_to_column's fan-out pushed the generated processNext()
    past janino's compile limit (whole-stage codegen fallback)."""
    score: Column | None = None
    for r in results:
        s = F.when(r.isNull(), 0).otherwise(F.when(r, 1).otherwise(-1))
        score = s if score is None else score + s
    sig = F.signum(score)
    return F.when(sig == 0, _UNKNOWN()).otherwise(sig > 0)

# --- column shorthands ------------------------------------------------------

def _ADDR4() -> Column:
    return F.col("addr_v4")

def _ADDR6() -> Column:
    return F.col("addr_v6")

def _PLEN() -> Column:
    return F.col("prefixlen")

def _host_mc_v4(addr: Column) -> Column:
    """service.rs is_multicast_v4: ≥224.0.0.0 excluding 255.255.255.255."""
    return (F.shiftright(addr, 24) >= 224) & (addr != F.lit(iputil.V4_MAX))

def _host_mc_v6(addr: Column) -> Column:
    return F.substring(addr, 1, 1) == F.lit(b"\xff")

def _prefix_mc_v4(addr: Column, plen: Column) -> Column:
    """zettabgp BgpAddrV4::is_multicast: prefix ⊆ 224.0.0.0/4."""
    return (plen >= 4) & (F.shiftright(addr, 28) == 0xE)

def _prefix_mc_v6(addr: Column, plen: Column) -> Column:
    return (plen >= 8) & (F.substring(addr, 1, 1) == F.lit(b"\xff"))

# --- key match per base type (match_item impls, src/ribfilter.rs:218-540) ---

def _key_v4prefix(item: Item, supernet: bool) -> Column:
    """BgpAddrV4 prefix key (match_ipv4 / match_super_ipv4,
    src/ribfilter.rs:1371-1392 / 1350-1357)."""
    if isinstance(item, V4Term):
        first, last = v4_net_range(item.addr, item.plen)
        if supernet:
            # match_super_ipv4 only matches FilterItem::V4 — a multicast
            # term (MCV4) returns Unknown (src/ribfilter.rs:1350-1357)
            if item.multicast:
                return _UNKNOWN()
            return hard(
                iputil.v4_supernet_contains(_ADDR4(), _PLEN(), first, last)
            )
        contains = iputil.v4_subnet_contains(_ADDR4(), _PLEN(), first, last, item.plen)
        route_mc = _prefix_mc_v4(_ADDR4(), _PLEN())
        if item.multicast:
            return F.when(route_mc, hard(contains)).otherwise(_UNKNOWN())
        return F.when(route_mc, _UNKNOWN()).otherwise(hard(contains))
    if isinstance(item, NumTerm):
        if supernet:
            return soft(_PLEN() == item.n)
        return hard(_PLEN() == item.n)  # hard for v4 (src/ribfilter.rs:1386)
    if isinstance(item, RegexTerm) and not supernet:
        return soft(F.col("nlri_str").rlike(item.pattern))
    return _UNKNOWN()

def _key_v6prefix(item: Item, supernet: bool) -> Column:
    if isinstance(item, V6Term):
        first, last = v6_net_range(item.addr, item.plen)
        if supernet:
            # match_super_ipv6 only matches FilterItem::V6 — multicast
            # terms return Unknown (src/ribfilter.rs:1358-1366)
            if item.multicast:
                return _UNKNOWN()
            return hard(
                iputil.v6_supernet_contains(_ADDR6(), _PLEN(), first, last)
            )
        contains = iputil.v6_subnet_contains(_ADDR6(), _PLEN(), first, last, item.plen)
        route_mc = _prefix_mc_v6(_ADDR6(), _PLEN())
        if item.multicast:
            return F.when(route_mc, hard(contains)).otherwise(_UNKNOWN())
        return F.when(route_mc, _UNKNOWN()).otherwise(hard(contains))
    if isinstance(item, NumTerm):
        return soft(_PLEN() == item.n)  # soft for v6 (src/ribfilter.rs:1409-1411)
    if isinstance(item, RegexTerm) and not supernet:
        return soft(F.col("nlri_str").rlike(item.pattern))
    return _UNKNOWN()

def _key_rd(item: Item) -> Column:
    """match_rd (src/ribfilter.rs:1418-1429)."""
    if isinstance(item, RDTerm):
        return hard((F.col("rd_hi") == item.hi) & (F.col("rd_lo") == item.lo))
    if isinstance(item, NumTerm):
        return soft((F.col("rd_hi") == item.n) | (F.col("rd_lo") == item.n))
    if isinstance(item, RegexTerm):
        return soft(
            codecs.rd_to_str(F.col("rd_hi"), F.col("rd_lo")).rlike(item.pattern)
        )
    return _UNKNOWN()

def _key_host_v4(addr: Column, item: Item) -> Column:
    """Plain Ipv4Addr host (match_addr_v4, src/ribfilter.rs:1312-1330) —
    only V4/MCV4 arms; host-multicast gate from service.rs."""
    if isinstance(item, V4Term):
        first, last = v4_net_range(item.addr, item.plen)
        in_net = iputil.v4_in_subnet(addr, first, last)
        mc = _host_mc_v4(addr)
        gated = F.when(mc, _UNKNOWN()).otherwise(hard(in_net)) if not item.multicast \
            else F.when(mc, hard(in_net)).otherwise(_UNKNOWN())
        return F.when(addr.isNull(), _UNKNOWN()).otherwise(gated)
    return _UNKNOWN()

def _key_host_v6(addr: Column, item: Item) -> Column:
    if isinstance(item, V6Term):
        first, last = v6_net_range(item.addr, item.plen)
        in_net = iputil.v6_in_subnet(addr, first, last)
        mc = _host_mc_v6(addr)
        gated = F.when(mc, _UNKNOWN()).otherwise(hard(in_net)) if not item.multicast \
            else F.when(mc, hard(in_net)).otherwise(_UNKNOWN())
        return F.when(addr.isNull(), _UNKNOWN()).otherwise(gated)
    return _UNKNOWN()

def _key_v4_component(addr: Column, item: Item) -> Column:
    """A nested BgpAddrV4 /32 component (MVPN source/group/originator) —
    full match_ipv4 semantics; the prefix-multicast gate degenerates to a
    first-nibble check on a /32 (src/ribfilter.rs:354-364)."""
    if isinstance(item, V4Term):
        first, last = v4_net_range(item.addr, item.plen)
        contains = iputil.v4_in_subnet(addr, first, last)
        route_mc = F.shiftright(addr, 28) == 0xE
        if item.multicast:
            res = F.when(route_mc, hard(contains)).otherwise(_UNKNOWN())
        else:
            res = F.when(route_mc, _UNKNOWN()).otherwise(hard(contains))
        return F.when(addr.isNull(), _UNKNOWN()).otherwise(res)
    if isinstance(item, NumTerm):
        return F.when(addr.isNull(), _UNKNOWN()).otherwise(hard(F.lit(32) == item.n))
    if isinstance(item, RegexTerm):
        return F.when(
            addr.isNull(), _UNKNOWN()
        ).otherwise(
            soft(F.concat(iputil.v4_to_dotted(addr), F.lit("/32")).rlike(item.pattern))
        )
    return _UNKNOWN()

def _key_l2(item: Item) -> Column:
    """BgpAddrL2 (src/ribfilter.rs:306-319): rd, else Num hard on
    site/offset..range, else regex soft."""
    if isinstance(item, (RDTerm,)):
        return _key_rd(item)
    if isinstance(item, NumTerm):
        return hard(
            (F.col("l2_site") == item.n)
            | ((F.col("l2_offset") <= item.n) & (F.col("l2_range") >= item.n))
        )
    if isinstance(item, RegexTerm):
        return soft(F.col("nlri_str").rlike(item.pattern))
    return _UNKNOWN()

def _key_mvpn(item: Item) -> Column:
    """BgpMVPN dispatch — the reference's full per-type matrix
    (src/ribfilter.rs:320-388): T1 rd→originator; T2 rd-only;
    T3 rd→multi(originator, source, group); T4 originator (the spmsi
    route key's rd is folded into the decoded rd column);
    T5 rd→multi(source, group); T6/T7 rd→multi(rp, group) with the RP in
    the source slot."""
    rd = _key_rd(item)
    src = _key_v4_component(F.col("mvpn_source_v4"), item)
    grp = _key_v4_component(F.col("mvpn_group_v4"), item)
    orig = _key_v4_component(F.col("mvpn_originator_v4"), item)
    t1 = chain(rd, orig)
    t3 = chain(rd, multi(orig, src, grp))
    t5 = chain(rd, multi(src, grp))
    return (
        F.when(F.col("mvpn_type") == 5, t5)
        .when(F.col("mvpn_type") == 1, t1)
        .when(F.col("mvpn_type").isin(3, 4), t3)
        .when(F.col("mvpn_type").isin(6, 7), t5)
        .otherwise(rd)
    )

def _key_evpn(item: Item) -> Column:
    """BgpEVPN (src/ribfilter.rs:389-443): rd first; types 2-5 then match
    the (gateway) IP host."""
    rd = _key_rd(item)
    ip = chain(_key_host_v4(_ADDR4(), item), _key_host_v6(_ADDR6(), item))
    return F.when(F.col("evpn_type") == 1, rd).otherwise(chain(rd, ip))

def _key_mdt(item: Item, v6: bool) -> Column:
    """WithRd<BgpMdtV4/V6> (src/ribfilter.rs:444-453): rd first, else
    multi(unicast addr prefix, group host)."""
    rd = _key_rd(item)
    if v6:
        inner = multi(_key_v6prefix(item, False), _key_host_v6(F.col("mdt_group_v6"), item))
    else:
        inner = multi(_key_v4prefix(item, False), _key_host_v4(F.col("mdt_group_v4"), item))
    return chain(rd, inner)

# rib name → key-match builder (the 15 monomorphized tables,
# src/bgprib.rs:807-821)
def key_match(item: Item, rib: str, supernet: bool = False) -> Column:
    if rib in ("ipv4u", "ipv4m"):
        return _key_v4prefix(item, supernet)
    if rib == "ipv6u":
        return _key_v6prefix(item, supernet)
    if rib == "ipv4lu":  # Labeled<T> delegates to inner (src/ribfilter.rs:500-520)
        return _key_v4prefix(item, supernet)
    if rib == "ipv6lu":
        return _key_v6prefix(item, supernet)
    if rib in ("vpnv4u", "vpnv4m"):
        return chain(_key_rd(item), _key_v4prefix(item, supernet))
    if rib in ("vpnv6u", "vpnv6m"):
        return chain(_key_rd(item), _key_v6prefix(item, supernet))
    if rib == "l2vpls":
        return _key_l2(item) if not supernet else _UNKNOWN()
    if rib == "mvpn":
        return _key_mvpn(item) if not supernet else _UNKNOWN()
    if rib == "evpn":
        return _key_evpn(item) if not supernet else _UNKNOWN()
    if rib == "ipv4mdt":
        return _key_mdt(item, False) if not supernet else _UNKNOWN()
    if rib == "ipv6mdt":
        return _key_mdt(item, True) if not supernet else _UNKNOWN()
    if rib == "fs4u":  # FlowSpec: no matching implemented (src/ribfilter.rs:454)
        return _UNKNOWN()
    raise ValueError(f"unknown rib {rib!r}")

# --- attr match (FilterItem::match_attr, src/ribfilter.rs:1430-1504) --------

def _attr_regex_strs() -> list[Column]:
    """The stringified attrs the reference regex-scans — matched each
    INDEPENDENTLY (ribfilter.rs match_attr Regexp runs is_match per
    string), so anchored patterns (^/$) behave per-attr; nexthop_v6 is
    rendered in canonical IPv6 notation, not raw hex."""
    return [
        F.col("origin"),
        iputil.v4_to_dotted(F.col("nexthop_v4")),
        iputil.v6_to_str(F.col("nexthop_v6")),
        codecs.aspath_to_str(F.col("aspath")),
        codecs.comms_to_str(F.col("comms")),
        codecs.lcomms_to_str(F.col("lcomms")),
        codecs.extcomms_to_str(F.col("extcomms")),
    ]

def _extcomm_member_match(item: ExtCommTerm) -> Column:
    """One ext-community struct vs the term (BgpExtCommunity::match_item,
    src/ribfilter.rs:504-540) — returns a bool lambda-ready predicate."""

    def pred(e: Column) -> Column:
        a, b, ctype = e.getField("a"), e.getField("b"), e.getField("ctype")
        if item.kind == "num":
            return (a == item.n) | (b == item.n) | (F.shiftright(b, 16).bitwiseAND(F.lit(0xFFFF)) == item.n)
        if item.kind == "pair":
            return (a == item.a) & (b == item.b)
        # embedded IPv4 from low 16 bits of a + high 16 bits of b (ctype 1)
        emb = (a.bitwiseAND(F.lit(0xFFFF)) * F.lit(65536)) + F.shiftright(b, 16).bitwiseAND(F.lit(0xFFFF))
        first, last = v4_net_range(item.ip_first, 32)
        in_net = (emb >= F.lit(first)) & (emb <= F.lit(last))
        if item.kind == "ip":
            return (ctype == 1) & in_net
        return (ctype == 1) & (b.bitwiseAND(F.lit(0xFFFF)) == item.n) & in_net

    return pred

def attr_match(item: Item) -> Column:
    if isinstance(item, NH4Term):
        first, last = v4_net_range(item.addr, item.plen)
        return F.when(
            F.col("nexthop_v4").isNotNull(),
            hard(iputil.v4_in_subnet(F.col("nexthop_v4"), first, last)),
        ).otherwise(_UNKNOWN())
    if isinstance(item, NH6Term):
        first, last = v6_net_range(item.addr, item.plen)
        return F.when(
            F.col("nexthop_v6").isNotNull(),
            hard(iputil.v6_in_subnet(F.col("nexthop_v6"), first, last)),
        ).otherwise(_UNKNOWN())
    if isinstance(item, CommunityTerm):
        return hard(F.array_contains(F.col("comms"), F.lit(item.value)))
    if isinstance(item, ExtCommTerm):
        # any member Yes → Yes, else Unknown (soft fold, never No)
        return soft(F.exists(F.col("extcomms"), _extcomm_member_match(item)))
    if isinstance(item, RegexTerm):
        any_match = F.lit(False)
        for s in _attr_regex_strs():
            any_match = any_match | F.coalesce(s.rlike(item.pattern), F.lit(False))
        return soft(any_match)
    if isinstance(item, ASPathTerm):
        # DELIBERATE DEVIATION: matched against the flattened ASN array,
        # not segment-wise Vec<BgpASitem> slices (ribfilter.rs:1471-1504).
        # zettabgp builds a single Seq segment for typical paths, where
        # flattened == segment content; multi-segment (Set-containing)
        # paths differ, and the flattened form is what an operator asking
        # "does AS x,y appear in the path" means. Documented in COVERAGE.md.
        flat = F.coalesce(F.col("aspath_flat"), F.array().cast("array<bigint>"))
        k = len(item.asns)
        lit = F.array(*[F.lit(x).cast("bigint") for x in item.asns])
        if item.mode == "empty":
            return hard(F.size(flat) == 0)
        if item.mode == "full":
            return hard(flat == lit)
        if item.mode == "contains":
            return hard(codecs.array_contiguous_subseq(flat, list(item.asns)))
        if item.mode == "startswith":
            return hard((F.size(flat) >= k) & (F.slice(flat, 1, k) == lit))
        if item.mode == "endswith":
            return hard((F.size(flat) >= k) & (F.slice(flat, -k, k) == lit))
    return _UNKNOWN()

# --- term + filter composition ---------------------------------------------

def term_to_column(term: FilterTerm, rib: str, supernet: bool = False) -> Column:
    """The FilterTerm::match_route truth table (src/ribfilter.rs:1562-1648)."""
    k = key_match(term.item, rib, supernet)
    a = attr_match(term.item)

    # Kleene NOT is exactly SQL NOT (~NULL = NULL), so polarity is a bare
    # negation — no when() wrapper, one reference of the operand.
    def pol(x: Column) -> Column:
        return ~x if term.negated else x

    # Truth table with k referenced twice and a three times (the naive
    # k_yes/k_no form referenced k six times, inlining the whole key tree
    # per reference — see multi()'s docstring on the janino budget):
    #   k=Yes, a=Unknown → Yes (quirk: bypasses polarity)
    #   k=No             → pol(No)
    #   k=Unknown, a=Unknown → Unknown
    #   a known (k Yes or Unknown) → pol(a)
    # Branch 1: NULL/false k short-circuits the AND to not-matched.
    # Branch 2: ~k is NULL for unknown k → skipped.
    return (
        F.when(k & a.isNull(), _YES())
        .when(~k, pol(_NO()))
        .when(a.isNull(), _UNKNOWN())
        .otherwise(pol(a))
    )

def filter_to_column(
    filter_str: str | list[FilterTerm] | None, rib: str, supernet: bool = False
) -> Column:
    """Whole filter → nullable-boolean Column (SQL AND == the reference's
    conjunction fold). Emission predicate: ``filter_to_column(...)`` then
    ``F.coalesce(col, F.lit(False))`` — only Yes rows are emitted
    (src/ribfilter.rs:606-609). Empty filter ⇒ Yes."""
    terms = parse_filter(filter_str) if isinstance(filter_str, (str, type(None))) else filter_str
    col = _YES()
    for t in terms:
        col = col & term_to_column(t, rib, supernet)
    return col

# rib families whose key chain bottoms out in the plain v4 / v6 prefix —
# for these a non-negated subnet term can only say Yes when the prefix
# containment holds, so a redundant plain range conjunct is sound
_V4_PREFIX_RIBS = ("ipv4u", "ipv4m", "ipv4lu", "vpnv4u", "vpnv4m")
_V6_PREFIX_RIBS = ("ipv6u", "ipv6lu", "vpnv6u", "vpnv6m")
_RD_RIBS = ("vpnv4u", "vpnv4m", "vpnv6u", "vpnv6m", "l2vpls", "ipv4mdt", "ipv6mdt")

def pushdown_prefilter(terms: list[FilterTerm], rib: str) -> Column:
    """Scan-pushable necessary conditions implied by the 3VL filter.

    The full 3VL expression is a CASE tree parquet cannot push; this
    derives plain range/equality conjuncts that Catalyst DOES push into
    the scan (min/max row-group skipping + partition pruning) — the
    100 TB substitute for the reference's BTreeMap range access path
    (src/ribfilter.rs:563-580 find_least_subnet). Sound because for a
    non-negated V4/V6 term, key-No rejects and key-Unknown can at best
    leave the conjunction Unknown (not emitted); likewise RD equality on
    rd-keyed families."""
    pre = _YES()
    for t in terms:
        if t.negated:
            continue
        if isinstance(t.item, V4Term) and rib in _V4_PREFIX_RIBS:
            first, last = v4_net_range(t.item.addr, t.item.plen)
            pre = pre & iputil.v4_subnet_contains(
                _ADDR4(), _PLEN(), first, last, t.item.plen
            )
        elif isinstance(t.item, V6Term) and rib in _V6_PREFIX_RIBS:
            first, last = v6_net_range(t.item.addr, t.item.plen)
            pre = pre & iputil.v6_subnet_contains(
                _ADDR6(), _PLEN(), first, last, t.item.plen
            )
        elif isinstance(t.item, RDTerm) and rib in _RD_RIBS:
            pre = pre & (F.col("rd_hi") == t.item.hi) & (F.col("rd_lo") == t.item.lo)
    return pre

def matches(filter_str: str | None, rib: str, supernet: bool = False) -> Column:
    """TRUE iff the filter says Yes. In subnet mode the pushable
    prefilter is conjoined so the scan prunes before the 3VL tree runs."""
    terms = parse_filter(filter_str) if isinstance(filter_str, (str, type(None))) else filter_str
    col = F.coalesce(filter_to_column(terms, rib, supernet), _NO())
    if not supernet:
        col = pushdown_prefilter(terms, rib) & col
    return col

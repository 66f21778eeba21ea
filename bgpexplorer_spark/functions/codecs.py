"""RD / community / ext-community / AS-path codecs (SURVEY.md §2.6 C3-C5, C7).

All pure Column algebra. Rendering matches the reference's display forms
(RD "A:B" — src/ribfilter.rs:1089-1129; community "hi:lo" —
contrib/index.html:124-132; AS-path Seq "1 2 3" / Set "{1 2 3}" —
contrib/index.html:198-205).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Route distinguisher (C3)
# ---------------------------------------------------------------------------

RD_IP_FLAG = 0x10000  # IP-form RD carries a type flag in rd_hi (src/ribfilter.rs:1089-1129)

def parse_rd(s: str) -> tuple[int, int]:
    """'100:1000' → (100, 1000); '1.2.3.4:5' → (ip_as_int | flag upper bits, 5).

    Reference encodes IPv4-form RDs with a 0x10000 marker in the high part
    (src/ribfilter.rs:1106-1122).
    """
    left, _, right = s.rpartition(":")
    if "." in left:
        from bgpexplorer_spark.functions.iputil import parse_v4

        # type-1 RD layout: high part = flag | ip[31:16], low part =
        # ip[15:0] << 16 | assigned number
        ip = parse_v4(left)
        return RD_IP_FLAG | (ip >> 16), ((ip & 0xFFFF) << 16) | int(right)
    return int(left), int(right)

def rd_to_str(rd_hi: Column, rd_lo: Column) -> Column:
    return F.concat_ws(":", rd_hi.cast("string"), rd_lo.cast("string"))

# ---------------------------------------------------------------------------
# Communities (C4)
# ---------------------------------------------------------------------------

def parse_community(s: str) -> int:
    """'100:200' → 100*65536+200 (src/ribfilter.rs:1168-1187)."""
    hi, _, lo = s.partition(":")
    return (int(hi) << 16) | int(lo)

def community_to_str(c: Column) -> Column:
    return F.concat_ws(
        ":", F.shiftright(c, 16).bitwiseAND(F.lit(0xFFFF)).cast("string"),
        c.bitwiseAND(F.lit(0xFFFF)).cast("string"),
    )

def comms_to_str(comms: Column) -> Column:
    """ARRAY<BIGINT> → '100:200 300:400' display string (for re: matching F8)."""
    return F.concat_ws(" ", F.transform(comms, community_to_str))

# ---------------------------------------------------------------------------
# Ext-communities (C5) — {ctype, subtype, a, b}
# ---------------------------------------------------------------------------

def extcomm_to_str(e: Column) -> Column:
    """Typed rendering, abbreviated 'ctype:subtype:a:b' plus the common
    route-target form 'rt:a:b' for subtype 2 (contrib/index.html:136-173)."""
    return F.when(
        e.getField("subtype") == F.lit(2),
        F.concat_ws(":", F.lit("rt"), e.getField("a").cast("string"), e.getField("b").cast("string")),
    ).otherwise(
        F.concat_ws(
            ":",
            e.getField("ctype").cast("string"), e.getField("subtype").cast("string"),
            e.getField("a").cast("string"), e.getField("b").cast("string"),
        )
    )

def extcomms_to_str(extcomms: Column) -> Column:
    return F.concat_ws(" ", F.transform(extcomms, extcomm_to_str))

def lcomms_to_str(lcomms: Column) -> Column:
    return F.concat_ws(
        " ",
        F.transform(
            lcomms,
            lambda x: F.concat_ws(
                ":", x.getField("ga").cast("string"),
                x.getField("ldp1").cast("string"), x.getField("ldp2").cast("string"),
            ),
        ),
    )

# ---------------------------------------------------------------------------
# AS-path (C7)
# ---------------------------------------------------------------------------

def aspath_to_str(aspath: Column) -> Column:
    """ARRAY<STRUCT<kind, asns>> → 'Seq "1 2 3"' style flat display:
    Seq segments as '1 2 3', Set segments as '{1 2 3}'
    (contrib/index.html:198-205)."""
    seg = lambda s: F.when(  # noqa: E731
        s.getField("kind") == F.lit("Set"),
        F.concat(F.lit("{"), F.concat_ws(" ", F.transform(s.getField("asns"), lambda a: a.cast("string"))), F.lit("}")),
    ).otherwise(F.concat_ws(" ", F.transform(s.getField("asns"), lambda a: a.cast("string"))))
    return F.concat_ws(" ", F.transform(aspath, seg))

def aspath_flatten(aspath: Column) -> Column:
    """Flatten Seq and Set segments into one ARRAY<BIGINT> — the form the
    reference indexes and matches against (src/bgprib.rs:629-642)."""
    return F.flatten(F.transform(aspath, lambda s: s.getField("asns")))

def array_contiguous_subseq(haystack: Column, needle: list[int]) -> Column:
    """True iff ``needle`` appears as a CONTIGUOUS subsequence of the
    BIGINT array (F5 ``as:a,b`` Contains semantics —
    src/ribfilter.rs:1471-1504).

    Pure Column algebra, codegen-able: the index-lambda filter probes
    each start position with O(1) ``get`` element lookups — no per-offset
    ``sequence``/``slice`` array allocations (those made the original
    exists/slice form the most expensive expression in the filter kit).
    ``get`` returns NULL past the end (never throws, ANSI-safe), so a
    start too close to the tail yields NULL and is dropped by filter().

    Two PREFILTERS guard the positional walk, cheapest first (Spark's
    ``And`` short-circuits, so rows shed by an early conjunct never pay
    for the later ones): (1) ``size(haystack) >= k`` — a path shorter
    than the needle can't contain it, and the length probe is O(1) vs
    the intersect's hash-set build; (2) every distinct needle element
    must appear in the haystack (``array_intersect`` size check). Both
    are necessary conditions ahead of the O(len × k) offset scan; NULL
    haystacks stay NULL through every conjunct (3VL unchanged —
    ``size(NULL)`` is NULL under ANSI).
    """
    k = len(needle)
    distinct = sorted(set(needle))
    member = F.array([F.lit(a).cast("bigint") for a in distinct])
    prefilter = (F.size(haystack) >= k) & (
        F.size(F.array_intersect(haystack, member)) == len(distinct)
    )
    if k == 1:
        # single-AS needle: membership IS the contiguous-subsequence test
        return prefilter

    def at_offset(x: Column, i: Column) -> Column:
        cond = x == F.lit(needle[0]).cast("bigint")
        for j in range(1, k):
            cond = cond & (F.get(haystack, i + F.lit(j)) == F.lit(needle[j]).cast("bigint"))
        return cond

    return prefilter & (F.size(F.filter(haystack, at_offset)) > 0)

"""Filter-term grammar (SURVEY.md §2.3; reference parser
src/ribfilter.rs:945-1266 — regex dispatch, re-expressed, not ported
line-by-line).

A filter string is space-separated terms, each optionally prefixed ``+``
(must match) or ``-`` (must NOT match); unparseable terms are silently
dropped (reference: FilterItem::None → term skipped,
src/ribfilter.rs:1516-1546).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from bgpexplorer_spark.functions.iputil import (
    parse_v4,
    parse_v6,
    v4_net_range,
    v6_net_range,
)

# --- term dataclasses -------------------------------------------------------

@dataclass(frozen=True)
class V4Term:
    """F1 — subnet term; ``multicast`` ⇔ net ⊆ 224.0.0.0/4 (the zettabgp
    prefix-multicast test used at parse: src/ribfilter.rs:1003-1008)."""
    addr: int
    plen: int
    multicast: bool

@dataclass(frozen=True)
class V6Term:
    addr: bytes
    plen: int
    multicast: bool

@dataclass(frozen=True)
class NH4Term:
    """F3 — nexthop-in-subnet (src/ribfilter.rs:1041-1088)."""
    addr: int
    plen: int

@dataclass(frozen=True)
class NH6Term:
    addr: bytes
    plen: int

@dataclass(frozen=True)
class RDTerm:
    """F4 (src/ribfilter.rs:1089-1129); IP-form flagged with 0x10000."""
    hi: int
    lo: int

@dataclass(frozen=True)
class ASPathTerm:
    """F5 (src/ribfilter.rs:1130-1167, enum 112-119)."""
    mode: str  # 'empty' | 'contains' | 'startswith' | 'endswith' | 'full'
    asns: tuple[int, ...] = field(default_factory=tuple)

@dataclass(frozen=True)
class CommunityTerm:
    """F6 — u32 community (src/ribfilter.rs:1168-1187)."""
    value: int

@dataclass(frozen=True)
class ExtCommTerm:
    """F7 — rt:/target:/ext-target: forms (src/ribfilter.rs:1202-1263,
    match src/ribfilter.rs:504-540)."""
    kind: str  # 'num' | 'pair' | 'ip' | 'ipnum'
    n: int = 0
    a: int = 0
    b: int = 0
    ip_first: int = 0  # the rt:IP address for ip/ipnum forms

@dataclass(frozen=True)
class RegexTerm:
    """F8 — soft regex over stringified key/attrs (src/ribfilter.rs:1188-1201)."""
    pattern: str

@dataclass(frozen=True)
class NumTerm:
    """F9 — bare-number polymorphic term (src/ribfilter.rs:969-982)."""
    n: int

Item = (
    V4Term | V6Term | NH4Term | NH6Term | RDTerm | ASPathTerm
    | CommunityTerm | ExtCommTerm | RegexTerm | NumTerm
)

@dataclass(frozen=True)
class FilterTerm:
    item: Item
    negated: bool = False  # '-' prefix (F10)

# --- parsing ----------------------------------------------------------------

_RE_NUM = re.compile(r"^([0-9]+)$")
_RE_IPV4 = re.compile(r"^([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+)(/([0-9]+))?$")
_RE_IPV6 = re.compile(r"^([0-9A-Fa-f:]+)(/([0-9]+))?$")
_RE_NH4 = re.compile(r"^nh:([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+)(/([0-9]+))?$")
_RE_NH6 = re.compile(r"^nh:([0-9A-Fa-f:]+)(/([0-9]+))?$")
_RE_RD = re.compile(r"^rd:([0-9]+):([0-9]+)$")
_RE_RDIP = re.compile(r"^rd:([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+):([0-9]+)$")
_RE_AS = re.compile(r"^as:(\^*)([0-9,]+)?(\$)?$")
_RE_C = re.compile(r"^c[^:]*:([0-9]+):([0-9]+)$")
_RE_RE = re.compile(r"^re:(.*)$")
_RE_RT_N = re.compile(r"^(?:rt|target|ext-target):([0-9]+)$")
_RE_RT_P = re.compile(r"^(?:rt|target|ext-target):([0-9]+):([0-9]+)$")
_RE_RT_IP = re.compile(r"^(?:rt|target|ext-target):([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+)$")
_RE_RT_IPN = re.compile(r"^(?:rt|target|ext-target):([0-9]+\.[0-9]+\.[0-9]+\.[0-9]+):([0-9]+)$")

def _prefix_mc_v4(addr: int, plen: int) -> bool:
    """net ⊆ 224.0.0.0/4 (zettabgp BgpAddrV4::is_multicast)."""
    return plen >= 4 and (addr >> 28) == 0xE

def _prefix_mc_v6(addr: bytes, plen: int) -> bool:
    """net ⊆ ff00::/8."""
    return plen >= 8 and addr[0] == 0xFF

def parse_item(s: str) -> Item | None:
    """One term body → Item, or None if unparseable. Dispatch order follows
    the reference: Num, v4, then the IPv6 regex IMMEDIATELY after v4 with
    an early None on parse failure — so all-hex-and-colon tokens like
    ``c:100:200`` or ``cafe:1:2`` are silently dropped, never falling
    through to the community/rt arms (src/ribfilter.rs:945-1040)."""
    if m := _RE_NUM.match(s):
        return NumTerm(int(m.group(1)))
    if m := _RE_IPV4.match(s):
        try:
            addr = parse_v4(m.group(1))
        except ValueError:
            return None
        plen = int(m.group(3)) if m.group(3) else 32
        if plen > 32:
            return None
        first, _ = v4_net_range(addr, plen)
        return V4Term(first, plen, _prefix_mc_v4(first, plen))
    if m := _RE_IPV6.match(s):
        try:
            addr = parse_v6(m.group(1))
        except ValueError:
            return None  # reference early-returns: token consumed, dropped
        plen = int(m.group(3)) if m.group(3) else 128
        if plen > 128:
            return None
        first, _ = v6_net_range(addr, plen)
        return V6Term(first, plen, _prefix_mc_v6(first, plen))
    if m := _RE_NH4.match(s):
        try:
            addr = parse_v4(m.group(1))
        except ValueError:
            return None
        plen = int(m.group(3)) if m.group(3) else 32
        return NH4Term(addr, plen) if plen <= 32 else None
    if m := _RE_NH6.match(s):
        try:
            addr = parse_v6(m.group(1))
        except ValueError:
            return None
        plen = int(m.group(3)) if m.group(3) else 128
        return NH6Term(addr, plen) if plen <= 128 else None
    if m := _RE_RD.match(s):
        return RDTerm(int(m.group(1)), int(m.group(2)))
    if m := _RE_RDIP.match(s):
        try:
            ip = parse_v4(m.group(1))
        except ValueError:
            return None
        # IP-form RD: type-1 marker 0x10000 in the high part; the assigned
        # number is masked to 16 bits (vls[4] & 0xffff,
        # src/ribfilter.rs:1106-1122)
        return RDTerm(
            0x10000 | (ip >> 16), ((ip & 0xFFFF) << 16) | (int(m.group(2)) & 0xFFFF)
        )
    if m := _RE_AS.match(s):
        caret, nums, dollar = m.group(1), m.group(2), m.group(3)
        asns = tuple(int(x) for x in (nums or "").split(",") if x)
        if not asns:
            return ASPathTerm("empty")
        # the reference compares the caret group against exactly '^'
        # (sb == "^"), so 'as:^^1' degrades to Contains
        anchored = caret == "^"
        if anchored and dollar:
            return ASPathTerm("full", asns)
        if anchored:
            return ASPathTerm("startswith", asns)
        if dollar:
            return ASPathTerm("endswith", asns)
        return ASPathTerm("contains", asns)
    if m := _RE_C.match(s):
        hi, lo = int(m.group(1)), int(m.group(2))
        if hi > 0xFFFF or lo > 0xFFFF:
            return None
        return CommunityTerm((hi << 16) | lo)
    if m := _RE_RT_P.match(s):
        return ExtCommTerm("pair", a=int(m.group(1)), b=int(m.group(2)))
    if m := _RE_RT_N.match(s):
        return ExtCommTerm("num", n=int(m.group(1)))
    if m := _RE_RT_IPN.match(s):
        try:
            ip = parse_v4(m.group(1))
        except ValueError:
            return None
        return ExtCommTerm("ipnum", n=int(m.group(2)), ip_first=ip)
    if m := _RE_RT_IP.match(s):
        try:
            ip = parse_v4(m.group(1))
        except ValueError:
            return None
        return ExtCommTerm("ip", ip_first=ip)
    if m := _RE_RE.match(s):
        # the reference compiles the Regex at parse time and maps a bad
        # pattern to FilterItem::None (term dropped, src/ribfilter.rs
        # FilterTerm::parse) — validate here too, or the invalid pattern
        # reaches rlike() and crashes the whole query at execution
        try:
            re.compile(m.group(1))
        except re.error:
            return None
        return RegexTerm(m.group(1))
    return None

def parse_filter(s: str | None) -> list[FilterTerm]:
    """Space-separated terms with +/- polarity (src/ribfilter.rs:1516-1546)."""
    terms: list[FilterTerm] = []
    for tok in (s or "").split():
        negated = False
        body = tok
        if tok[0] in "+-" and len(tok) > 1:
            negated = tok[0] == "-"
            body = tok[1:]
        item = parse_item(body)
        if item is not None:
            terms.append(FilterTerm(item, negated))
    return terms

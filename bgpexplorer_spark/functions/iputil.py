"""IP/prefix helpers (SURVEY.md §2.6 C1-C2).

Two halves:

1. **Driver-side literal parsing** (plain Python, used when compiling a
   filter string — reference parse: src/ribfilter.rs:945-1040): IPv4 →
   unsigned int carried as Python int, IPv6 → 16 bytes. These become
   ``F.lit`` values in Column predicates.

2. **Column-side algebra** for route columns: subnet containment,
   net-first/net-last, canonical string rendering. IPv4 routes are stored
   as sortable BIGINT; IPv6 as 16-byte BINARY whose lexicographic
   (unsigned bytewise) order equals numeric order, reproducing the
   reference's BTreeMap range-scan key order (src/ribfilter.rs:231-305).

Everything is built-in-function algebra — codegen-able by Catalyst, and
range predicates on the numeric forms push down to parquet min/max stats
(the 100 TB substitute for the reference's in-RAM BTreeMap range scan).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Driver-side literal parsing (C1)
# ---------------------------------------------------------------------------

V4_MAX = (1 << 32) - 1

def parse_v4(s: str) -> int:
    """'10.1.2.3' → unsigned int."""
    return int(ipaddress.IPv4Address(s))

def parse_v6(s: str) -> bytes:
    """'2c0a::1' → 16 big-endian bytes."""
    return ipaddress.IPv6Address(s).packed

def v4_net_range(addr: int, prefixlen: int) -> tuple[int, int]:
    """(network address, broadcast address) of addr/prefixlen."""
    mask = ((1 << prefixlen) - 1) << (32 - prefixlen) if prefixlen else 0
    first = addr & mask
    return first, first | (V4_MAX ^ mask)

def v6_net_range(addr: bytes, prefixlen: int) -> tuple[bytes, bytes]:
    n = int.from_bytes(addr, "big")
    mask = ((1 << prefixlen) - 1) << (128 - prefixlen) if prefixlen else 0
    first = n & mask
    last = first | (((1 << 128) - 1) ^ mask)
    return first.to_bytes(16, "big"), last.to_bytes(16, "big")

def is_multicast_v4(addr: int) -> bool:
    """224.0.0.0 ≤ a ≤ 255.255.255.254 (reference: src/service.rs:36-38 —
    multicast test is first-octet ≥ 224 excluding limited broadcast)."""
    return (addr >> 24) >= 224 and addr != V4_MAX

def is_multicast_v6(addr: bytes) -> bool:
    """First byte 0xff (reference: src/service.rs:39-41)."""
    return addr[0] == 0xFF

def fmt_v4(addr: int) -> str:
    return str(ipaddress.IPv4Address(addr))

def fmt_v6(addr: bytes) -> str:
    return str(ipaddress.IPv6Address(addr))

# ---------------------------------------------------------------------------
# Column-side algebra (C2)
# ---------------------------------------------------------------------------

def v4_from_dotted(col: Column) -> Column:
    """Dotted-quad string column → BIGINT."""
    p = F.split(col, r"\.")
    return (
        p.getItem(0).cast("bigint") * F.lit(16777216)
        + p.getItem(1).cast("bigint") * F.lit(65536)
        + p.getItem(2).cast("bigint") * F.lit(256)
        + p.getItem(3).cast("bigint")
    )

def v4_to_dotted(col: Column) -> Column:
    """BIGINT → dotted-quad string (canonical print, C1)."""
    return F.concat_ws(
        ".",
        F.shiftright(col, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(col, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(col, 8).bitwiseAND(F.lit(255)).cast("string"),
        col.bitwiseAND(F.lit(255)).cast("string"),
    )

def v6_to_str(col: Column) -> Column:
    """BINARY(16) → canonical IPv6 text, matching Rust's
    ``Ipv6Addr::Display`` (what the reference regex-scans when stringifying
    a v6 nexthop, src/ribfilter.rs:1463-1470): lowercase hex groups with
    no leading zeros, the longest run of ≥2 zero groups compressed to
    ``::`` (leftmost on ties), IPv4-mapped rendered ``::ffff:a.b.c.d``.

    Pure Column algebra (codegen-able — no UDF): extract the longest zero
    run with one regexp, then splice with position/substring. Only built
    when a ``re:`` filter term is present."""

    def group(i: int) -> Column:
        # 2-byte group → lowercase hex, leading zeros stripped
        return F.regexp_replace(
            F.lower(F.hex(F.substring(col, 2 * i + 1, 2))), "^0{1,3}", ""
        )

    full = F.concat_ws(":", *[group(i) for i in range(8)])
    runs = F.regexp_extract_all(full, F.lit(r"(?:^|:)(0(?::0)+)(?=:|$)"), 1)
    # runs are all of the form 0(:0)* so lexicographic max == longest
    longest = F.array_max(runs)
    padded = F.concat(F.lit(":"), full, F.lit(":"))
    pos = F.position(F.concat(F.lit(":"), longest, F.lit(":")), padded)
    left = F.substring(padded, F.lit(2), pos - 2)
    right_pad = F.substring(padded, pos + F.length(longest) + 2, F.lit(64))
    right = F.substring(right_pad, F.lit(1), F.length(right_pad) - 1)
    compressed = F.concat(left, F.lit("::"), right)

    mapped_prefix = bytes(10) + b"\xff\xff"
    v4_tail = (
        _v6_byte(col, 12).cast("bigint") * F.lit(16777216)
        + _v6_byte(col, 13).cast("bigint") * F.lit(65536)
        + _v6_byte(col, 14).cast("bigint") * F.lit(256)
        + _v6_byte(col, 15).cast("bigint")
    )
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(
            F.substring(col, 1, 12) == F.lit(mapped_prefix),
            F.concat(F.lit("::ffff:"), v4_to_dotted(v4_tail)),
        )
        .when(F.size(runs) > 0, compressed)
        .otherwise(full)
    )

def v4_net_last_col(addr: Column, prefixlen: Column) -> Column:
    """Broadcast address with a *column* prefixlen: addr | (2^(32-len)-1).

    Routes are stored canonical (addr == network address), so
    last = addr + 2^(32-len) - 1. shiftleft on BIGINT keeps 64-bit
    semantics, safe for len=0.
    """
    # 2^(32-len) via pow(): powers of two are exact in double up to 2^52,
    # and shiftleft()'s python API only takes literal shift amounts.
    span = F.pow(F.lit(2.0), (F.lit(32) - prefixlen)).cast("bigint") - F.lit(1)
    return addr + span

def _v6_byte(addr: Column, i: int) -> Column:
    """i-th byte (0-based) of a BINARY(16) column as INT."""
    return F.conv(F.hex(F.substring(addr, i + 1, 1)), 16, 10).cast("int")

def v6_net_last_col(addr: Column, prefixlen: Column) -> Column:
    """Last address of a canonical v6 net with *column* prefixlen.

    Byte-unrolled pure-Column construction (no UDF): for byte i the number
    of network bits is clamp(prefixlen - 8i, 0, 8); the host bits are set
    to 1. Verbose but fully JVM-side; only used on the (rare) supernet
    fallback path (SURVEY.md §2.5 O5).
    """
    out_bytes = []
    for i in range(16):
        bits = F.greatest(F.lit(0), F.least(F.lit(8), prefixlen - F.lit(8 * i)))
        host_mask = F.pow(F.lit(2.0), F.lit(8) - bits).cast("int") - F.lit(1)
        b = _v6_byte(addr, i).bitwiseOR(host_mask.cast("int"))
        out_bytes.append(F.unhex(F.lpad(F.hex(b), 2, "0")))
    return F.concat(*out_bytes)

def v4_subnet_contains(
    route_addr: Column, route_plen: Column, net_first: int, net_last: int, net_plen: int
) -> Column:
    """Route prefix ⊆ literal filter net (reference F1 semantics:
    src/ribfilter.rs:1368-1392, 250-277).

    With canonical route addresses this is a pure range predicate —
    parquet min/max prunable: net_first ≤ addr ≤ net_last ∧ plen ≥ f_plen.
    """
    return (
        (route_addr >= F.lit(net_first))
        & (route_addr <= F.lit(net_last))
        & (route_plen >= F.lit(net_plen))
    )

def v6_subnet_contains(
    route_addr: Column, route_plen: Column, net_first: bytes, net_last: bytes, net_plen: int
) -> Column:
    """Same as v4_subnet_contains on lex-comparable BINARY(16)."""
    return (
        (route_addr >= F.lit(net_first))
        & (route_addr <= F.lit(net_last))
        & (route_plen >= F.lit(net_plen))
    )

def v4_supernet_contains(
    route_addr: Column, route_plen: Column, net_first: int, net_last: int
) -> Column:
    """Route prefix ⊇ literal filter net — the reversed containment of the
    supernet/LPM fallback (src/ribfilter.rs:1350-1366, 620-683)."""
    return (route_addr <= F.lit(net_first)) & (
        v4_net_last_col(route_addr, route_plen) >= F.lit(net_last)
    )

def v6_supernet_contains(
    route_addr: Column, route_plen: Column, net_first: bytes, net_last: bytes
) -> Column:
    return (route_addr <= F.lit(net_first)) & (
        v6_net_last_col(route_addr, route_plen) >= F.lit(net_last)
    )

def v4_in_subnet(addr: Column, net_first: int, net_last: int) -> Column:
    """Host address ∈ literal net — used for nexthop terms (F3:
    src/ribfilter.rs:1430-1441) and MVPN/MDT nested addresses."""
    return (addr >= F.lit(net_first)) & (addr <= F.lit(net_last))

def v6_in_subnet(addr: Column, net_first: bytes, net_last: bytes) -> Column:
    return (addr >= F.lit(net_first)) & (addr <= F.lit(net_last))

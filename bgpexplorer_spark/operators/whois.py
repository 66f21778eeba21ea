"""Whois / DNS-PTR enrichment with TTL cache (SURVEY.md §2.1 S9-S11,
§2.4 J5, §2.6 C9; reference src/whoissvc.rs).

- Upstream whois: TCP port-43 query with referral following (≤16 hops,
  loop-protected — src/whoissvc.rs:395-457). The transport is injectable
  so environments without network (this container, unit tests) plug a
  fake; the protocol/recursion logic is real.
- DNS PTR: reverse-name construction (in-addr.arpa / ip6.arpa,
  src/whoissvc.rs:251-329); resolution itself goes through the same
  injectable transport.
- Cache (S11): a parquet table with WHOIS_CACHE_SCHEMA rows; reads serve
  stale values and flag them for background refresh
  (stale-while-revalidate, src/whoissvc.rs:302-329); upsert is
  anti-join + union (MERGE without Delta).
- J5: ``enrich`` is a broadcast lookup join against the cache table.
"""

from __future__ import annotations

import datetime as dt
import ipaddress
import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bgpexplorer_spark.schemas import WHOIS_CACHE_SCHEMA

Transport = Callable[[str, str], str]  # (server, query) -> response text

# ARIN-style referrals carry a port ("ReferralServer: whois://whois.arin.net:43")
REFERRAL_RE = re.compile(
    r"(?:refer|ReferralServer|whois):\s*(?:whois://)?"
    r"([A-Za-z0-9.\-]+(?::\d+)?)",
    re.IGNORECASE,
)
MAX_REFERRALS = 16  # src/whoissvc.rs:395-457

def _server_hostport(server: str) -> tuple[str, int]:
    """whois server string → (host, port 43 default) via the shared
    guarded split (config.parse_hostport): handles ``host``,
    ``host:port``, bracketed v6, and bare v6 literals; malformed
    strings fail loudly instead of feeding garbage to getaddrinfo."""
    from bgpexplorer_spark.config import parse_hostport

    return parse_hostport(server, 43)


def socket_transport(timeout: float = 30.0) -> Transport:
    """Real whois TCP transport (whois_request_timeout default 30 s,
    src/config.rs:580-595). ``server`` is ``host`` (port 43) or
    ``host:port`` — map entries and ARIN-style referrals both carry
    explicit ports in the wild."""

    def send(server: str, query: str) -> str:
        import socket

        host, port = _server_hostport(server)
        with socket.create_connection((host, port), timeout=timeout) as s:
            s.sendall((query + "\r\n").encode())
            chunks = []
            while True:
                b = s.recv(4096)
                if not b:
                    break
                chunks.append(b)
        return b"".join(chunks).decode(errors="replace")

    return send

class WhoisServerMap:
    """Registry→server map with per-server query templates — the
    reference's ``whoisjsonconfig`` file (whois.json:1-9, loaded as
    ``whoisconfig: WhoIs`` at src/config.rs:338,596-605; format is the
    whois-rust / node-whois ``servers.json`` shape):

    - top-level keys are domain suffixes (``"org"`` → whois.pir.org);
      ``""`` is the domain fallback (whois.ripe.net in the shipped file);
    - the ``"_"`` key holds the IP rule: ``{"ip": {"host", "query"}}``
      where ``$addr`` in the query template is replaced by the target
      (ARIN needs ``"n + $addr\\r\\n"``);
    - any value may be a plain host string or ``{"host", "query"}``.

    ``resolve`` returns (server, wire_query_text) — which server to dial
    and the exact bytes-before-CRLF to send for this target."""

    DEFAULT_QUERY = "$addr\r\n"

    def __init__(self, mapping: dict | None = None) -> None:
        self.mapping = mapping or {}

    @classmethod
    def from_json_file(cls, path: str) -> "WhoisServerMap":
        import json

        with open(path, encoding="utf-8") as f:
            return cls(json.load(f))

    @staticmethod
    def _host_query(entry) -> tuple[str | None, str]:
        if isinstance(entry, str):
            return (entry or None), WhoisServerMap.DEFAULT_QUERY
        if isinstance(entry, dict):
            return entry.get("host"), entry.get("query", WhoisServerMap.DEFAULT_QUERY)
        return None, WhoisServerMap.DEFAULT_QUERY

    def resolve(self, target: str, fallback_server: str = "whois.iana.org") -> tuple[str, str]:
        is_ip = True
        try:
            ipaddress.ip_address(target.split("/")[0])
        except ValueError:
            # bare AS numbers query like IPs (registry objects, not domains)
            is_ip = target.upper().startswith("AS") and target[2:].isdigit()
        if is_ip:
            entry = (self.mapping.get("_") or {}).get("ip")
            host, query = self._host_query(entry)
        else:
            labels = target.lower().rstrip(".").split(".")
            host, query = None, self.DEFAULT_QUERY
            # longest-suffix match, then the "" default
            for i in range(1, len(labels)):
                cand = ".".join(labels[i:])
                if cand in self.mapping:
                    host, query = self._host_query(self.mapping[cand])
                    break
            if host is None and "" in self.mapping:
                host, query = self._host_query(self.mapping[""])
        if host is None:
            host, query = fallback_server, self.DEFAULT_QUERY
        return host, query.replace("$addr", target)


def query_whois(
    query: str,
    transport: Transport,
    start_server: str = "whois.iana.org",
    server_map: WhoisServerMap | None = None,
) -> tuple[str, str]:
    """Referral-following whois (src/whoissvc.rs:395-457): follow
    refer:/ReferralServer: responses up to 16 hops, loop-protected.
    With a ``server_map`` (whoisjsonconfig, src/config.rs:596-605) the
    first hop and its query template come from the map — e.g. ARIN's
    ``n + $addr`` syntax — instead of the IANA referral walk; referrals
    from there still follow. Returns (final_server, response_text)."""
    wire_query = query
    if server_map is not None:
        start_server, templated = server_map.resolve(query, start_server)
        wire_query = templated.rstrip("\r\n")  # transport appends CRLF

    def key(s: str) -> tuple[str, int]:
        # loop protection on (host, port), not the raw spelling:
        # 'whois.arin.net' and 'whois.arin.net:43' are the SAME server
        try:
            return _server_hostport(s.lower())
        except ValueError:
            return (s.lower(), 43)

    seen: set[tuple[str, int]] = set()
    server = start_server
    text = ""
    for _ in range(MAX_REFERRALS):
        k = key(server)
        if k in seen:
            break
        seen.add(k)
        text = transport(server, wire_query)
        m = REFERRAL_RE.search(text)
        if not m:
            break
        referral = m.group(1).lower()
        try:
            # validate BEFORE hopping: a referral advertising a
            # malformed/out-of-range port (e.g. 'host:99999') would pass
            # key()'s tolerant fallback but blow up in the transport —
            # return the text gathered so far instead of failing the call
            rk = _server_hostport(referral)
        except ValueError:
            break
        if rk in seen:
            break
        server = referral
        # referral hops speak plain whois, not the mapped template
        wire_query = query
    return server, text

def reverse_dns_name(addr: str) -> str:
    """in-addr.arpa / ip6.arpa PTR name (src/whoissvc.rs:251-329)."""
    ip = ipaddress.ip_address(addr)
    return ip.reverse_pointer

# --- S10: DNS PTR wire resolution ------------------------------------------
# The reference builds and sends the UDP DNS query itself
# (src/whoissvc.rs:251-394: reverse-name build, dnssector query gen, tid +
# question echo validation, PTR rdata label walk). Same here, pure Python,
# behind an injectable packet transport so tests run on canned packets and
# offline containers skip the socket.

DnsTransport = Callable[[bytes], bytes]  # request packet -> response packet

def udp_dns_transport(
    servers: list[str] | None = None, timeout: float = 5.0
) -> DnsTransport:
    """Real UDP transport; server choice hashes on the first query byte
    like the reference's ``self.dns[target[0] % len]``
    (src/whoissvc.rs:349-352). Servers come from the ``whoisdns`` ini key
    (src/config.rs:616-638) as ``host`` or ``host:port`` strings — split
    by the shared guarded parser (bracketed v6 works, malformed fails
    loudly at construction, not at send time)."""
    from bgpexplorer_spark.config import parse_hostport

    servers = servers or ["1.1.1.1:53"]
    parsed = [parse_hostport(s, 53) for s in servers]

    def send(packet: bytes) -> bytes:
        import socket

        # first question byte (after the 12B header) picks the server
        host, port = parsed[packet[12] % len(parsed)]
        with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
            s.settimeout(timeout)
            s.sendto(packet, (host, port))
            data, _ = s.recvfrom(4096)
        return data

    return send

def dns_reverse_name(addr: str) -> str:
    """The reference's exact reverse-name rendering
    (src/whoissvc.rs:258-291): v4 → ``d.c.b.a.IN-ADDR.ARPA.``; v6 →
    per-octet low-nibble/high-nibble pairs reversed + ``ip6.arpa.``."""
    ip = ipaddress.ip_address(addr)
    if ip.version == 4:
        o = ip.packed
        return f"{o[3]}.{o[2]}.{o[1]}.{o[0]}.IN-ADDR.ARPA."
    parts = []
    for o in reversed(ip.packed):
        parts.append(f"{o & 0xF:x}.{o >> 4:x}.")
    return "".join(parts) + "ip6.arpa."

def build_dns_query(name: str, qtype: int = 12, tid: int = 0) -> bytes:
    """One-question DNS query packet: header (tid, RD), QNAME labels,
    QTYPE, QCLASS=IN."""
    import struct

    pkt = struct.pack(">HHHHHH", tid, 0x0100, 1, 0, 0, 0)
    for label in name.rstrip(".").split("."):
        raw = label.encode()
        pkt += bytes([len(raw)]) + raw
    pkt += b"\x00" + struct.pack(">HH", qtype, 1)
    return pkt

def _read_dns_name(msg: bytes, off: int) -> tuple[str, int]:
    """Decompress a (possibly pointer-compressed) DNS name. Superset of
    the reference's raw label walk (src/whoissvc.rs:370-387), which stops
    at compression pointers; real servers compress PTR rdata routinely."""
    labels = []
    jumps = 0
    end = None
    while True:
        if off >= len(msg) or jumps > 32:
            break
        ln = msg[off]
        if ln == 0:
            if end is None:
                end = off + 1
            break
        if ln & 0xC0 == 0xC0:  # compression pointer
            if end is None:
                end = off + 2
            off = ((ln & 0x3F) << 8) | msg[off + 1]
            jumps += 1
            continue
        labels.append(msg[off + 1 : off + 1 + ln].decode(errors="replace"))
        off += 1 + ln
    return "".join(x + "." for x in labels), (end if end is not None else off)

def parse_dns_response(query: bytes, response: bytes) -> str:
    """Validate tid + question echo (src/whoissvc.rs:362-366), then return
    the first PTR answer's name (trailing-dot form, like the reference's
    label concatenation). Raises ValueError on mismatch / no answer."""
    import struct

    if response[:2] != query[:2]:
        raise ValueError("DNS tid mismatch")
    if not response[2] & 0x80:
        raise ValueError("not a DNS response")
    qdcount, ancount = struct.unpack(">HH", response[4:8])
    if qdcount != 1:
        raise ValueError("unexpected question count")
    # question must echo the query's (name bytes compare, case preserved)
    q_question = query[12:]
    if response[12 : 12 + len(q_question)] != q_question:
        raise ValueError("DNS question mismatch")
    off = 12 + len(q_question)
    for _ in range(ancount):
        _name, off = _read_dns_name(response, off)
        rtype, _rclass, _ttl, rdlen = struct.unpack(">HHIH", response[off : off + 10])
        off += 10
        if rtype == 12:  # PTR
            name, _ = _read_dns_name(response, off)
            return name
        off += rdlen
    raise ValueError("no PTR answer")

def query_dns_ptr(
    addr: str, transport: DnsTransport, tid: int | None = None
) -> str:
    """S10 end-to-end: reverse name → wire query → transport → validated
    PTR extraction (src/whoissvc.rs:251-394)."""
    if tid is None:
        import os

        tid = int.from_bytes(os.urandom(2), "big")
    q = build_dns_query(dns_reverse_name(addr), 12, tid)
    return parse_dns_response(q, transport(q))

# --- C9: whois text post-processing (Column algebra) -----------------------

def strip_comments(text: Column) -> Column:
    """Drop %/# comment lines (src/whoissvc.rs:491-518)."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda ln: ~F.trim(ln).startswith("%") & ~F.trim(ln).startswith("#"),
    )
    return F.concat_ws("\n", kept)

def extract_section(text: Column, header_re: str) -> Column:
    """skip_while until the section-header regex matches
    (src/whoissvc.rs:557-590): drop leading lines before the first
    header match."""
    lines = F.split(text, "\n")
    idx = F.array_position(F.transform(lines, lambda ln: ln.rlike(header_re)), F.lit(True))
    return F.when(idx > 0, F.concat_ws("\n", F.slice(lines, idx, F.size(lines)))).otherwise(F.lit(""))

# --- S11: cache table ------------------------------------------------------

def read_cache(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(WHOIS_CACHE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], WHOIS_CACHE_SCHEMA)

def cache_lookup(
    cache: DataFrame, kind: str, queries: DataFrame, ttl_seconds: int = 1800,
    now: dt.datetime | None = None,
) -> DataFrame:
    """Stale-while-revalidate read (src/whoissvc.rs:302-329): every cached
    value is served; rows older than the TTL carry ``stale=true`` so the
    caller schedules a background refresh. Missing rows appear with null
    val (fetch needed)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    c = cache.filter(F.col("kind") == kind)
    out = queries.join(c.drop("kind"), "query", "left")
    age = F.lit(now).cast("timestamp").cast("long") - F.col("ts").cast("long")
    return out.select(
        "query", "val", "ts",
        (F.col("ts").isNotNull() & (age > ttl_seconds)).alias("stale"),
    )

def cache_upsert(
    spark: SparkSession, path: str, kind: str, rows: list[tuple[str, str]],
    now: dt.datetime | None = None,
) -> None:
    """MERGE-by-rewrite: anti-join the old cache against the new keys,
    union, write tmp, atomic swap (at scale this would be a Delta MERGE or
    partition-scoped rewrite). The swap — not overwrite-in-place — means a
    failed write can never corrupt the live cache (same discipline as
    snapshot compaction, src/bgprib.rs:903-923)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    fresh = spark.createDataFrame(
        [(kind, q, now, v) for q, v in rows], WHOIS_CACHE_SCHEMA
    )
    old = read_cache(spark, path)
    keep = old.join(
        fresh.select("kind", "query"), ["kind", "query"], "left_anti"
    )
    merged = keep.unionByName(fresh)
    from bgpexplorer_spark.operators.rib import atomic_swap

    tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    atomic_swap(spark, tmp, path)

def enrich(
    df: DataFrame, cache: DataFrame, kind: str,
    query_col: str, out_col: str = "whois_val",
) -> DataFrame:
    """J5 — broadcast lookup join against the cache table
    (src/whoissvc.rs:520-595)."""
    lk = cache.filter(F.col("kind") == kind).select(
        F.col("query").alias(query_col), F.col("val").alias(out_col)
    )
    return df.join(F.broadcast(lk), query_col, "left")

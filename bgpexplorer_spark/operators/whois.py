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

REFERRAL_RE = re.compile(r"(?:refer|ReferralServer|whois):\s*(?:whois://)?([A-Za-z0-9.\-]+)", re.IGNORECASE)
MAX_REFERRALS = 16  # src/whoissvc.rs:395-457

def socket_transport(timeout: float = 30.0) -> Transport:
    """Real port-43 transport (whois_request_timeout default 30 s,
    src/config.rs:580-595)."""

    def send(server: str, query: str) -> str:
        import socket

        with socket.create_connection((server, 43), timeout=timeout) as s:
            s.sendall((query + "\r\n").encode())
            chunks = []
            while True:
                b = s.recv(4096)
                if not b:
                    break
                chunks.append(b)
        return b"".join(chunks).decode(errors="replace")

    return send

def query_whois(
    query: str, transport: Transport, start_server: str = "whois.iana.org"
) -> tuple[str, str]:
    """Referral-following whois (src/whoissvc.rs:395-457): follow
    refer:/ReferralServer: responses up to 16 hops, loop-protected.
    Returns (final_server, response_text)."""
    seen: set[str] = set()
    server = start_server
    text = ""
    for _ in range(MAX_REFERRALS):
        if server in seen:
            break
        seen.add(server)
        text = transport(server, query)
        m = REFERRAL_RE.search(text)
        if not m or m.group(1).lower() in seen:
            break
        server = m.group(1).lower()
    return server, text

def reverse_dns_name(addr: str) -> str:
    """in-addr.arpa / ip6.arpa PTR name (src/whoissvc.rs:251-329)."""
    ip = ipaddress.ip_address(addr)
    return ip.reverse_pointer

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
    union, overwrite (the Delta-less upsert; at scale this would be a
    Delta MERGE or partition-scoped rewrite)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    fresh = spark.createDataFrame(
        [(kind, q, now, v) for q, v in rows], WHOIS_CACHE_SCHEMA
    )
    old = read_cache(spark, path)
    keep = old.join(
        fresh.select("kind", "query"), ["kind", "query"], "left_anti"
    )
    merged = keep.unionByName(fresh)
    merged.cache().count()  # materialize before overwriting the source
    merged.write.mode("overwrite").parquet(path)

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

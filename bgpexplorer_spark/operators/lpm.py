"""Longest-prefix-match as a scalable JOIN (SURVEY.md §2.5 O5 generalized).

The reference's LPM is a single-address re-scan (``find_best_supernet``,
src/ribfilter.rs:719-738) — fine for one query, useless for joining a
billion flow records against a RIB. The Spark-first generalization is the
candidate-prefix equi-join: for each host address generate one masked
candidate per prefix length that actually occurs in the route table
(≤33 for v4), then equi-join on (masked_addr, prefixlen) and keep the
longest hit. No theta/range join, no cartesian: one broadcast of the
distinct-plen list + one shuffle on the join key — survives 100 TB of
hosts against a full DFZ table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def lpm_join_v4(
    hosts: DataFrame,
    routes: DataFrame,
    host_addr: str = "addr_v4",
    route_addr: str = "addr_v4",
    route_plen: str = "prefixlen",
    plens: list[int] | None = None,
) -> DataFrame:
    """For each host row, attach the longest route prefix containing its
    address (or no row if none — inner join semantics).

    ``routes`` must hold canonical network addresses. Candidate masking:
    floor(addr / 2^(32-plen)) * 2^(32-plen), built per distinct plen.
    Pass ``plens`` when the occurring prefix lengths are known to skip
    the discovery action (an IPv4 DFZ table has ≤25 of them; worst case
    33 candidates per host).
    """
    if plens is None:
        plens = [r[0] for r in routes.select(route_plen).distinct().collect()]
    plens = sorted(int(x) for x in plens)
    if not plens:
        return hosts.limit(0).crossJoin(routes.limit(0))

    cand = F.array(
        *[
            F.struct(
                F.lit(pl).alias("_plen"),
                (F.floor(F.col(host_addr) / F.lit(2 ** (32 - pl))).cast("bigint") * F.lit(2 ** (32 - pl))).alias("_net"),
            )
            for pl in plens
        ]
    )
    exploded = hosts.withColumn("_cand", F.explode(cand)).select(
        "*", F.col("_cand._plen").alias("_plen"), F.col("_cand._net").alias("_net")
    ).drop("_cand")

    joined = exploded.join(
        routes.withColumnRenamed(route_addr, "_net").withColumnRenamed(route_plen, "_plen"),
        ["_net", "_plen"],
        "inner",
    )
    # Keep the longest hit per host with groupBy + max(struct(plen, ...)):
    # map-side combinable partial agg, no per-partition sort — unlike a
    # row_number window, which forces a full shuffle+sort on the host key.
    # Ties are impossible: per (host, plen) the masked net is unique.
    host_cols = [c for c in hosts.columns]
    route_extra = [c for c in joined.columns if c not in host_cols and c not in ("_net", "_plen")]
    return (
        joined.groupBy(*host_cols)
        .agg(
            F.max(
                F.struct(F.col("_plen"), F.col("_net"), *[F.col(c) for c in route_extra])
            ).alias("_best")
        )
        .select(
            *host_cols,
            F.col("_best._net").alias("matched_" + route_addr),
            F.col("_best._plen").alias("matched_" + route_plen),
            *[F.col(f"_best.{c}").alias(c) for c in route_extra],
        )
    )

def _mask_v6(addr: Column, plen: int) -> Column:
    """First ``plen`` bits of a BINARY(16) address, zero-padded to 16
    bytes — the canonical network address at a LITERAL prefix length
    (each candidate length gets its own codegen'd expression; no UDF)."""
    from bgpexplorer_spark.functions.iputil import _v6_byte

    if plen <= 0:
        return F.lit(bytes(16))
    full, rem = divmod(min(plen, 128), 8)
    parts: list[Column] = []
    if full:
        parts.append(F.substring(addr, 1, full))
    if rem:
        keep = _v6_byte(addr, full).bitwiseAND(F.lit(0xFF ^ (0xFF >> rem)))
        parts.append(F.unhex(F.lpad(F.hex(keep), 2, "0")))
    pad = 16 - full - (1 if rem else 0)
    if pad:
        parts.append(F.lit(bytes(pad)))
    return parts[0] if len(parts) == 1 else F.concat(*parts)

def lpm_join_v6(
    hosts: DataFrame,
    routes: DataFrame,
    host_addr: str = "addr_v6",
    route_addr: str = "addr_v6",
    route_plen: str = "prefixlen",
    plens: list[int] | None = None,
) -> DataFrame:
    """IPv6 longest-prefix-match join — the BINARY(16) analog of
    :func:`lpm_join_v4`: one masked candidate per occurring prefix length
    (≤129 worst case, a handful in a real v6 table), equi-join on
    (masked_addr, prefixlen), keep the longest hit via the map-side
    combinable ``groupBy + max(struct)``. Same 100 TB posture: no
    theta/range join, one shuffle on the join key.
    """
    if plens is None:
        plens = [r[0] for r in routes.select(route_plen).distinct().collect()]
    plens = sorted(int(x) for x in plens)
    if not plens:
        return hosts.limit(0).crossJoin(routes.limit(0))

    cand = F.array(
        *[
            F.struct(
                F.lit(pl).alias("_plen"),
                _mask_v6(F.col(host_addr), pl).alias("_net"),
            )
            for pl in plens
        ]
    )
    exploded = hosts.withColumn("_cand", F.explode(cand)).select(
        "*", F.col("_cand._plen").alias("_plen"), F.col("_cand._net").alias("_net")
    ).drop("_cand")

    joined = exploded.join(
        routes.withColumnRenamed(route_addr, "_net").withColumnRenamed(route_plen, "_plen"),
        ["_net", "_plen"],
        "inner",
    )
    host_cols = [c for c in hosts.columns]
    route_extra = [c for c in joined.columns if c not in host_cols and c not in ("_net", "_plen")]
    return (
        joined.groupBy(*host_cols)
        .agg(
            F.max(
                F.struct(F.col("_plen"), F.col("_net"), *[F.col(c) for c in route_extra])
            ).alias("_best")
        )
        .select(
            *host_cols,
            F.col("_best._net").alias("matched_" + route_addr),
            F.col("_best._plen").alias("matched_" + route_plen),
            *[F.col(f"_best.{c}").alias(c) for c in route_extra],
        )
    )

"""Posting-table semi-joins — the scale-out path for multi-valued
attribute filters (SURVEY.md §2.4 J1; src/bgprib.rs:218-243, 509-582).

The reference maintains four in-RAM posting-list indexes per RIB
(BTreeMap<K, BTreeSet<NLRI>> for AS number / community / route-target /
change-time) and intersects them lazily per query. The Spark default is
predicate-only (`array_contains` / `exists` over the array columns) —
Catalyst pushes those and no index needs maintaining.

At extreme selectivity on very large tables, a materialized EXPLODED
posting table beats re-scanning arrays: one row per (key-value, route
key), written bucketed on the value so the per-query semi-join is
shuffle-free on the posting side and prunes to the probed buckets. This
module materializes those tables and runs the lookups; it is additive —
the predicate path stays the default, exactly as ARCHITECTURE.md states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bgpexplorer_spark.schemas import KEY_COLS

#: posting kinds → the array column they explode (mirrors the reference's
#: four indexes minus change-time, which is the ts_date partition column)
POSTING_SOURCES = {
    "asn": "aspath_flat",   # idx_aspath   (src/bgprib.rs:629-642)
    "community": "comms",   # idx_community (src/bgprib.rs:643-647)
    # route-target index keeps ONLY subtype==2 ext-communities
    # (src/bgprib.rs:496-500)
}

def build_posting_df(history: DataFrame, kind: str) -> DataFrame:
    """One row per (value, route-history key) — the exploded posting list."""
    if kind in POSTING_SOURCES:
        col = POSTING_SOURCES[kind]
        return history.select(
            F.explode_outer(F.col(col)).alias("value"), *KEY_COLS
        ).filter(F.col("value").isNotNull()).dropDuplicates(["value", *KEY_COLS])
    if kind == "rt":
        rt = F.filter(F.col("extcomms"), lambda e: e.getField("subtype") == 2)
        return (
            history.select(F.explode_outer(rt).alias("_e"), *KEY_COLS)
            .filter(F.col("_e").isNotNull())
            .select(
                (F.col("_e.a").cast("bigint") * F.lit(2**32) + F.col("_e.b")).alias("value"),
                *KEY_COLS,
            )
            .dropDuplicates(["value", *KEY_COLS])
        )
    raise ValueError(f"unknown posting kind {kind!r}")

def write_posting_table(
    history: DataFrame, kind: str, table_name: str, buckets: int = 64
) -> None:
    """Materialize the posting table bucketed by value: the semi-join probe
    shuffles only the (tiny) probe side, and bucket pruning skips the rest.
    Bucketing requires saveAsTable (metastore-backed)."""
    (
        build_posting_df(history, kind)
        .write.mode("overwrite")
        .bucketBy(buckets, "value")
        .sortBy("value")
        .saveAsTable(table_name)
    )

def semi_join_postings(
    history: DataFrame, postings: DataFrame, values: list[int]
) -> DataFrame:
    """Routes whose posting list hits ANY of ``values`` — the reference's
    get_iter posting intersection for one positive term
    (src/bgprib.rs:509-537); an empty hit set short-circuits to empty via
    PropagateEmptyRelation."""
    hits = postings.filter(F.col("value").isin([int(v) for v in values])).select(*KEY_COLS)
    return history.join(hits.dropDuplicates(KEY_COLS), KEY_COLS, "left_semi")

def intersect_postings(
    history: DataFrame, hit_sets: list[DataFrame]
) -> DataFrame:
    """AND of several positive posting terms — chained semi-joins, the
    MapFilter chain of src/bgprib.rs:284-308."""
    out = history
    for hits in hit_sets:
        out = out.join(hits.select(*KEY_COLS).dropDuplicates(KEY_COLS), KEY_COLS, "left_semi")
    return out

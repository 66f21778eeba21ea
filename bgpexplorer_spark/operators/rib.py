"""RIB analytic views over ``rib_history`` (SURVEY.md §2.2, §2.5).

The reference's 15 in-RAM tables (src/bgprib.rs:807-821) are one event
table here; each view is a window/aggregate query. All views reuse the
same (rib, nlri, session, path) partitioning so Catalyst can share one
shuffle across current-state + retention + dedup in a single plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bgpexplorer_spark.operators.ingest import attrs_struct
from bgpexplorer_spark.schemas import KEY_COLS

def current_state(history: DataFrame, only_active: bool = True) -> DataFrame:
    """Latest entry per (rib, nlri, session, path) — the "what the RIB
    holds now" view. ``only_active`` drops keys whose newest entry is a
    withdraw tombstone (the reference's map simply still holds the
    tombstone entry; src/bgpattrs.rs:360-374)."""
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc())
    df = history.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return df.filter(F.col("active")) if only_active else df

def retained(history: DataFrame, depth: int) -> DataFrame:
    """U4 standalone: newest ``depth`` history entries per key
    (shrink_hist, src/bgprib.rs:326-341)."""
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc())
    return history.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= F.lit(depth)
    ).drop("_rn")

def statistics(history: DataFrame) -> DataFrame:
    """O6 — the /api/statistics aggregate (src/ribservice.rs:168-219):
    per-rib route counts, history-entry counts, update/withdraw counters,
    and the attribute-store distinct counts. The reference's 7 hash-consing
    stores (src/bgprib.rs:800-806) have no runtime analog here; their
    counters are distinct-counts over the event table. ``approx_`` on the
    heavy distincts keeps this a single pass at 100 TB."""
    return history.groupBy("rib").agg(
        F.count_distinct("nlri_str").alias("routes"),
        F.count(F.lit(1)).alias("history_entries"),
        F.sum(F.col("active").cast("bigint")).alias("cnt_updates"),
        F.sum((~F.col("active")).cast("bigint")).alias("cnt_withdraws"),
        F.approx_count_distinct(attrs_struct()).alias("attrs_store"),
        F.approx_count_distinct("aspath_flat").alias("aspath_store"),
        F.approx_count_distinct("comms").alias("comms_store"),
        F.approx_count_distinct("extcomms").alias("extcomms_store"),
        F.approx_count_distinct("lcomms").alias("lcomms_store"),
        F.count_distinct("session_id").alias("sessions"),
    )

def write_snapshot(history: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 — the parquet table IS the snapshot (vs CBOR dump+rename,
    src/bgprib.rs:903-948).

    100 TB posture: partition by (rib, ts_date) — the partition columns
    replace the reference's per-SAFI maps and its ``idx_changed`` time
    index (J2) with partition pruning — and sort within partitions by the
    sortable address forms so parquet min/max row-group stats reproduce
    the BTreeMap range scan (src/ribfilter.rs:231-305) as stats-based
    skipping.
    """
    (
        history.withColumn("ts_date", F.to_date("ts"))
        .repartition("rib", "ts_date")
        .sortWithinPartitions("addr_v4", "addr_v6", "prefixlen")
        .write.mode(mode)
        .partitionBy("rib", "ts_date")
        .parquet(path)
    )

def read_snapshot(spark, path: str) -> DataFrame:
    """S5 — no index rebuild needed (indexes are not materialized)."""
    return spark.read.parquet(path).drop("ts_date")

def attrs_dim(history: DataFrame) -> DataFrame:
    """U6 analog — the reference hash-conses attrs into shared stores
    (RibItemStore, src/bgprib.rs:121-190); columnar storage makes that
    free, but a normalized attrs dimension with a 64-bit surrogate key is
    still useful for exploration/joins: distinct attrs + xxhash64 key."""
    from bgpexplorer_spark.operators.ingest import ATTR_COLS, attrs_struct

    return (
        history.select(F.xxhash64(attrs_struct()).alias("attrs_key"), *ATTR_COLS)
        .dropDuplicates(["attrs_key"])
    )

def compact(spark, path: str, history_depth: int | None = None) -> None:
    """U9 analog — the reference's refcount purge (src/bgprib.rs:875-902)
    has no shared heap to collect here; the maintenance job is table
    compaction: rewrite the snapshot applying retention (and collapsing
    small files). Equivalent to Delta OPTIMIZE+VACUUM without Delta."""
    df = read_snapshot(spark, path)
    if history_depth is not None:
        df = retained(df, history_depth)
    df = df.cache()
    df.count()  # materialize before overwriting the source
    write_snapshot(df, path)

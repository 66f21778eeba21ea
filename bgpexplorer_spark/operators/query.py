"""The main query path — SURVEY.md §3.1 / §2.3 F11-F14 / §2.5 O1-O7.

Reproduces ``GET /api/json/<rib>?filter=…&skip&limit&maxdepth&onlyactive&
changed_after&changed_before`` (src/ribservice.rs:35-113, defaults :253) as
a composition of DataFrame operators:

    route match (existential over history)  →  deterministic key order  →
    offset/limit pagination  →  history emission (newest-maxdepth)  →
    supernet fallback when the page is empty  →  nested-map JSON shaping.

Scale shape: one shuffle on the history key for the windows, one on the
route key for the existential — both prunable by the (rib, ts_date)
partitioning; the filter column itself is pure predicate algebra pushed
into the scan.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bgpexplorer_spark.filterlang import parse_filter
from bgpexplorer_spark.filterlang.compile import filter_to_column, pushdown_prefilter
from bgpexplorer_spark.functions.timeutil import parse_ts_param, ts_cutoff_str, ts_to_millis
from bgpexplorer_spark.schemas import KEY_COLS

ROUTE_COLS = ["rib", "nlri_str"]  # route identity (sessions/paths nest under it)

@dataclass
class QueryParams:
    """URL params with reference defaults (src/ribservice.rs:253)."""

    filter: str = ""
    skip: int = 0
    limit: int = 1000
    maxdepth: int = 10
    onlyactive: bool = False
    changed_after: dt.datetime | str | int | None = None
    changed_before: dt.datetime | str | int | None = None
    # time travel: answer the query as the RIB stood at this instant
    # (history truncated at ts <= asof before anything else runs)
    asof: dt.datetime | str | int | None = None

    def __post_init__(self) -> None:
        if self.changed_after is not None:
            self.changed_after = parse_ts_param(self.changed_after)
        if self.changed_before is not None:
            self.changed_before = parse_ts_param(self.changed_before)
        if self.asof is not None:
            self.asof = parse_ts_param(self.asof)

def history_entry_filter(p: QueryParams) -> Column:
    """F11/F12 — ``filter_ah`` (src/ribservice.rs:72-89): onlyactive plus
    STRICT ts bounds on both ends."""
    c = F.lit(True)
    if p.onlyactive:
        c = c & F.col("active")
    # string-literal cutoffs (ts_cutoff_str), not F.lit(datetime): a
    # datetime literal is interpreted through the session timezone
    # against TIMESTAMP_NTZ history (host-tz shift) and its cast blocks
    # parquet pushdown — same rationale as the asof path in query_rib
    if p.changed_before is not None:
        c = c & (F.col("ts") < F.lit(ts_cutoff_str(p.changed_before)))
    if p.changed_after is not None:
        c = c & (F.col("ts") > F.lit(ts_cutoff_str(p.changed_after)))
    return c

def _route_sort_key() -> list[Column]:
    """Deterministic route order standing in for BTreeMap key order (O1
    pagination; SURVEY.md §7 risk register). RD sorts before prefix
    (src/ribfilter.rs:472-483); addr forms are the sortable numerics."""
    return [
        F.col("rd_hi").asc_nulls_first(),
        F.col("rd_lo").asc_nulls_first(),
        F.col("addr_v4").asc_nulls_first(),
        F.col("addr_v6").asc_nulls_first(),
        F.col("prefixlen").asc(),
        F.col("nlri_str").asc(),
    ]

def _key_len() -> Column:
    """Key bit-length for supernet most-specific-first ordering
    (src/ribfilter.rs:12-34 SortIter + len(): labels*24 + 64 per RD +
    prefixlen)."""
    return (
        F.coalesce(F.size("labels"), F.lit(0)) * 24
        + F.when(F.col("rd_hi").isNotNull(), 64).otherwise(0)
        + F.coalesce(F.col("prefixlen"), F.lit(0))
    )

def matched_routes(
    history: DataFrame, rib: str, p: QueryParams, supernet: bool = False
) -> DataFrame:
    """F14 — route-level existential: a route matches iff ∃ history entry
    that (a) passes filter_ah, (b) sits inside the reference's quirky
    match window — the newest ``maxdepth`` slots computed from the
    UNFILTERED per-path entry count (src/ribfilter.rs:595-609: the skip
    count uses ``items.len()``, not the filtered length), and (c) the
    3-valued filter says Yes.

    Returns one row per route key with the sortable key columns.
    """
    terms = parse_filter(p.filter)
    df = history.filter(F.col("rib") == rib)
    if not supernet:
        # the 3VL tree below runs ABOVE two windows, where Catalyst
        # cannot push it; the prefilter's plain range/equality conjuncts
        # reference only route-KEY columns (constant per KEY_COLS
        # partition), so applying them before the windows is sound —
        # whole keys are kept or dropped, never split — and restores
        # parquet min/max pruning for the serving path. Supernet mode
        # reverses containment, where the prefilter does not apply.
        df = df.filter(pushdown_prefilter(terms, rib))
    wk = Window.partitionBy(*KEY_COLS)
    df = df.withColumn("_total", F.count(F.lit(1)).over(wk))
    df = df.filter(history_entry_filter(p))
    df = df.withColumn(
        "_rn_asc", F.row_number().over(wk.orderBy(F.col("ts").asc()))
    )
    # NB maxdepth=0 ⇒ zero match-window slots ⇒ no route matches: the
    # reference's own semantics (src/ribfilter.rs:601-606 skips len-0
    # entries) — deliberately asymmetric with emitted_history's
    # "0 = unlimited" (src/bgpsvc.rs:521-526), replicated as-is
    df = df.filter(F.col("_rn_asc") > F.col("_total") - F.lit(p.maxdepth))
    df = df.filter(F.coalesce(filter_to_column(terms, rib, supernet), F.lit(False)))
    return df.select(
        "rib", "nlri_str", "rd_hi", "rd_lo", "addr_v4", "addr_v6",
        "prefixlen", "labels",
    ).dropDuplicates(ROUTE_COLS)

def page_routes(
    routes: DataFrame, p: QueryParams, supernet: bool = False
) -> DataFrame:
    """O1/O4 — deterministic order + offset/limit. Supernet pages order
    most-specific-first (src/bgpsvc.rs:638-658)."""
    if supernet:
        ordered = routes.orderBy(F.desc(_key_len().alias("_kl")), *_route_sort_key())
    else:
        ordered = routes.orderBy(*_route_sort_key())
    return ordered.offset(p.skip).limit(p.limit)

# emitted_history page prefilter bound: collecting the page's nlri_str
# keys is bounded by p.limit the same way the serving layer's own page
# collect is; past this many keys the IN-list stops being a cheap plan
# literal and the broadcast semi-join alone is the right shape.
_PAGE_PREFILTER_MAX = 1024

def emitted_history(
    history: DataFrame, page: DataFrame, p: QueryParams
) -> DataFrame:
    """F13/O7 input — for the paged routes, the newest ``maxdepth``
    filter_ah-passing entries per (session, path); maxdepth=0 = unlimited
    (BAHItems, src/bgpsvc.rs:516-532).

    Page prefilter (r11 optimization, guide §8 "decide with small rows,
    move big rows once"): the broadcast semi-join below is correct but
    Catalyst cannot push a JOIN under a Window, so on derived history
    the FULL window-chain output crossed the ingest exchange per run
    just to be semi-joined down to the ≤ ``p.limit`` page (measured at
    sf1: 27 MB shuffled, the two hottest stages of the query). The page
    is already a materialized ≤ limit-row frame, so its distinct
    ``nlri_str`` keys become a plain IN predicate — a filter on a window
    PARTITION key, which Catalyst pushes below every KEY_COLS window,
    through the ingest repartition, into the scan (real column →
    PushedFilters + parquet bloom-filter row-group skipping; derived
    column → substituted and applied at the scan projection). Whole keys
    are kept or dropped, never split, and the exact ROUTE_COLS semi-join
    still runs above — rows identical by construction."""
    if p.limit <= _PAGE_PREFILTER_MAX:
        keys = [r[0] for r in page.select("nlri_str").distinct().collect()]
        history = history.filter(F.col("nlri_str").isin(keys))
    df = history.join(F.broadcast(page.select(*ROUTE_COLS)), ROUTE_COLS, "left_semi")
    df = df.filter(history_entry_filter(p))
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc())
    df = df.withColumn("_rn", F.row_number().over(w))
    if p.maxdepth > 0:
        df = df.filter(F.col("_rn") <= F.lit(p.maxdepth))
    return df.drop("_rn")

@dataclass
class RibQueryResult:
    """The /api/json response envelope (src/bgpsvc.rs:690-706)."""

    ribtype: str
    length: int          # O3 — total routes in the rib
    found: int           # O2 — full match count ignoring skip/limit
    skip: int
    limit: int
    maxdepth: int
    onlyactive: bool
    routes: DataFrame    # the emitted page of route keys
    history: DataFrame   # flat emitted history rows for those routes
    from_supernet: bool  # True when the supernet fallback produced the page

def query_rib(
    history: DataFrame, rib: str, p: QueryParams, *, length: int | None = None
) -> RibQueryResult:
    """§3.1 end-to-end, including the two-query supernet fallback (O5):
    when the primary page is empty the serving layer re-plans with
    reversed containment and most-specific-first order
    (src/bgpsvc.rs:625-658).

    ``length`` — the per-rib route count. The reference serves it as an
    O(1) map size (src/bgpsvc.rs:677); pass the maintained count
    (operators/rib.py route_counts / read_route_counts, refreshed at
    snapshot-write/compaction) so a 100 TB table doesn't pay a full
    dedup-count scan per HTTP request. None → computed exactly (the
    explicit exact path).

    ``p.asof`` truncates the history at ts <= asof first, so the whole
    pipeline (length, match, windows, nested output) answers as the RIB
    stood at that instant — the serving form of analytics.rib_asof. The
    maintained ``length`` describes the full table, so it is recomputed
    under asof (the cutoff filter pushes down to the scan; partition
    pruning on ts_date bounds the read)."""
    if p.asof is not None:
        from bgpexplorer_spark.functions.timeutil import asof_prune

        history = asof_prune(history, p.asof)
        length = None
    if length is None:
        rib_df = history.filter(F.col("rib") == rib)
        length = rib_df.dropDuplicates(ROUTE_COLS).count()

    terms = parse_filter(p.filter)
    # materialized once per request: the match set feeds both the found
    # count and the page. localCheckpoint instead of .cache() so a
    # long-running HTTP server doesn't accumulate CacheManager entries
    # per request (blocks free when the request's DataFrames are GC'd)
    matched = matched_routes(history, rib, p).localCheckpoint(eager=True)
    # O2: count short-circuits to table size on empty filter
    # (src/bgpsvc.rs:603-613)
    found = length if not terms else matched.count()

    page = page_routes(matched, p)
    from_supernet = False
    # the primary page is empty iff found <= skip (page = matched rows
    # after OFFSET skip), so the supernet-fallback probe
    # (src/bgpsvc.rs:625-658) needs NO extra Spark action
    if found <= p.skip:
        page = page_routes(matched_routes(history, rib, p, supernet=True), p, supernet=True)
        from_supernet = True
    page = page.localCheckpoint(eager=True)
    hist = emitted_history(history, page, p)
    return RibQueryResult(
        ribtype=rib, length=length, found=found, skip=p.skip, limit=p.limit,
        maxdepth=p.maxdepth, onlyactive=p.onlyactive, routes=page,
        history=hist, from_supernet=from_supernet,
    )

def to_nested_json(result: RibQueryResult) -> DataFrame:
    """O7 — route → {session → {path → {ts_millis → entry}}} JSON shaping
    (src/bgpsvc.rs:493-596), newest-first inside each path, sessions and
    paths in ascending numeric order (BTreeMap serialization order). One
    row per route: (nlri_str, items_json) — byte-deterministic across
    runs/partitionings.

    ONE shuffle: rows group by (rib, nlri_str) once and the
    session→path→history nesting is built in expression land (distinct
    ids + per-level filter/sort over the collected array). The previous
    shape aggregated three times — (…,session,path) → (…,session) →
    (…,) — which is three exchanges, because a hash partitioning on four
    keys does not satisfy clustering on their prefix. Per-prefix group
    sizes are history-depth-bounded, so the in-array nesting is tiny."""
    from bgpexplorer_spark.operators.ingest import attrs_struct

    h = result.history.withColumn("_ts_ms", ts_to_millis(F.col("ts")).cast("string"))
    entry = F.to_json(
        F.struct(F.col("active"), attrs_struct().alias("attrs"), F.col("labels"))
    )
    grouped = (
        h.withColumn("_e", entry)
        .groupBy("rib", "nlri_str")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("session_id").alias("s"),
                    F.col("path_id").alias("p"),
                    F.col("ts").alias("t"),
                    F.struct(F.col("_ts_ms"), F.col("_e")).alias("kv"),
                )
            ).alias("_rows")
        )
    )
    rows = F.col("_rows")

    def hist_map(s, p):
        # newest-first per path: same (t, kv) struct sort the 3-level
        # shape used, reversed — identical tie order
        ents = F.filter(rows, lambda x: (x["s"] == s) & (x["p"] == p))
        srt = F.reverse(
            F.array_sort(
                F.transform(
                    ents, lambda x: F.struct(x["t"].alias("t"), x["kv"].alias("kv"))
                )
            )
        )
        kvs = srt.getField("kv")
        # the reference keys history by a BTreeMap<ts> so same-ts rows
        # CANNOT coexist there (the insert overwrites); the engine's
        # history table can hold them, and map_from_entries would raise
        # DUPLICATED_MAP_KEY. Collapse to one entry per ts-millis —
        # keeping the (t, kv)-max, the deterministic stand-in for the
        # BTreeMap's last-insert-wins (no arrival order survives batch)
        dedup = F.filter(
            kvs,
            lambda x, i: (i == F.lit(0))
            | (x["_ts_ms"] != F.element_at(kvs, i)["_ts_ms"]),
        )
        return F.map_from_entries(dedup)

    def path_map(s):
        paths = F.array_sort(
            F.array_distinct(
                F.transform(
                    F.filter(rows, lambda x: x["s"] == s), lambda x: x["p"]
                )
            )
        )
        return F.map_from_entries(
            F.transform(
                paths,
                lambda p: F.struct(
                    p.cast("string").alias("key"), hist_map(s, p).alias("value")
                ),
            )
        )

    sess_ids = F.array_sort(
        F.array_distinct(F.transform(rows, lambda x: x["s"]))
    )
    sess_map = F.map_from_entries(
        F.transform(
            sess_ids,
            lambda s: F.struct(
                s.cast("string").alias("key"), path_map(s).alias("value")
            ),
        )
    )
    return grouped.select(
        "rib", "nlri_str", F.to_json(sess_map).alias("items_json")
    )

"""BGP time-series analytics over ``rib_history`` (SURVEY.md §2.5 read
path, generalized the way a bgpexplorer user actually mines the data).

The reference answers "what does the RIB hold *now*" (src/bgpsvc.rs
query path) and keeps per-key history rows for the UI. The natural
analytic extensions of that data model — all pure window/aggregate
plans, shuffling once on the same (rib, nlri) keys the ingest path
already uses:

- :func:`rib_asof` — the RIB as of an arbitrary past instant (the
  reference can only show newest state + raw history; time travel is a
  filter + the same newest-per-key window).
- :func:`moas_conflicts` — Multiple-Origin-AS detection: prefixes whose
  active routes disagree on the origin AS (classic hijack/leak signal;
  origin = last hop of the AS path, src/bgpattrs.rs aspath tail).
- :func:`prefix_churn` / :func:`top_flappers` — per-prefix update/
  withdraw rates per time bucket and the noisiest prefixes overall
  (the batch analog of the reference's cnt_updates/cnt_withdraws
  counters, src/ribservice.rs:168-219, broken out per prefix).

100 TB posture: every one of these is a single hash-aggregate (or one
window) keyed by (rib, nlri_str[, session, path]) — the same partitioning
``build_history`` already established, so Catalyst reuses one Exchange;
nothing here widens rows or collects to the driver.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bgpexplorer_spark.functions.timeutil import cut_millis, ts_cutoff_str
from bgpexplorer_spark.schemas import KEY_COLS

def origin_as(aspath_flat: Column) -> Column:
    """Origin AS = last hop of the flattened AS path (NULL for an empty
    path — a locally-originated route carries no origin to compare)."""
    return F.when(F.size(aspath_flat) > 0, F.element_at(aspath_flat, -1))

def rib_asof(
    history: DataFrame,
    at: str | int | float | _dt.datetime,
    only_active: bool = True,
    seq_col: str | None = None,
) -> DataFrame:
    """The RIB state as of instant ``at`` (epoch-millis or RFC3339, same
    forms as the HTTP API's time params): newest history entry per
    (rib, nlri, session, path) among rows with ``ts <= at``;
    ``only_active`` drops keys whose newest entry by then was a withdraw
    tombstone — exactly :func:`current_state` semantics shifted back in
    time. ``seq_col`` breaks ts ties (arrival order) deterministically.

    One partition-prunable ts filter (the snapshot is partitioned by
    ts_date — pass the frame WITH that column, e.g. the daemon's
    maintained table, and :func:`timeutil.asof_prune` turns the cutoff
    into real partition pruning) + the one newest-per-key pick the read
    path already pays — a map-side-combinable ``max_by`` aggregation
    like :func:`rib.current_state` (no window sort; the shuffle carries
    one row per key per map task, measured ~4× cheaper at 10× data).
    """
    from bgpexplorer_spark.functions.timeutil import asof_prune
    from bgpexplorer_spark.operators.ingest import nonconstant_group_keys

    filtered = asof_prune(history, at)
    # group on the non-constant keys only (literal rib/path_id from
    # derived pipelines otherwise force two avoidable full-width sorts
    # around the SortAggregate — see ingest.nonconstant_group_keys);
    # constant keys ride in the picked struct, rows identical
    group = nonconstant_group_keys(filtered, KEY_COLS)
    others = [c for c in filtered.columns if c not in group]
    order = (
        F.struct(F.col("ts"), F.col(seq_col)) if seq_col else F.col("ts")
    )
    df = (
        filtered.groupBy(*group)
        .agg(F.max_by(F.struct(*others), order).alias("_r"))
        .select(*group, *[F.col(f"_r.{c}").alias(c) for c in others])
        .select(*filtered.columns)
    )
    return df.filter(F.col("active")) if only_active else df

def moas_conflicts(state: DataFrame, min_origins: int = 2) -> DataFrame:
    """Multiple-Origin-AS report over a *state* view (``current_state`` or
    ``rib_asof`` output): per (rib, nlri_str), the sorted distinct origin
    ASes announced by active routes across all sessions/paths, keeping
    prefixes with ``>= min_origins`` distinct origins (default: actual
    conflicts only; ``min_origins=1`` gives the full origin inventory).

    Single hash-aggregate; ``origins`` is also rendered comma-joined
    (``origins_str``) for engines/SIEMs without array types.
    """
    o = origin_as(F.col("aspath_flat"))
    return (
        state.select("rib", "nlri_str", o.alias("_origin"))
        .filter(F.col("_origin").isNotNull())
        .groupBy("rib", "nlri_str")
        .agg(
            F.array_sort(F.collect_set("_origin")).alias("origins"),
            F.count_distinct("_origin").alias("n_origins"),
        )
        .filter(F.col("n_origins") >= F.lit(min_origins))
        .withColumn("origins_str", F.array_join(F.col("origins"), ","))
    )

def prefix_churn(history: DataFrame, granularity_sec: int = 3600) -> DataFrame:
    """Per-(rib, nlri_str, time-bucket) churn: announce/withdraw counts,
    state flips (announce↔withdraw transitions), and sessions touched.

    The flip count needs one lag per (rib, nlri, session, path) — the
    ingest partitioning again — then everything rolls up map-side into
    the bucket aggregate.
    """
    w = Window.partitionBy(*KEY_COLS).orderBy("ts")
    flipped = F.when(
        F.lag(F.col("active")).over(w).isNotNull()
        & (F.lag(F.col("active")).over(w) != F.col("active")),
        1,
    ).otherwise(0)
    return (
        history.withColumn("_flip", flipped)
        .groupBy("rib", "nlri_str", cut_millis(F.col("ts"), granularity_sec).alias("bucket"))
        .agg(
            F.sum(F.col("active").cast("bigint")).alias("n_updates"),
            F.sum((~F.col("active")).cast("bigint")).alias("n_withdraws"),
            F.sum("_flip").alias("n_flips"),
            F.count_distinct("session_id").alias("n_sessions"),
        )
    )

def top_flappers(history: DataFrame, k: int = 20) -> DataFrame:
    """The k noisiest prefixes: total events + flips per (rib, nlri_str),
    ordered by flips then events (deterministic tie-break on the key).
    TakeOrdered top-k — no full sort at any scale.
    """
    w = Window.partitionBy(*KEY_COLS).orderBy("ts")
    flipped = F.when(
        F.lag(F.col("active")).over(w).isNotNull()
        & (F.lag(F.col("active")).over(w) != F.col("active")),
        1,
    ).otherwise(0)
    return (
        history.withColumn("_flip", flipped)
        .groupBy("rib", "nlri_str")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_flip").alias("n_flips"),
        )
        .orderBy(
            F.col("n_flips").desc(), F.col("n_events").desc(), "rib", "nlri_str"
        )
        .limit(k)
    )

def aspath_prepend_stats(aspath_flat: Column) -> Column:
    """Path inflation metrics from the flattened AS path — a struct of
    ``(path_len, uniq_len, n_prepends)`` where ``n_prepends`` counts
    consecutive-duplicate hops (the standard traffic-engineering prepend;
    an AS appearing twice NON-adjacently — a route leak shape — is not a
    prepend and leaves uniq_len alone). Pure fold over the array column,
    whole-stage codegen, no UDF."""
    # keep hop i iff it differs from hop i-1 (element_at is 1-based, so
    # for 0-based index i the predecessor is element_at(arr, i))
    dedup_adjacent = F.filter(
        aspath_flat,
        lambda x, i: (i == F.lit(0)) | (x != F.element_at(aspath_flat, i)),
    )
    path_len = F.size(aspath_flat)
    uniq_len = F.size(dedup_adjacent)
    return F.struct(
        path_len.alias("path_len"),
        uniq_len.alias("uniq_len"),
        (path_len - uniq_len).alias("n_prepends"),
    )

def origin_changes(history: DataFrame) -> DataFrame:
    """Origin-AS change timeline per (rib, nlri_str): each row where the
    origin differs from the previous *active* announcement of the same
    prefix (any session) — the raw feed a hijack detector consumes.
    Output: rib, nlri_str, ts, prev_origin, new_origin. One window on
    (rib, nlri_str) over active rows only."""
    o = origin_as(F.col("aspath_flat"))
    w = Window.partitionBy("rib", "nlri_str").orderBy("ts")
    act = history.filter(F.col("active")).withColumn("_o", o)
    return (
        act.withColumn("_prev", F.lag("_o").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_o")))
        .select(
            "rib", "nlri_str", "ts",
            F.col("_prev").alias("prev_origin"),
            F.col("_o").alias("new_origin"),
        )
    )

def as_adjacency(state: DataFrame, min_count: int = 1) -> DataFrame:
    """AS-level adjacency graph from announced paths: one row per
    directed edge (as_a -> as_b appearing consecutively in some AS path),
    with the number of (prefix, session) routes carrying it. Prepend
    duplicates collapse first so a prepended hop never counts as a
    self-edge. Explode + hash-aggregate — the standard edge-extraction
    shape at any scale."""
    dedup = F.filter(
        F.col("aspath_flat"),
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(F.col("aspath_flat"), i)),
    )
    # materialize the collapsed path into its own Project before the
    # pair transform: a lambda-captured filter(...) tree re-evaluates
    # once per element_at reference (twice per hop) inside the
    # interpreted transform — the window_concat lesson (operators/text)
    dcol = F.col("_dedup")
    pairs = F.transform(
        # guard: sequence(1, 0) counts DOWN ([1, 0]) and element_at(_, 0)
        # raises at runtime — origin-only / empty collapsed paths must
        # yield no hops (the duplicate_span_stats discipline; r11 ADVICE)
        F.when(F.size(dcol) >= 2, F.sequence(F.lit(1), F.size(dcol) - 1))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.struct(
            F.element_at(dcol, i).alias("as_a"),
            F.element_at(dcol, i + 1).alias("as_b"),
        ),
    )
    return (
        state.select(dedup.alias("_dedup"))
        .select(F.explode(pairs).alias("_e"))
        .groupBy(F.col("_e.as_a").alias("as_a"), F.col("_e.as_b").alias("as_b"))
        .agg(F.count(F.lit(1)).alias("n_routes"))
        .filter(F.col("n_routes") >= F.lit(min_count))
    )

def rpki_validate(
    routes: DataFrame,
    roas: DataFrame,
    addr_col: str = "addr_v4",
    plen_col: str = "prefixlen",
    origin_col: str = "origin_as",
    roa_plens: list[int] | None = None,
) -> DataFrame:
    """RFC 6811 route-origin validation at bulk scale: classify every
    route ``Valid`` / ``Invalid`` / ``NotFound`` against a ROA table
    ``(net, plen, max_len, asn)`` (canonical v4 network int, covering
    prefix length, max announced length, authorized origin).

    A ROA covers a route when the route's first ``plen`` bits equal the
    ROA net and ``route.plen >= roa.plen``; the route is Valid if ANY
    covering ROA also has ``route.plen <= max_len`` and
    ``origin == asn``, Invalid if covered but never validated, NotFound
    if no ROA covers it (RFC 6811 §2).

    Same scale shape as the LPM join: one masked candidate per occurring
    ROA prefix length (pass ``roa_plens`` to skip the discovery action),
    equi-join on (net, plen), one map-side-combinable aggregate per
    route, then a left join back for NotFound. No theta join, no
    per-route ROA scan."""

    def mask_v4(pl: int) -> Column:
        return (
            F.floor(F.col(addr_col) / F.lit(2 ** (32 - pl))).cast("bigint")
            * F.lit(2 ** (32 - pl))
        )

    return _rpki_validate_impl(
        routes, roas, addr_col, plen_col, origin_col, roa_plens, mask_v4
    )

def _rpki_validate_impl(
    routes: DataFrame,
    roas: DataFrame,
    addr_col: str,
    plen_col: str,
    origin_col: str,
    roa_plens: list[int] | None,
    mask,
) -> DataFrame:
    """Shared v4/v6 body. The verdict depends only on the
    (addr, plen, origin) triple, so the pipeline dedupes routes to
    distinct triples BEFORE the candidate explode and aggregates
    ``_any_ok`` by that narrow key — not by every route column. The
    exchanges carry a 3-column key, the explode runs over distinct
    triples (routes repeat a prefix across sessions/history), and the
    verdict join back to the full rows is on the same narrow key."""
    if roa_plens is None:
        roa_plens = [r[0] for r in roas.select("plen").distinct().collect()]
    roa_plens = sorted(int(x) for x in roa_plens)

    if not roa_plens:
        return routes.withColumn("validity", F.lit("NotFound"))
    key = [addr_col, plen_col, origin_col]
    cand = F.array(
        *[
            F.struct(F.lit(pl).alias("_plen"), mask(pl).alias("_net"))
            for pl in roa_plens
        ]
    )
    exploded = (
        routes.select(*key)
        .distinct()
        .withColumn("_cand", F.explode(cand))
        .filter(F.col(plen_col) >= F.col("_cand._plen"))
        .select(*key, F.col("_cand._plen").alias("_plen"), F.col("_cand._net").alias("_net"))
    )
    covering = exploded.join(
        roas.select(
            F.col("net").alias("_net"),
            F.col("plen").alias("_plen"),
            "max_len",
            "asn",
        ),
        ["_net", "_plen"],
        "inner",
    )
    ok = (F.col(plen_col) <= F.col("max_len")) & (F.col(origin_col) == F.col("asn"))
    verdicts = covering.groupBy(*key).agg(F.max(ok.cast("int")).alias("_any_ok"))
    return (
        routes.join(verdicts, key, "left")
        .withColumn(
            "validity",
            F.when(F.col("_any_ok").isNull(), "NotFound")
            .when(F.col("_any_ok") == 1, "Valid")
            .otherwise("Invalid"),
        )
        .drop("_any_ok")
    )

def rpki_validate_v6(
    routes: DataFrame,
    roas: DataFrame,
    addr_col: str = "addr_v6",
    plen_col: str = "prefixlen",
    origin_col: str = "origin_as",
    roa_plens: list[int] | None = None,
) -> DataFrame:
    """IPv6 form of :func:`rpki_validate`: ROA nets are canonical
    BINARY(16) addresses; candidate masking reuses the literal-length
    byte/bit construction of the v6 LPM join. Same RFC 6811 semantics
    and the same narrow-key one-aggregate scale shape."""
    from bgpexplorer_spark.operators.lpm import _mask_v6

    return _rpki_validate_impl(
        routes, roas, addr_col, plen_col, origin_col, roa_plens,
        lambda pl: _mask_v6(F.col(addr_col), pl),
    )

def bogon_asns(state: DataFrame, path_col: str = "aspath_flat") -> DataFrame:
    """Routes whose AS path contains a reserved / private / documentation
    ASN that must never appear in the public DFZ: AS 0 (RFC 7607),
    AS_TRANS 23456 (RFC 6793), 64496-64511 + 65536-65551 documentation
    (RFC 5398), 64512-65534 private (RFC 6996), 65535 + 4294967295
    reserved (RFC 7300), 4200000000-4294967294 private (RFC 6996).
    Adds ``bogon_asns`` (sorted distinct offenders) and keeps only
    offending routes — a pure map-side lambda filter, zero shuffles."""

    def bogon(a: Column) -> Column:
        return (
            (a == 0)
            | (a == 23456)
            | ((a >= 64496) & (a <= 65551))
            | (a >= 4200000000)
        )

    hits = F.array_sort(F.array_distinct(F.filter(F.col(path_col), bogon)))
    return state.withColumn("bogon_asns", hits).filter(F.size("bogon_asns") > 0)

def rib_diff(
    history: DataFrame,
    t1: "str | int | float",
    t2: "str | int | float",
) -> DataFrame:
    """Per-prefix diff between two as-of instants (what changed between
    yesterday's RIB and now): for each (rib, nlri_str) compare the sorted
    origin-AS sets of the t1 and t2 states and emit ``added`` /
    ``removed`` / ``origin_changed`` rows (identical states dropped).

    Single-pass shape: ONE scan of rows with ``ts <= t2`` (partition
    prunable), the newest-per-key entry at both instants extracted by two
    conditional ``max(struct(ts, ...))`` aggregates in the SAME
    exchange (argmax-by-ts, the same trick the LPM join uses instead of
    a sort window), then one per-prefix set aggregate — no second scan,
    no join, versus the naive two-window + full-outer-join plan."""
    from bgpexplorer_spark.operators.ingest import nonconstant_group_keys

    c1, c2 = ts_cutoff_str(t1), ts_cutoff_str(t2)
    entry = F.struct(
        F.col("ts"), F.col("active"), origin_as(F.col("aspath_flat")).alias("o")
    )
    # group on the non-constant keys only (literal rib/path_id from the
    # derived pipelines otherwise force two avoidable full-width sorts
    # around the max(struct) SortAggregate — ingest.nonconstant_group_keys);
    # a dropped constant key still needed downstream (rib) is re-emitted
    # by aggregation — max of a constant is that constant
    group = nonconstant_group_keys(history, KEY_COLS)
    carry = [F.max(c).alias(c) for c in ("rib",) if c not in group]
    per_key = (
        history.filter(F.col("ts") <= F.lit(c2))
        .groupBy(*group)
        .agg(
            F.max(F.when(F.col("ts") <= F.lit(c1), entry)).alias("b"),
            F.max(entry).alias("a"),
            *carry,
        )
    )

    def oset(side: str) -> Column:
        s = F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_set(
                        F.when(F.col(f"{side}.active"), F.col(f"{side}.o"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
        )
        # empty set (absent or fully tombstoned at that instant) → NULL,
        # matching the as-of-state-has-no-row semantics
        return F.when(F.length(s) > 0, s)

    per_prefix = per_key.groupBy("rib", "nlri_str").agg(
        oset("b").alias("origins_before"), oset("a").alias("origins_after")
    )
    return per_prefix.filter(
        ~F.col("origins_before").eqNullSafe(F.col("origins_after"))
    ).select(
        "rib",
        "nlri_str",
        F.when(F.col("origins_before").isNull(), "added")
        .when(F.col("origins_after").isNull(), "removed")
        .otherwise("origin_changed")
        .alias("change"),
        "origins_before",
        "origins_after",
    )

# (name, first addr, last addr) — IPv4 special-purpose ranges that must
# not be announced in the DFZ (RFC 6890 registry; the classic martians)
MARTIAN_V4_RANGES: list[tuple[str, int, int]] = [
    ("this-network", 0, (1 << 24) - 1),                          # 0.0.0.0/8
    ("rfc1918-10", 10 << 24, (10 << 24) + (1 << 24) - 1),        # 10.0.0.0/8
    ("cgn-rfc6598", (100 << 24) + (64 << 16),
     (100 << 24) + (127 << 16) + 65535),                          # 100.64.0.0/10
    ("loopback", 127 << 24, (127 << 24) + (1 << 24) - 1),        # 127.0.0.0/8
    ("link-local", (169 << 24) + (254 << 16),
     (169 << 24) + (254 << 16) + 65535),                          # 169.254.0.0/16
    ("rfc1918-172", (172 << 24) + (16 << 16),
     (172 << 24) + (31 << 16) + 65535),                           # 172.16.0.0/12
    ("rfc1918-192", (192 << 24) + (168 << 16),
     (192 << 24) + (168 << 16) + 65535),                          # 192.168.0.0/16
    ("testnet-1", (192 << 24) + (2 << 8), (192 << 24) + (2 << 8) + 255),
    ("benchmark", (198 << 24) + (18 << 16),
     (198 << 24) + (19 << 16) + 65535),                           # 198.18.0.0/15
    ("multicast", 224 << 24, (239 << 24) + (1 << 24) - 1),       # 224.0.0.0/4
    ("reserved-e", 240 << 24, (1 << 32) - 1),                    # 240.0.0.0/4
]

def martian_prefixes(state: DataFrame, addr_col: str = "addr_v4") -> DataFrame:
    """Announcements inside IPv4 special-purpose space (RFC 6890) that a
    clean DFZ must never carry — the prefix-space complement of
    :func:`bogon_asns`. Adds ``martian`` (the range name containing the
    route's network address) and keeps only offenders. A route is flagged
    when its NETWORK ADDRESS falls inside a special range — the
    overlapping-supernet case (e.g. announcing 224.0.0.0/3) is the
    multicast-gate concern the filter language already handles. Pure
    range CASE over the sortable address int, zero shuffles."""
    a = F.col(addr_col)
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(MARTIAN_V4_RANGES):
        expr = F.when((a >= lo) & (a <= hi), F.lit(name)).otherwise(expr)
    return state.withColumn("martian", expr).filter(F.col("martian").isNotNull())

def flap_damping(
    history: DataFrame,
    at: "str | int | float",
    half_life_sec: float = 900.0,
    flap_penalty: float = 1000.0,
    suppress_threshold: float = 2000.0,
    reuse_threshold: float = 750.0,
) -> DataFrame:
    """RFC 2439 route-flap damping figures, computed in bulk over the
    history (the reference surfaces raw flap history; this is the
    operator a damping policy engine would run): each WITHDRAWAL of a
    previously-announced route (an active→inactive transition per key)
    adds ``flap_penalty``, decayed exponentially with ``half_life_sec``
    to the evaluation instant ``at``; a prefix whose summed penalty is
    above ``suppress_threshold`` is suppressed, and below
    ``reuse_threshold`` it would be reusable.

    One lag window on the ingest partitioning to find withdrawals, one
    per-prefix aggregate of decayed penalties — the same two-exchange
    shape as prefix_churn. Output: (rib, nlri_str, n_flaps, penalty,
    suppressed, reusable) for prefixes with at least one flap."""
    import math

    cutoff = ts_cutoff_str(at)
    lam = math.log(2.0) / float(half_life_sec)
    at_s = F.unix_micros(F.lit(cutoff).cast("timestamp")) / 1e6
    w = Window.partitionBy(*KEY_COLS).orderBy("ts")
    h = history.filter(F.col("ts") <= F.lit(cutoff))
    withdrawal = (
        F.lag(F.col("active")).over(w).eqNullSafe(F.lit(True))
        & ~F.col("active")
    )
    decayed = F.when(
        withdrawal,
        F.lit(flap_penalty)
        * F.exp(-F.lit(lam) * (at_s - F.unix_micros(F.col("ts")) / 1e6)),
    ).otherwise(F.lit(0.0))
    return (
        h.withColumn("_pen", decayed)
        .withColumn("_flap", withdrawal.cast("bigint"))
        .groupBy("rib", "nlri_str")
        .agg(
            F.sum("_flap").alias("n_flaps"),
            F.round(F.sum("_pen"), 4).alias("penalty"),
        )
        .filter(F.col("n_flaps") > 0)
        .withColumn("suppressed", F.col("penalty") >= F.lit(suppress_threshold))
        .withColumn("reusable", F.col("penalty") < F.lit(reuse_threshold))
    )


def session_stability(changes: DataFrame) -> DataFrame:
    """Per-peer BGP session stability from FSM transitions (RFC 4271 §8;
    state 6 = Established) — the session-health view a monitoring
    station keeps next to its RIB (the reference surfaces per-session
    state through /api/statistics, src/bgpsvc.rs:709-731; the archival
    transition log is strictly richer): how often the session reached
    Established, how often it fell out, the last known state, and the
    observation span. One aggregate keyed by peer — map-side
    combinable, no window, no join; last_state is an argmax via
    max(struct), not a sort."""
    last = F.max(F.struct(F.col("ts"), F.col("new_state")))
    return changes.groupBy("peer_addr", "peer_as").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum((F.col("new_state") == 6).cast("long")).alias("n_established"),
        F.sum(
            ((F.col("old_state") == 6) & (F.col("new_state") != 6)).cast("long")
        ).alias("n_lost"),
        last.getField("new_state").alias("last_state"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def aggregatable_prefixes(
    state: DataFrame, addr_col: str = "addr_v4",
    path_col: str = "aspath_flat",
) -> DataFrame:
    """CIDR-Report-style aggregation potential: sibling prefix pairs —
    same length, same origin AS, differing only in their top bit — whose
    common parent would cover exactly both, i.e. one redundant
    announcement each (the metric the weekly CIDR Report has tracked
    since the 90s). One hash aggregate keyed by (parent, plen, origin);
    distinct + aggregate only, no join, map-side combinable."""
    span2 = F.pow(F.lit(2.0), F.lit(33) - F.col("prefixlen")).cast("bigint")
    sib = (
        state.filter(
            F.col(addr_col).isNotNull() & (F.col("prefixlen") > 0)
        )
        .select(
            F.col("prefixlen"),
            F.element_at(F.col(path_col), -1).alias("origin_as"),
            (F.col(addr_col) - F.col(addr_col) % span2).alias("_parent"),
            F.col(addr_col).alias("_addr"),
        )
        .distinct()
    )
    from bgpexplorer_spark.functions.iputil import v4_to_dotted

    return (
        sib.groupBy("_parent", "prefixlen", "origin_as")
        .agg(F.count_distinct("_addr").alias("_n"))
        .filter(F.col("_n") == 2)
        .select(
            F.concat_ws(
                "/", v4_to_dotted(F.col("_parent")),
                (F.col("prefixlen") - 1).cast("string"),
            ).alias("agg_nlri"),
            (F.col("prefixlen") - 1).alias("agg_plen"),
            "origin_as",
        )
    )


def aspath_loops(
    state: DataFrame, path_col: str = "aspath_flat",
) -> DataFrame:
    """Route-leak / poisoning hygiene: routes whose AS path contains an
    ASN that REAPPEARS after an intervening different ASN. Benign
    consecutive prepending (65001 65001 65001) is not a loop; a
    non-adjacent repeat (65001 3356 65001) is — the signature of path
    poisoning, leaks through siblings, or misconfigured confederations.

    Pure Column algebra: compress consecutive runs with an indexed
    filter, then any duplicate in the compressed path is a loop.
    Map-only projection + filter — zero shuffles, codegen-able."""
    flat = F.col(path_col)
    compressed = F.filter(
        flat, lambda x, i: (i == 0) | (x != F.element_at(flat, i))
    )
    staged = state.withColumn("_comp", compressed)
    comp = F.col("_comp")
    looped = F.size(comp) != F.size(F.array_distinct(comp))
    dups = F.filter(
        F.array_distinct(comp),
        lambda a: F.size(F.filter(comp, lambda x: x == a)) > 1,
    )
    return (
        staged.filter(flat.isNotNull() & looped)
        .select(
            "nlri_str",
            comp.alias("compressed_path"),
            dups.alias("looped_asns"),
        )
    )


def as_hegemony(state: DataFrame, path_col: str = "aspath_flat") -> DataFrame:
    """Per-AS transit footprint (the Internet Health Report "AS
    hegemony" idea reduced to one collector's view): for every AS that
    appears as a TRANSIT hop — any position except the origin (last
    element), prepends collapsed, loops counted once — the number of
    routes it carries and that count as a fraction of all routes. The
    ASes every path funnels through are the infrastructure whose outage
    would hurt; a sudden hegemony jump is a leak/hijack signal.

    Explode distinct transit hops + one hash-aggregate + a broadcast of
    the single total row — the as_adjacency cost class."""
    p = F.col(path_col)
    comp = F.filter(
        p, lambda x, i: (i == F.lit(0)) | (x != F.element_at(p, i))
    )
    transit = F.array_distinct(
        F.slice(comp, 1, F.greatest(F.size(comp) - 1, F.lit(0)))
    )
    per = (
        state.select(F.explode(transit).alias("asn"))
        .groupBy("asn")
        .agg(F.count(F.lit(1)).alias("n_routes"))
    )
    total = state.select(F.count(F.lit(1)).alias("_t"))
    return per.crossJoin(F.broadcast(total)).select(
        "asn", "n_routes",
        F.round(F.col("n_routes") / F.col("_t"), 6).alias("hegemony"),
    )


def prefix_visibility(state: DataFrame) -> DataFrame:
    """Per-prefix visibility: how many of the RIB's sessions carry an
    active route for it, and the fraction of all sessions that is — the
    "is this prefix globally seen or leaking from one peer" check every
    looking-glass answers. One (rib, nlri) aggregate + a broadcast of
    the per-rib session totals."""
    per = state.groupBy("rib", "nlri_str").agg(
        F.count_distinct("session_id").alias("n_sessions")
    )
    totals = state.groupBy("rib").agg(
        F.count_distinct("session_id").alias("_t")
    )
    return per.join(F.broadcast(totals), "rib").select(
        "rib", "nlri_str", "n_sessions",
        F.round(F.col("n_sessions") / F.col("_t"), 6).alias("visibility"),
    )


def _collapse_prepends(p: Column) -> Column:
    """Drop consecutive duplicate hops (prepends) from a flat AS path."""
    return F.filter(
        p, lambda x, i: (i == F.lit(0)) | (x != F.element_at(p, i))
    )


def as_relationships(
    state: DataFrame, path_col: str = "aspath_flat"
) -> DataFrame:
    """Gao-style AS relationship inference (Gao 2001, "On inferring
    autonomous system relationships in the Internet") from one
    collector's announced paths — the classification CAIDA's AS-rank
    publishes, computable from exactly the data the reference's RIB
    holds (src/bgpattrs.rs aspath).

    Per distinct collapsed path: the highest-degree AS is the summit;
    edges before it vote customer→provider (uphill), edges at/after it
    vote provider→customer (downhill). Per undirected edge the votes
    resolve to ``c2p`` (as_low is as_high's customer), ``p2c``, or
    ``p2p`` when paths disagree. Ties on degree break to the earliest
    position, so the result is deterministic.

    Scale: everything after the initial ``distinct`` runs on the AS
    *graph* (distinct paths / edges / nodes), which stays millions of
    rows however big the RIB is — explode + two hash-aggregates + one
    equi-join of hops against degrees. No driver state, no iteration.
    """
    p = _collapse_prepends(F.col(path_col))
    # the distinct path graph feeds three branches (edges, hops, degree);
    # materialize it once via localCheckpoint — unlike .cache(), whose
    # CacheManager entry outlives the request and accumulates across
    # serving calls, checkpoint blocks are dropped when this DataFrame
    # is garbage-collected
    paths = (
        state.select(p.alias("path"))
        .filter(F.size("path") >= 2)
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("path") - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(F.col("path"), i).alias("a"),
            F.element_at(F.col("path"), i + 1).alias("b"),
        ),
    )
    edges = paths.select("path", F.explode(pairs).alias("e")).select(
        "path", F.col("e.pos").alias("pos"),
        F.col("e.a").alias("a"), F.col("e.b").alias("b"),
    )
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("asn")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    hops = paths.select(
        "path", F.posexplode("path").alias("pos0", "asn")
    ).select("path", (F.col("pos0") + 1).alias("pos"), "asn")
    top = (
        hops.join(deg, "asn")
        .groupBy("path")
        .agg(
            F.min_by(
                "pos", F.struct((-F.col("degree")).alias("d"), F.col("pos"))
            ).alias("top_pos")
        )
    )
    votes = edges.join(top, "path").select(
        F.least("a", "b").alias("as_low"),
        F.greatest("a", "b").alias("as_high"),
        F.when(F.col("pos") < F.col("top_pos"), F.col("a") < F.col("b"))
        .otherwise(F.col("b") < F.col("a"))
        .alias("low_is_customer"),
    )
    lo_c = F.sum(F.when(F.col("low_is_customer"), 1).otherwise(0))
    hi_c = F.sum(F.when(F.col("low_is_customer"), 0).otherwise(1))
    return (
        votes.groupBy("as_low", "as_high")
        .agg(lo_c.alias("n_low_customer"), hi_c.alias("n_high_customer"))
        .select(
            "as_low", "as_high", "n_low_customer", "n_high_customer",
            F.when(
                (F.col("n_low_customer") > 0) & (F.col("n_high_customer") > 0),
                "p2p",
            )
            .when(F.col("n_low_customer") > 0, "c2p")
            .otherwise("p2c")
            .alias("rel"),
        )
    )


def customer_cone(
    rels: DataFrame, max_iters: int = 16
) -> DataFrame:
    """Customer-cone size per AS (CAIDA AS-rank's headline metric) from
    :func:`as_relationships` output: the number of ASes reachable by
    walking provider→customer edges, self included — the "how much of
    the Internet does this AS sell transit to" measure.

    Iterative frontier expansion over the provider→customer edge set
    with ``localCheckpoint`` per round to cut lineage; the AS hierarchy
    is shallow (≤10 tiers in practice), so the loop converges in a
    handful of rounds, and every round is one equi-join + distinct on
    the graph-sized edge table — independent of RIB size. ``p2p`` edges
    contribute nothing, exactly as in the published metric."""
    pc = rels.filter(F.col("rel") != "p2p").select(
        F.when(F.col("rel") == "p2c", F.col("as_low"))
        .otherwise(F.col("as_high"))
        .alias("provider"),
        F.when(F.col("rel") == "p2c", F.col("as_high"))
        .otherwise(F.col("as_low"))
        .alias("customer"),
    ).distinct()
    pc = pc.localCheckpoint(eager=True)
    reach = pc
    for _ in range(max_iters):
        grown = (
            reach.alias("r")
            .join(pc.alias("e"), F.col("r.customer") == F.col("e.provider"))
            .select(F.col("r.provider"), F.col("e.customer"))
            .union(reach)
            .distinct()
            .localCheckpoint(eager=True)
        )
        if grown.count() == reach.count():
            reach = grown
            break
        reach = grown
    nodes = pc.select(F.col("provider").alias("asn")).union(
        pc.select(F.col("customer").alias("asn"))
    ).distinct()
    # a p2c cycle puts (n, n) into the closure — drop it so a member of
    # a cycle counts itself once (via the +1), not twice
    sizes = (
        reach.filter(F.col("provider") != F.col("customer"))
        .groupBy(F.col("provider").alias("asn"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return nodes.join(sizes, "asn", "left").select(
        "asn",
        (F.coalesce(F.col("n_customers"), F.lit(0)) + 1).alias("cone_size"),
    )


def as_degree_summary(rels: DataFrame) -> DataFrame:
    """Per-AS relationship profile from :func:`as_relationships`
    output: provider / customer / peer counts and the derived role
    (stub = no customers, transit otherwise) — the one-line summary an
    operator reads before the full cone. Two narrow projections of the
    edge table + one hash aggregate; graph-sized."""
    lo = rels.select(
        F.col("as_low").alias("asn"),
        F.when(F.col("rel") == "c2p", 1).otherwise(0).alias("p"),
        F.when(F.col("rel") == "p2c", 1).otherwise(0).alias("c"),
        F.when(F.col("rel") == "p2p", 1).otherwise(0).alias("e"),
    )
    hi = rels.select(
        F.col("as_high").alias("asn"),
        F.when(F.col("rel") == "p2c", 1).otherwise(0).alias("p"),
        F.when(F.col("rel") == "c2p", 1).otherwise(0).alias("c"),
        F.when(F.col("rel") == "p2p", 1).otherwise(0).alias("e"),
    )
    return (
        lo.unionByName(hi)
        .groupBy("asn")
        .agg(
            F.sum("p").alias("n_providers"),
            F.sum("c").alias("n_customers"),
            F.sum("e").alias("n_peers"),
        )
        .withColumn(
            "role",
            F.when(F.col("n_customers") > 0, "transit").otherwise("stub"),
        )
    )


def route_age_report(
    history: DataFrame, asof_ms: int | None = None
) -> DataFrame:
    """Per active route: when it last changed, how old it is at the
    evaluation instant, and how many history events its key has seen —
    the stability view ("is this route settled or still churning")
    operators read next to the flap report. One pass: the same
    newest-per-key window the state queries use plus per-key count."""
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc())
    at = (
        F.lit(asof_ms).cast("double") / 1000.0
        if asof_ms is not None
        else F.unix_timestamp(F.current_timestamp()).cast("double")
    )
    src = history
    if asof_ms is not None:
        src = src.filter(F.col("ts") <= ts_cutoff_str(asof_ms))
    ranked = src.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*KEY_COLS))
    ).withColumn(
        "_first", F.min("ts").over(Window.partitionBy(*KEY_COLS))
    )
    return (
        ranked.filter((F.col("_rn") == 1) & F.col("active"))
        .select(
            "rib", "nlri_str", "session_id", "path_id",
            F.col("ts").alias("last_change_ts"),
            F.col("_first").alias("first_seen_ts"),
            (at - F.col("ts").cast("double")).cast("long").alias("age_sec"),
            F.col("_n").alias("n_events"),
        )
    )


def update_burstiness(
    history: DataFrame, bucket_sec: int = 60
) -> DataFrame:
    """Per session: total events, active time buckets, the busiest
    bucket, and the burst ratio (busiest / mean-per-active-bucket) —
    the "is this peer melting down or steady" signal. Two map-side-
    combinable aggregates (bucket counts, then the per-session rollup).
    """
    b = (F.col("ts").cast("long") / bucket_sec).cast("long")
    per_bucket = history.groupBy(
        F.col("session_id"), b.alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    return per_bucket.groupBy("session_id").agg(
        F.sum("_c").alias("n_events"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("_c").alias("max_bucket"),
        F.round(
            F.max("_c") / (F.sum("_c") / F.count(F.lit(1))), 4
        ).alias("burst_ratio"),
    )


def peer_agreement(state: DataFrame) -> DataFrame:
    """Pairwise Jaccard agreement of the active prefix sets between
    sessions — "does this new peer see the same Internet" / "which
    feed is missing routes". The join runs on shared prefixes (never a
    session cross-product), and the per-session sizes ride a broadcast:
    cost is edge-count-of-shared-prefixes, which is how every pairwise
    set-similarity on this engine is shaped (cf. the dedup pipeline)."""
    keys = state.select("session_id", "rib", "nlri_str").distinct()
    sizes = keys.groupBy("session_id").agg(F.count(F.lit(1)).alias("_n"))
    a, b = keys.alias("a"), keys.alias("b")
    shared = (
        a.join(b, ["rib", "nlri_str"])
        .filter(F.col("a.session_id") < F.col("b.session_id"))
        .groupBy(
            F.col("a.session_id").alias("session_a"),
            F.col("b.session_id").alias("session_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("session_id").alias("session_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("session_id").alias("session_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(F.broadcast(sa), "session_a")
        .join(F.broadcast(sb), "session_b")
        .select(
            "session_a", "session_b", "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("_na") + F.col("_nb") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
    )


def top_communities(state: DataFrame, k: int = 20) -> DataFrame:
    """The k most-attached community values across the active state,
    with route counts and the display form the reference prints
    (asn:value, src/bgpattrs.rs comms display) — the traffic-engineering
    inventory ("which TE tags are actually in use"). One explode + one
    map-side-combinable aggregate + TakeOrdered."""
    return (
        state.select(F.explode("comms").alias("comm"))
        .groupBy("comm")
        .agg(F.count(F.lit(1)).alias("n_routes"))
        .select(
            "comm",
            F.concat_ws(
                ":",
                F.floor(F.col("comm") / 65536).cast("long"),
                (F.col("comm") % 65536).cast("long"),
            ).alias("comm_str"),
            "n_routes",
        )
        .orderBy(F.col("n_routes").desc(), "comm")
        .limit(k)
    )


def prefix_length_distribution(state: DataFrame) -> DataFrame:
    """Routes and distinct prefixes per (rib, prefixlen) plus each
    length's share of its rib — the table every looking glass shows
    first and the deaggregation-pressure signal. One aggregate plus a
    broadcast of per-rib totals."""
    per = state.groupBy("rib", "prefixlen").agg(
        F.count(F.lit(1)).alias("n_routes"),
        F.count_distinct("nlri_str").alias("n_prefixes"),
    )
    totals = state.groupBy("rib").agg(F.count(F.lit(1)).alias("_t"))
    return per.join(F.broadcast(totals), "rib").select(
        "rib", "prefixlen", "n_routes", "n_prefixes",
        F.round(F.col("n_routes") / F.col("_t"), 4).alias("share"),
    )


def route_leaks(
    state: DataFrame, rels: DataFrame | None = None,
    path_col: str = "aspath_flat",
) -> DataFrame:
    """RFC 7908 route-leak candidates: paths that violate valley-free
    export order under the inferred relationship graph
    (:func:`as_relationships`, computed from the same state when not
    passed). Traversing a path, every edge is ``up`` (customer→provider),
    ``down`` or ``peer``; a clean path is up* peer? down* — so a leak is
    exactly "an up/peer edge AFTER a down/peer edge", i.e.
    ``min(pos of down|peer) < max(pos of up|peer)``. The AS that
    re-exported upward (the leaker) is the left node of the first
    up/peer edge after the valley starts.

    Everything runs on the distinct-path graph: one edge/rels equi-join,
    one per-path aggregate, one join back for the leaker. Edges with no
    inferred relationship (never co-observed) count as unknown and are
    skipped conservatively."""
    if rels is None:
        rels = as_relationships(state, path_col)
    p = _collapse_prepends(F.col(path_col))
    paths = (
        state.select(p.alias("path")).filter(F.size("path") >= 3).distinct()
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("path") - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at(F.col("path"), i).alias("a"),
            F.element_at(F.col("path"), i + 1).alias("b"),
        ),
    )
    edges = paths.select("path", F.explode(pairs).alias("e")).select(
        "path", F.col("e.pos").alias("pos"),
        F.col("e.a").alias("a"), F.col("e.b").alias("b"),
    )
    typed = edges.join(
        rels.select("as_low", "as_high", "rel"),
        (F.least("a", "b") == F.col("as_low"))
        & (F.greatest("a", "b") == F.col("as_high")),
    ).select(
        "path", "pos", "a", "b",
        F.when(F.col("rel") == "p2p", "peer")
        .when(
            ((F.col("rel") == "c2p") & (F.col("a") < F.col("b")))
            | ((F.col("rel") == "p2c") & (F.col("a") > F.col("b"))),
            "up",
        )
        .otherwise("down")
        .alias("dir"),
        # feeds spans + leaker_edge; localCheckpoint instead of cache so
        # a long-running service doesn't accumulate CacheManager entries
        # per request (blocks free on GC of this frame)
    ).localCheckpoint(eager=True)
    spans = typed.groupBy("path").agg(
        F.min(
            F.when(F.col("dir").isin("down", "peer"), F.col("pos"))
        ).alias("_dp"),
        F.max(
            F.when(F.col("dir").isin("up", "peer"), F.col("pos"))
        ).alias("_upmax"),
    ).filter(F.col("_dp") < F.col("_upmax"))
    leaker_edge = (
        typed.join(spans, "path")
        .filter(
            F.col("dir").isin("up", "peer") & (F.col("pos") > F.col("_dp"))
        )
        .groupBy("path")
        .agg(F.min_by(F.col("a"), F.col("pos")).alias("leaker_asn"),
             F.min("pos").alias("leak_pos"))
    )
    return leaker_edge.select(
        F.concat_ws(" ", F.transform("path", lambda x: x.cast("string")))
        .alias("path_str"),
        "leaker_asn", "leak_pos",
    )


def origin_footprint(state: DataFrame, k: int = 50) -> DataFrame:
    """Announced v4 address-space footprint per origin AS: distinct
    prefixes and the total address count they span (distinct prefixes
    summed — covering/covered overlaps within one origin intentionally
    both count, as in announcement-magnitude dashboards). The "how much
    of the Internet does this AS originate" view and the magnitude axis
    of a hijack alert. One distinct + one aggregate + TakeOrdered."""
    o = origin_as(F.col("aspath_flat"))
    pfx = (
        state.filter(F.col("addr_v4").isNotNull())
        .select(o.alias("origin_as"), "addr_v4", "prefixlen")
        .filter(F.col("origin_as").isNotNull())
        .distinct()
    )
    span = F.pow(F.lit(2.0), F.lit(32) - F.col("prefixlen")).cast("bigint")
    return (
        pfx.groupBy("origin_as")
        .agg(
            F.count(F.lit(1)).alias("n_prefixes"),
            F.sum(span).alias("n_addresses"),
        )
        .orderBy(F.col("n_addresses").desc(), "origin_as")
        .limit(k)
    )


# (name, first addr, last addr) — IPv6 special-purpose blocks that must
# not be announced in the DFZ (RFC 6890 registry; BINARY(16) big-endian
# forms compare lexicographically = numerically)
def _v6(hexstr: str) -> bytes:
    return bytes.fromhex(hexstr)


MARTIAN_V6_RANGES: list[tuple[str, bytes, bytes]] = [
    ("unspecified-loopback", _v6("00" * 16), _v6("00" * 15 + "01")),  # ::/128, ::1
    ("ipv4-mapped", _v6("00" * 10 + "ffff" + "00" * 4),
     _v6("00" * 10 + "ffff" + "ff" * 4)),                              # ::ffff:0:0/96
    ("discard-only", _v6("0100" + "00" * 14),
     _v6("0100000000000000" + "ff" * 8)),                              # 100::/64
    ("doc-2001db8", _v6("20010db8" + "00" * 12),
     _v6("20010db8" + "ff" * 12)),                                     # 2001:db8::/32
    ("ula", _v6("fc" + "00" * 15), _v6("fd" + "ff" * 15)),             # fc00::/7
    ("link-local", _v6("fe80" + "00" * 14),
     _v6("febf" + "ff" * 14)),                                         # fe80::/10
    ("multicast", _v6("ff" + "00" * 15), _v6("ff" + "ff" * 15)),       # ff00::/8
]


def martian_prefixes_v6(
    state: DataFrame, addr_col: str = "addr_v6"
) -> DataFrame:
    """IPv6 counterpart of :func:`martian_prefixes`: announcements whose
    network address falls in an RFC 6890 special-purpose block
    (loopback/unspecified, v4-mapped, discard-only, documentation, ULA,
    link-local, multicast). BINARY(16) big-endian compares
    lexicographically, so each range is a pure BETWEEN over binary
    literals — zero shuffles, codegen-able."""
    a = F.col(addr_col)
    expr = F.lit(None).cast("string")
    for name, lo, hi in reversed(MARTIAN_V6_RANGES):
        expr = F.when(
            a.isNotNull() & (a >= F.lit(lo)) & (a <= F.lit(hi)), F.lit(name)
        ).otherwise(expr)
    return state.withColumn("martian", expr).filter(F.col("martian").isNotNull())


def upstream_diversity(
    state: DataFrame, path_col: str = "aspath_flat"
) -> DataFrame:
    """Per-origin upstream diversity: how many DISTINCT penultimate-hop
    ASes announce each origin's prefixes — the single-homed/multi-homed
    resilience view an operator reads before a provider migration (and
    the denominator of "how much of the table would one upstream outage
    strand"). Prepends are collapsed first so self-prepended origins
    don't count themselves as an upstream; paths shorter than 2 hops
    (direct peers / locally originated) are excluded — they have no
    upstream to diversify.

    Scale: one projection + one hash aggregate over the active state —
    map-side partial, no joins, no explode."""
    p = _collapse_prepends(F.col(path_col))
    rows = (
        state.filter(F.size(p) >= 2)
        .select(
            F.element_at(p, -1).alias("origin_as"),
            F.element_at(p, -2).alias("upstream_as"),
            "nlri_str",
        )
    )
    return (
        rows.groupBy("origin_as")
        .agg(
            F.count_distinct("upstream_as").alias("n_upstreams"),
            F.count_distinct("nlri_str").alias("n_prefixes"),
        )
        .withColumn("single_homed", F.col("n_upstreams") == 1)
    )


def deaggregation(
    state: DataFrame, addr_col: str = "addr_v4", _mask=None
) -> DataFrame:
    """Per-origin deaggregation report: of each origin's announced v4
    prefixes, how many are COVERED by another announcement of the SAME
    origin with a shorter mask (the classic table-bloat signal — a /20
    plus its sixteen /24s scores 16 covered). Output: origin_as,
    n_prefixes, n_covered, deagg_ratio. (``_mask`` swaps the truncation
    expression — :func:`deaggregation_v6` passes the BINARY(16) masker.)

    Scale shape: the cover test is NOT a range join — each announced
    prefix emits one truncation per DISTINCT shorter mask length present
    in the table (≤ 32 for v4, discovered from a 33-row-bounded
    aggregate, the lpm_join_v4 trick), and coverage is an equi-semi-join
    on (origin_as, truncated addr, plen). Shuffles on hash keys only."""
    if _mask is None:
        def _mask(c: Column, p: int) -> Column:
            span = 1 << (32 - p)
            return c - (c % span)
    o = origin_as(F.col("aspath_flat"))
    # materialized once: feeds plen discovery, every truncation branch,
    # the cover semi-join side, and the totals (same rationale as
    # subprefix_hijacks — localCheckpoint, no CacheManager residue)
    pfx = (
        state.filter(F.col(addr_col).isNotNull())
        .select(o.alias("origin_as"), F.col(addr_col).alias("_addr"), "prefixlen")
        .filter(F.col("origin_as").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    plens = sorted(
        r["prefixlen"]
        for r in pfx.select("prefixlen").distinct().collect()  # ≤ 33 rows
    )
    truncs = None
    for p in plens[:-1]:  # the longest mask can't cover anything
        t = (
            pfx.filter(F.col("prefixlen") > p)
            .select(
                "origin_as",
                "_addr",
                "prefixlen",
                _mask(F.col("_addr"), p).alias("_cover_addr"),
                F.lit(p).alias("_cover_plen"),
            )
        )
        truncs = t if truncs is None else truncs.unionByName(t)
    if truncs is None:
        covered = pfx.limit(0)
    else:
        covered = truncs.join(
            pfx.select(
                "origin_as",
                F.col("_addr").alias("_cover_addr"),
                F.col("prefixlen").alias("_cover_plen"),
            ),
            ["origin_as", "_cover_addr", "_cover_plen"],
            "left_semi",
        ).select("origin_as", "_addr", "prefixlen").distinct()
    totals = pfx.groupBy("origin_as").agg(
        F.count(F.lit(1)).alias("n_prefixes")
    )
    cov = covered.groupBy("origin_as").agg(
        F.count(F.lit(1)).alias("n_covered")
    )
    return (
        totals.join(cov, "origin_as", "left")
        .select(
            "origin_as",
            "n_prefixes",
            F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
            F.round(
                F.coalesce("n_covered", F.lit(0)) / F.col("n_prefixes"), 4
            ).alias("deagg_ratio"),
        )
    )


def deaggregation_v6(state: DataFrame, addr_col: str = "addr_v6") -> DataFrame:
    """IPv6 :func:`deaggregation` — identical semantics and scale shape
    over BINARY(16) addresses via lpm._mask_v6 literal-plen masking."""
    from bgpexplorer_spark.operators.lpm import _mask_v6

    return deaggregation(state, addr_col, _mask=_mask_v6)


def subprefix_hijacks(
    state: DataFrame, addr_col: str = "addr_v4", _mask=None
) -> DataFrame:
    """Sub-prefix hijack candidates: an announced more-specific whose
    most-specific COVERING announcement carries a DIFFERENT origin AS —
    the classic "/24 punched out of someone else's /16" alert. The MOAS
    complement: :func:`moas_conflicts` flags same-prefix origin splits,
    this flags cover/more-specific splits (the shape of real sub-prefix
    hijacks, which MOAS never sees because the exact prefix is new).
    ``_mask`` swaps the truncation expression, same seam as
    :func:`deaggregation` — :func:`subprefix_hijacks_v6` passes the
    BINARY(16) masker.

    A more-specific flags only when the origin set of its
    MOST-SPECIFIC covering announcement does not contain its own origin:
    a /24 inside the announcer's own /16 is legitimate deaggregation
    even when some distant /8 above belongs to someone else (the
    immediate parent is the authority the alert compares against).

    Output: (addr, prefixlen, origin_as) of the suspect more-specific,
    the covering mask length, the sorted distinct origin set announced
    on that cover, and how many distinct origins that is.

    Scale shape: identical to :func:`deaggregation` — NO range join.
    Each announced prefix emits one truncation per distinct shorter mask
    present (≤ 32 for v4, discovered from a 33-row-bounded aggregate),
    covers resolve via an equi-join on (cover_addr, cover_plen), and the
    final per-specific reduction is one hash aggregate. Everything
    shuffles on hash keys only.
    """
    if _mask is None:
        def _mask(c: Column, p: int) -> Column:
            span = 1 << (32 - p)
            return c - (c % span)
    addr_type = state.schema[addr_col].dataType.simpleString()
    o = origin_as(F.col("aspath_flat"))
    # the distinct announcement set feeds the plen discovery, every
    # truncation branch, AND the cover side — materialize it once
    # (localCheckpoint, not .cache(): blocks drop with this DataFrame,
    # no CacheManager entry outliving a serving request)
    pfx = (
        state.filter(F.col(addr_col).isNotNull())
        .select(o.alias("origin_as"), F.col(addr_col).alias("_addr"), "prefixlen")
        .filter(F.col("origin_as").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    plens = sorted(
        r["prefixlen"]
        for r in pfx.select("prefixlen").distinct().collect()  # ≤ 33 rows
    )
    truncs = None
    for p in plens[:-1]:  # the longest mask can't cover anything
        t = pfx.filter(F.col("prefixlen") > p).select(
            "origin_as",
            "_addr",
            "prefixlen",
            _mask(F.col("_addr"), p).alias("_cover_addr"),
            F.lit(p).alias("_cover_plen"),
        )
        truncs = t if truncs is None else truncs.unionByName(t)
    if truncs is None:
        return state.sparkSession.createDataFrame(
            [],
            f"{addr_col} {addr_type}, prefixlen int, origin_as bigint, "
            "cover_plen int, cover_origins_str string, n_cover_origins long",
        )
    covers = pfx.select(
        F.col("_addr").alias("_cover_addr"),
        F.col("prefixlen").alias("_cover_plen"),
        F.col("origin_as").alias("_cover_origin"),
    )
    # ALL covers (origin agreement is judged at the most-specific one —
    # filtering mismatches first would wrongly escalate a legitimate
    # self-deaggregation to some distant foreign cover above it)
    cand = truncs.join(covers, ["_cover_addr", "_cover_plen"])
    return _hijack_reduce(cand, addr_col)


def _hijack_reduce(cand: DataFrame, addr_out: str) -> DataFrame:
    """Shared v4/v6 reduction for subprefix_hijacks: most-specific cover
    per suspect via one window; the following groupBy clusters on a
    superset of the window keys, so Catalyst reuses the same Exchange
    (one shuffle, not groupBy+join); a suspect flags only when no origin
    on that cover matches its own."""
    wmax = Window.partitionBy("_addr", "prefixlen", "origin_as")
    return (
        cand.withColumn("_maxp", F.max("_cover_plen").over(wmax))
        .filter(F.col("_cover_plen") == F.col("_maxp"))
        .withColumnRenamed("_cover_plen", "cover_plen")
        .groupBy("_addr", "prefixlen", "origin_as", "cover_plen")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set("_cover_origin")),
                    lambda x: x.cast("string"),
                ),
            ).alias("cover_origins_str"),
            F.size(F.collect_set("_cover_origin")).cast("long").alias(
                "n_cover_origins"
            ),
            F.max(
                (F.col("_cover_origin") == F.col("origin_as")).cast("int")
            ).alias("_own"),
        )
        .filter(F.col("_own") == 0)
        .drop("_own")
        .withColumnRenamed("_addr", addr_out)
    )


def subprefix_hijacks_v6(state: DataFrame, addr_col: str = "addr_v6") -> DataFrame:
    """IPv6 :func:`subprefix_hijacks` — identical semantics and scale
    shape over BINARY(16) addresses via lpm._mask_v6 literal-plen
    byte/bit masking (the same seam :func:`deaggregation_v6` uses)."""
    from bgpexplorer_spark.operators.lpm import _mask_v6

    return subprefix_hijacks(state, addr_col, _mask=_mask_v6)


def convergence_report(
    history: DataFrame, gap_sec: int = 300, key_col: str = "nlri_str"
) -> DataFrame:
    """BGP convergence bursts per prefix: consecutive history events for
    the same key closer than ``gap_sec`` apart form one burst (a routing
    event propagating), and the burst's duration is the classic
    convergence-time measurement. Output one row per (key, burst):
    burst sequence number, event count, sessions touched, start, and
    duration_ms (0 for a single-event burst).

    Scale shape: the standard gap-sessionization plan — one window over
    (key ORDER BY ts) for the lag + running-sum burst ids (a single
    Exchange on the key), then one hash aggregate on (key, burst_id).
    No self-join, no collect; same keys the ingest path already
    shuffles on.
    """
    w = Window.partitionBy(key_col).orderBy("ts", "session_id")
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = mic - F.lag(mic).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_sec * 1_000_000), 1).otherwise(0)
    df = history.withColumn("_new", is_new).withColumn(
        "burst_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return df.groupBy(key_col, "burst_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("session_id").alias("n_sessions"),
        F.min("ts").alias("burst_start"),
        (
            (F.unix_micros(F.max("ts").cast("timestamp"))
             - F.unix_micros(F.min("ts").cast("timestamp"))) / 1000
        ).cast("bigint").alias("duration_ms"),
    )


def path_inflation(state: DataFrame, path_col: str = "aspath_flat") -> DataFrame:
    """Per-prefix AS-path inflation report: collapsed (prepend-free)
    path length of every route vs the SHORTEST collapsed path observed
    for the same prefix across sessions — the classic measurement of how
    much longer real routes run than the best available (traffic
    engineering, de-preferencing, or leak fallout all show up here).
    Output: nlri_str, min_len, max_len, n_routes, n_inflated (routes
    strictly longer than the prefix's minimum).

    Scale shape: one projection for the fold-computed collapsed length,
    then a window min + aggregate BOTH keyed on nlri_str — Catalyst
    reuses the single Exchange; no join, no second pass.
    """
    ln = F.size(_collapse_prepends(F.col(path_col)))
    per = (
        state.filter(F.size(F.col(path_col)) > 0)
        .select("nlri_str", ln.alias("_len"))
    )
    w = Window.partitionBy("nlri_str")
    return (
        per.withColumn("_min", F.min("_len").over(w))
        .groupBy("nlri_str")
        .agg(
            F.min("_len").alias("min_len"),
            F.max("_len").alias("max_len"),
            F.count(F.lit(1)).alias("n_routes"),
            F.sum(
                F.when(F.col("_len") > F.col("_min"), 1).otherwise(0)
            ).cast("bigint").alias("n_inflated"),
        )
    )


def route_uptime(history: DataFrame, window_end=None) -> DataFrame:
    """Per-route availability report: each history row opens an interval
    that the key's next event closes (the last one closes at
    ``window_end``, default = the newest event in the table), and the
    announced fraction of a route's observed lifetime is the classic
    stability/uptime metric (the time-weighted complement of flap
    counting). Output per (rib, nlri_str, session_id, path_id):
    first_seen, n_events, uptime_ms, observed_ms, uptime_fraction
    (NULL for keys observed for zero time).

    Scale shape: one lead() window on the ingest partitioning, the
    window-end bound attached as a one-row broadcast (no driver literal
    needed), then one hash aggregate on the same keys — no self-join.
    """
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    if window_end is None:
        end = history.agg(F.max(mic).alias("_end_us"))
        h = history.join(F.broadcast(end))
    else:
        # events past the cutoff must not open intervals (and the last
        # in-window interval closes at the cutoff) — same ts<= discipline
        # as rib_asof; without it post-cutoff rows yield negative durations
        cutoff = ts_cutoff_str(window_end)
        h = history.filter(F.col("ts") <= F.lit(cutoff)).withColumn(
            "_end_us",
            F.unix_micros(F.lit(cutoff).cast("timestamp")),
        )
    w = Window.partitionBy(*KEY_COLS).orderBy("ts")
    nxt = F.coalesce(F.lead(mic).over(w), F.col("_end_us"))
    dur = F.floor((nxt - mic) / 1000).cast("bigint")
    per = h.select(
        *KEY_COLS,
        F.col("ts"),
        F.col("active"),
        F.when(F.col("active"), dur).otherwise(F.lit(0)).alias("_up"),
        dur.alias("_dur"),
    )
    out = per.groupBy(*KEY_COLS).agg(
        F.min("ts").alias("first_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_up").alias("uptime_ms"),
        F.sum("_dur").alias("observed_ms"),
    )
    return out.withColumn(
        "uptime_fraction",
        F.when(
            F.col("observed_ms") > 0,
            F.round(F.col("uptime_ms") / F.col("observed_ms"), 4),
        ),
    )


def roa_delta(
    routes: DataFrame,
    roas_before: DataFrame,
    roas_after: DataFrame,
    addr_col: str | None = None,
    plen_col: str = "prefixlen",
    origin_col: str = "origin_as",
    roa_plens_before: list[int] | None = None,
    roa_plens_after: list[int] | None = None,
    changed_only: bool = True,
    v6: bool = False,
) -> DataFrame:
    """ROA change-impact report: every route's RFC 6811 validity under
    the CURRENT ROA set vs a PROPOSED one — the pre-deployment check an
    operator runs before publishing new ROAs ("which of my announcements
    would go Invalid?"). Output: the route columns +
    (validity_before, validity_after), filtered to changed verdicts by
    default (``changed_only=False`` keeps the diagonal for a full
    transition matrix — :func:`roa_delta_summary`).

    Scale shape (r11 single-pass rewrite): both ROA sets are validated
    in ONE rpki_validate-shaped pipeline — the proposed set is tagged
    and UNIONED with the current one (each side pre-filtered to its own
    ``roa_plens``, exactly the lengths its chained validation would
    have generated candidates for), the candidate explode runs once
    over the union of lengths, and one verdict aggregate computes both
    sides with conditional maxes. The routes frame pays ONE distinct +
    ONE verdict join-back instead of two of each (the chained form
    shuffled the full routes twice); a side with no covering ROA for a
    triple yields a NULL conditional max = NotFound, exactly the
    chained semantics. ``addr_col`` defaults to the family's canonical
    column (addr_v6 under ``v6=True``, addr_v4 otherwise)."""
    if addr_col is None:
        addr_col = "addr_v6" if v6 else "addr_v4"
    if roa_plens_before is None:
        roa_plens_before = [
            r[0] for r in roas_before.select("plen").distinct().collect()
        ]
    if roa_plens_after is None:
        roa_plens_after = [
            r[0] for r in roas_after.select("plen").distinct().collect()
        ]
    roa_plens_before = sorted(int(x) for x in roa_plens_before)
    roa_plens_after = sorted(int(x) for x in roa_plens_after)
    plens_union = sorted({*roa_plens_before, *roa_plens_after})

    def verdict(ok_col: Column) -> Column:
        return (
            F.when(ok_col.isNull(), "NotFound")
            .when(ok_col == 1, "Valid")
            .otherwise("Invalid")
        )

    if not plens_union:
        out = routes.withColumn("validity_before", F.lit("NotFound")).withColumn(
            "validity_after", F.lit("NotFound")
        )
    else:
        if v6:
            from bgpexplorer_spark.operators.lpm import _mask_v6

            def mask(pl: int) -> Column:
                return _mask_v6(F.col(addr_col), pl)
        else:
            def mask(pl: int) -> Column:
                return (
                    F.floor(F.col(addr_col) / F.lit(2 ** (32 - pl))).cast("bigint")
                    * F.lit(2 ** (32 - pl))
                )

        key = [addr_col, plen_col, origin_col]
        cand = F.array(
            *[
                F.struct(F.lit(pl).alias("_plen"), mask(pl).alias("_net"))
                for pl in plens_union
            ]
        )
        exploded = (
            routes.select(*key)
            .distinct()
            .withColumn("_cand", F.explode(cand))
            .filter(F.col(plen_col) >= F.col("_cand._plen"))
            .select(
                *key,
                F.col("_cand._plen").alias("_plen"),
                F.col("_cand._net").alias("_net"),
            )
        )

        def side(roas: DataFrame, plens: list[int], tag: str) -> DataFrame:
            return (
                roas.select(
                    F.col("net").alias("_net"),
                    F.col("plen").alias("_plen"),
                    "max_len",
                    "asn",
                )
                # a chained validation only generates candidates for its
                # own roa_plens: the filter keeps the union-explode from
                # matching lengths that side never considered
                .filter(F.col("_plen").isin(plens) if plens else F.lit(False))
                .withColumn("_side", F.lit(tag))
            )

        tagged = side(roas_before, roa_plens_before, "b").unionByName(
            side(roas_after, roa_plens_after, "a")
        )
        covering = exploded.join(tagged, ["_net", "_plen"], "inner")
        ok = (F.col(plen_col) <= F.col("max_len")) & (
            F.col(origin_col) == F.col("asn")
        )
        verdicts = covering.groupBy(*key).agg(
            F.max(F.when(F.col("_side") == "b", ok.cast("int"))).alias("_ok_b"),
            F.max(F.when(F.col("_side") == "a", ok.cast("int"))).alias("_ok_a"),
        )
        out = (
            routes.join(verdicts, key, "left")
            .withColumn("validity_before", verdict(F.col("_ok_b")))
            .withColumn("validity_after", verdict(F.col("_ok_a")))
            .drop("_ok_b", "_ok_a")
        )
    if changed_only:
        out = out.filter(F.col("validity_before") != F.col("validity_after"))
    return out


def roa_delta_summary(delta: DataFrame) -> DataFrame:
    """Transition matrix over a :func:`roa_delta` run (changed_only=False
    for the full diagonal): route counts per
    (validity_before, validity_after) — the one-line go/no-go view."""
    return delta.groupBy("validity_before", "validity_after").agg(
        F.count(F.lit(1)).alias("routes")
    )

"""Ingest normalization — the write path (SURVEY.md §2.2).

The reference funnels decoded BGP UPDATEs through a single writer thread
that mutates nested BTreeMaps in place (src/ribservice.rs:130-167,
src/bgprib.rs:1104-1205). Here the write path is a *pure transformation*:
``updates`` event rows (FIXTURES.md Table 1 — one row per message x NLRI,
U7 flattening applied) → ``rib_history`` rows with withdraw tombstones
(U5), optional change-dedup (U3) and bounded retention (U4). Ordering per
key comes from event time, not from a single writer (U10) — which is what
makes the same function valid under Structured Streaming ``foreachBatch``
and at 1000-executor scale: all windows partition by the history key, so
the shuffle is one exchange on (rib, nlri_str, session_id, path_id) reused
by every subsequent step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bgpexplorer_spark.functions.codecs import aspath_flatten
from bgpexplorer_spark.schemas import ATTR_FIELDS, KEY_COLS

ATTR_COLS = [f.name for f in ATTR_FIELDS]

def nonconstant_group_keys(df: DataFrame, keys: list[str]) -> list[str]:
    """The subset of ``keys`` NOT provably bound to constants in ``df``'s
    optimized plan — the grouping keys a newest-per-key aggregate should
    actually group on.

    Why this exists (r11 optimization): derived pipelines build history
    with literal key columns (``rib = lit('ipv4u')``, ``path_id =
    lit(0)``). Window partition specs constant-fold those away, so the
    build_history windows sort by the REAL keys only — but Aggregate
    grouping does not: Catalyst's ``RemoveLiteralFromGroupExpressions``
    runs in the finish-analysis batch, BEFORE ``CollapseProject`` inlines
    the literal into the grouping attribute, and never re-runs. The
    leftover foldable keys then defeat the SortAggregate's
    sort-order-satisfaction check (required ordering ``[lit, nlri, ...,
    lit]`` vs child ordering ``[nlri, session, ts]``), forcing TWO
    full-width re-sorts of data the upstream window already sorted
    (measured: the o9_rib_asof / an_rib_diff tails, Sort nodes 11+13 in
    plans/r11/o9_rib_asof_before.txt). Grouping by a constant never
    changes the groups, so dropping the provable constants is a pure
    plan-shape change; callers re-emit the constant columns from the
    aggregated struct instead.

    Detection unwraps ``Alias`` (whose ``foldable`` is hardcoded false in
    Catalyst) and asks the child expression. Any introspection failure —
    or an all-constant key set, where dropping every key would turn a
    grouped aggregate into a global one (different on empty input) —
    falls back to the full key list, i.e. the pre-optimization plan."""
    try:
        plan = df.select(*keys)._jdf.queryExecution().optimizedPlan()
        exprs = plan.expressions()
        if plan.getClass().getSimpleName() != "Project" or exprs.size() != len(keys):
            return list(keys)
        out = []
        for i, k in enumerate(keys):
            e = exprs.apply(i)
            if e.getClass().getSimpleName() == "Alias":
                e = e.child()
            if not e.foldable():
                out.append(k)
        return out if out else list(keys)
    except Exception:
        return list(keys)

def attrs_struct(prefix: str = "") -> Column:
    """The 13-field BgpAttrs struct (src/bgpattrs.rs:20-35) as one column —
    used for whole-attrs equality in differ mode (U3), the Spark analog of
    the reference's Arc pointer comparison (src/bgprib.rs:667-679)."""
    return F.struct(*[F.col(prefix + c).alias(c) for c in ATTR_COLS])

def build_history(
    updates: DataFrame,
    history_mode: str = "every",
    history_depth: int | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """``updates`` events → ``rib_history`` (U1/U2/U3/U4/U5/U7).

    - Withdraw rows arrive with null attrs; they become ``active=false``
      tombstones carrying the attrs of the last prior update for the same
      (rib, nlri, session, path) — the as-of forward fill replacing the
      reference's in-map lookup (src/bgprib.rs:596-618). A withdraw with
      no prior update is dropped (src/bgprib.rs:594-597 ``None =>
      continue``).
    - ``history_mode='differ'``: keep an entry only when (attrs, active)
      changed vs the previous kept entry (src/bgprib.rs:667-679; enum
      src/config.rs:22-28). Skipped rows always equal their immediate
      predecessor, so ``lag`` over the raw sequence is equivalent to
      comparing against the last *kept* row.
    - ``history_depth``: newest-N per key (shrink_hist,
      src/bgprib.rs:326-341), applied after dedup like the reference's
      shrink-before-insert.

    ``seq_col`` breaks ts ties (arrival order) when the source provides one.
    """
    # Pin the history exchange to the nlri_str SUBSET of the key (r11
    # optimization, guide §2.4 "share one exchange"): hash partitioning
    # on a subset of a window's partition keys satisfies its clustering
    # requirement, so the KEY_COLS windows below run on this exchange
    # unchanged — and every downstream per-prefix consumer (rib_diff /
    # moas / prefix-churn / o7's page aggregate, all keyed
    # (rib, nlri_str) or a superset) now REUSES it instead of
    # re-shuffling the history (measured: an_rib_diff 2 exchanges → 1).
    # nlri_str alone, NOT (rib, nlri_str): on the derived pipelines rib
    # is a literal, and a literal in the repartition expression defeats
    # the subset check (the window's required clustering constant-folds
    # it away, the partitioning does not). Skew note: prefixes are the
    # highest-cardinality ingest dimension (~1M+ in a real DFZ), so
    # hashing on the prefix alone only co-locates a prefix's handful of
    # sessions/ribs, it does not hot-spot.
    updates = updates.repartition(F.col("nlri_str"))
    order = [F.col("ts")] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*KEY_COLS).orderBy(*order)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)

    is_upd = F.col("op") == F.lit("update")
    df = updates.withColumn("active", is_upd)
    # forward-fill: attrs of the most recent update at-or-before this row
    df = df.withColumn(
        "_last_attrs",
        F.last(F.when(is_upd, attrs_struct()), ignorenulls=True).over(wcum),
    )
    # withdraw-before-any-update rows vanish (reference skips them)
    df = df.filter(F.col("_last_attrs").isNotNull())
    df = df.select(
        *[c for c in df.columns if c not in ATTR_COLS and not c.startswith("_")],
        *[F.col("_last_attrs").getField(c).alias(c) for c in ATTR_COLS],
    )

    if history_mode == "differ":
        pair = F.struct(attrs_struct(), F.col("active"))
        df = (
            df.withColumn("_prev", F.lag(pair).over(w))
            .filter(F.col("_prev").isNull() | (pair != F.col("_prev")))
            .drop("_prev")
        )
    elif history_mode != "every":
        raise ValueError(f"history_mode must be 'every' or 'differ', got {history_mode!r}")

    if history_depth is not None:
        wdesc = Window.partitionBy(*KEY_COLS).orderBy(*[c.desc() for c in order])
        df = (
            df.withColumn("_rn", F.row_number().over(wdesc))
            .filter(F.col("_rn") <= F.lit(history_depth))
            .drop("_rn")
        )

    df = df.withColumn("aspath_flat", aspath_flatten(F.col("aspath")))
    return df.drop("op")

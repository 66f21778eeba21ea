"""Timestamp helpers (SURVEY.md §2.6 C6; reference src/timestamp.rs).

The reference serializes timestamps as epoch millis (src/timestamp.rs:10-21),
parses query params as epoch millis OR RFC3339 (src/timestamp.rs:44-57), and
buckets change-times with ``cut_millis(granularity)`` (src/timestamp.rs:58-64).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

def parse_ts_param(s: str | int | float | _dt.datetime) -> _dt.datetime:
    """Epoch-millis or RFC3339 → aware UTC datetime (src/timestamp.rs:44-57)."""
    if isinstance(s, _dt.datetime):
        return s if s.tzinfo else s.replace(tzinfo=_dt.timezone.utc)
    if isinstance(s, (int, float)):
        return _dt.datetime.fromtimestamp(float(s) / 1000.0, tz=_dt.timezone.utc)
    txt = str(s)
    try:
        return _dt.datetime.fromtimestamp(int(txt) / 1000.0, tz=_dt.timezone.utc)
    except ValueError:
        parsed = _dt.datetime.fromisoformat(txt.replace("Z", "+00:00"))
        # offset-less ISO strings are UTC, not host-local (mirrors the
        # datetime branch; keeps ts_cutoff_str host-timezone independent)
        return parsed if parsed.tzinfo else parsed.replace(tzinfo=_dt.timezone.utc)

def ts_to_millis(ts: Column) -> Column:
    """TIMESTAMP → epoch millis BIGINT (JSON output form)."""
    # cast: TIMESTAMP_NTZ (parquet without zone) → TIMESTAMP; exact under
    # the session's pinned-UTC zone, no-op for TIMESTAMP inputs
    return F.floor(F.unix_micros(ts.cast("timestamp")) / F.lit(1000)).cast("bigint")

def cut_millis(ts: Column, granularity_sec: int) -> Column:
    """Bucket a timestamp to granularity (src/timestamp.rs:58-64) — the
    analog of the reference's ``idx_changed`` time index; at rest this is
    the partition column ``ts_date`` giving partition pruning instead of a
    posting-list lookup (SURVEY.md §2.4 J2)."""
    g = F.lit(granularity_sec)
    return F.timestamp_seconds((F.unix_timestamp(ts) / g).cast("bigint") * g)

def ts_cutoff_str(at) -> str:
    """Any accepted time form → a naive-UTC literal string for comparing
    against a ts column. A STRING literal coerces to the column's own
    type (TIMESTAMP or TIMESTAMP_NTZ), so the predicate pushes down to
    the parquet scan either way; an explicit cast on the column would
    block pushdown."""
    return (
        parse_ts_param(at)
        .astimezone(_dt.timezone.utc)
        .strftime("%Y-%m-%d %H:%M:%S.%f")
    )


def asof_prune(history, at):
    """``ts <= at`` with PARTITION pruning: when the frame still carries
    the snapshot layout's ``ts_date`` partition column (daemon table /
    snapshot read before the column is dropped), an explicit
    ``ts_date <= date(at)`` predicate prunes whole date partitions —
    Spark cannot infer that bound from the ``ts`` filter alone. The
    column is dropped afterwards so caller-visible schemas stay
    ts_date-free either way."""
    from pyspark.sql import functions as F

    cutoff = ts_cutoff_str(at)
    out = history.filter(F.col("ts") <= F.lit(cutoff))
    if "ts_date" in history.columns:
        out = out.filter(
            F.col("ts_date") <= F.to_date(F.lit(cutoff))
        ).drop("ts_date")
    return out

"""Streaming surface — ST1/ST2 feed, ST4 ingest, ST3 windows
(SURVEY §2.7)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from bgpexplorer_spark.operators.rib import current_state
from bgpexplorer_spark.schemas import UPDATES_SCHEMA
from bgpexplorer_spark.streaming.feed import (
    run_ingest,
    stream_updates_from_files,
    subscribe,
    windowed_update_rates,
)

from tests.ribdata import make_updates, u

def _updates_dir(spark, rows):
    d = tempfile.mkdtemp()
    make_updates(spark, rows).write.mode("overwrite").parquet(d)
    return d

def test_subscribe_rib_gate_and_filter(spark):
    d = _updates_dir(
        spark,
        [
            u("10.0.0.0/24", t=1, aspath=[("Seq", [100])]),
            u("11.0.0.0/24", t=2, aspath=[("Seq", [200])]),
            u("2c0a::/64", rib="ipv6u", t=3),
        ],
    )
    stream = stream_updates_from_files(spark, d)
    assert stream.isStreaming
    q = (
        subscribe(stream, "ipv4u", "as:100")
        .writeStream.format("memory").queryName("feed1").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r.nlri_str for r in spark.sql("SELECT nlri_str FROM feed1").collect()}
    assert got == {"10.0.0.0/24"}
    # reference-faithful mode: filter ignored, rib gate only
    q2 = (
        subscribe(stream, "ipv4u", "as:100", apply_filter=False)
        .writeStream.format("memory").queryName("feed2").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    got2 = {r.nlri_str for r in spark.sql("SELECT nlri_str FROM feed2").collect()}
    assert got2 == {"10.0.0.0/24", "11.0.0.0/24"}

def test_streaming_ingest_materializes_history(spark):
    d = _updates_dir(
        spark,
        [
            u("10.0.0.0/24", t=1, aspath=[("Seq", [100])]),
            u("10.0.0.0/24", t=2, op="withdraw"),
            u("10.0.1.0/24", t=3),
        ],
    )
    out = tempfile.mkdtemp()
    ck = tempfile.mkdtemp()
    stream = stream_updates_from_files(spark, d)
    q = run_ingest(stream, out + "/tbl", ck)
    q.awaitTermination(120)
    hist = spark.read.parquet(out + "/tbl")
    assert hist.count() == 3  # tombstone resolved within the micro-batch
    cur = current_state(hist.drop("ts_date"))
    assert {r.nlri_str for r in cur.select("nlri_str").collect()} == {"10.0.1.0/24"}

def test_windowed_update_rates(spark):
    d = _updates_dir(
        spark,
        [u("10.0.0.0/24", t=1), u("10.0.1.0/24", t=30), u("10.0.2.0/24", t=70),
         u("10.0.0.0/24", t=75, op="withdraw")],
    )
    stream = stream_updates_from_files(spark, d)
    # complete mode: append would hold windows open until the watermark
    # passes, and availableNow ends the stream before that
    q = (
        windowed_update_rates(stream)
        .writeStream.format("memory").queryName("rates").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates ORDER BY window").collect()
    per_window = {r.window.start.second + r.window.start.minute * 60: (r.updates, r.withdraws) for r in rows}
    assert per_window.get(0) == (2, 0)
    assert per_window.get(60) == (1, 1)

def test_live_current_state_stateful(spark):
    from bgpexplorer_spark.streaming.feed import live_current_state

    d = _updates_dir(
        spark,
        [
            u("10.0.0.0/24", t=1),
            u("10.0.0.0/24", t=5, op="withdraw"),   # latest for key → inactive
            u("10.0.1.0/24", t=2),
            u("10.0.1.0/24", t=3),                   # re-announce stays active
            u("10.0.2.0/24", t=4, session_id=7),
        ],
    )
    stream = stream_updates_from_files(spark, d)
    q = (
        live_current_state(stream)
        .writeStream.format("memory").queryName("livecs").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        (r.nlri_str, r.session_id): (r.active, r.ts)
        for r in spark.sql("SELECT * FROM livecs").collect()
    }
    assert rows[("10.0.0.0/24", 0)][0] is False         # tombstoned
    assert rows[("10.0.1.0/24", 0)][0] is True          # latest update wins
    assert rows[("10.0.2.0/24", 7)][0] is True
    assert rows[("10.0.1.0/24", 0)][1].second == 3      # ts of newest entry

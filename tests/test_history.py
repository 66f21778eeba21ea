"""History semantics — FIXTURES.md F-I (reference: src/bgprib.rs:584-683,
src/config.rs:22-28)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bgpexplorer_spark.operators.ingest import build_history
from bgpexplorer_spark.operators.rib import current_state, statistics

from tests.ribdata import make_updates, ts, u

def _seq(spark):
    """update(A,t1) update(A,t2) update(B,t3) withdraw(t4) withdraw(t5) on
    one NLRI/session/path. A = aspath [100], B = aspath [100,200]."""
    return make_updates(
        spark,
        [
            u("10.0.0.0/24", t=1, aspath=[("Seq", [100])]),
            u("10.0.0.0/24", t=2, aspath=[("Seq", [100])]),
            u("10.0.0.0/24", t=3, aspath=[("Seq", [100, 200])]),
            u("10.0.0.0/24", t=4, op="withdraw"),
            u("10.0.0.0/24", t=5, op="withdraw"),
        ],
    )

def test_differ_mode(spark):
    hist = build_history(_seq(spark), history_mode="differ")
    rows = sorted(
        hist.select("ts", "active", F.col("aspath")[0].getField("asns").alias("p")).collect(),
        key=lambda r: r.ts,
    )
    # duplicate A suppressed; second withdraw suppressed; tombstone carries B
    assert [(r.ts, r.active, list(r.p)) for r in rows] == [
        (ts(1).replace(tzinfo=None), True, [100]),
        (ts(3).replace(tzinfo=None), True, [100, 200]),
        (ts(4).replace(tzinfo=None), False, [100, 200]),
    ]

def test_every_mode(spark):
    hist = build_history(_seq(spark), history_mode="every")
    rows = sorted(hist.select("ts", "active", F.col("aspath")[0]["asns"].alias("p")).collect(), key=lambda r: r.ts)
    assert len(rows) == 5
    assert [r.active for r in rows] == [True, True, True, False, False]
    # both withdraws carry last attrs (B)
    assert list(rows[3].p) == [100, 200]
    assert list(rows[4].p) == [100, 200]

def test_history_depth(spark):
    hist = build_history(_seq(spark), history_mode="every", history_depth=2)
    rows = sorted(hist.select("ts").collect(), key=lambda r: r.ts)
    assert [r.ts for r in rows] == [ts(4).replace(tzinfo=None), ts(5).replace(tzinfo=None)]

def test_withdraw_never_seen_dropped(spark):
    upd = make_updates(
        spark,
        [
            u("10.0.0.0/24", t=1, op="withdraw"),          # never announced → dropped
            u("11.0.0.0/24", t=1, aspath=[("Seq", [7])]),
            u("11.0.0.0/24", t=2, op="withdraw"),
        ],
    )
    hist = build_history(upd, history_mode="every")
    got = {(r.nlri_str, r.active) for r in hist.select("nlri_str", "active").collect()}
    assert got == {("11.0.0.0/24", True), ("11.0.0.0/24", False)}

def test_current_state_and_statistics(spark):
    upd = make_updates(
        spark,
        [
            u("10.0.0.0/24", t=1, aspath=[("Seq", [100])]),
            u("10.0.0.0/24", t=4, op="withdraw"),
            u("11.0.0.0/24", t=2, aspath=[("Seq", [200])]),
            u("12.0.0.0/24", t=3, rib="ipv6u"),  # different rib bucket
        ],
    )
    hist = build_history(upd)
    cur = current_state(hist)  # only_active
    assert {r.nlri_str for r in cur.select("nlri_str").collect()} == {"11.0.0.0/24", "12.0.0.0/24"}
    cur_all = current_state(hist, only_active=False)
    assert cur_all.count() == 3

    st = {r.rib: r for r in statistics(hist).collect()}
    assert st["ipv4u"].routes == 2
    assert st["ipv4u"].history_entries == 3
    assert st["ipv4u"].cnt_updates == 2
    assert st["ipv4u"].cnt_withdraws == 1
    assert st["ipv6u"].routes == 1

def test_differ_reannounce_after_withdraw_kept(spark):
    # update(A) withdraw update(A) — third kept because last was inactive
    # (src/bgprib.rs:667-679)
    upd = make_updates(
        spark,
        [
            u("10.0.0.0/24", t=1, aspath=[("Seq", [100])]),
            u("10.0.0.0/24", t=2, op="withdraw"),
            u("10.0.0.0/24", t=3, aspath=[("Seq", [100])]),
        ],
    )
    hist = build_history(upd, history_mode="differ")
    rows = sorted(hist.select("ts", "active").collect(), key=lambda r: r.ts)
    assert [r.active for r in rows] == [True, False, True]

"""Per-stage profiler for bench queries (optimization-round tooling).

For each named bench query: build the DataFrame, one warmup count(),
then N timed count() runs with the AppStatusStore read per run — but
unlike bench.py's aggregate delta, this records EVERY stage's metrics
(tasks, executorRunTime, shuffle read/write, input bytes) so the hot
stage inside a multi-exchange query is attributable, and writes the
`explain("formatted")` text to --plans-dir/<query>_<tag>.txt.

Usage:
    python tools/profile_stages.py /root/testdata/sf0.1 [--plans-dir plans/r11] \
        [--tag before] [--runs 3] [query ...]

Prints one JSON line per query:
    {"query": ..., "wall_median": s, "stages": [{...}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bgpexplorer_spark.session import get_spark  # noqa: E402


def _stage_list(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway
    seq = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = []
    it = seq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


FIELDS = (
    ("tasks", "numCompleteTasks"),
    ("exec_run_ms", "executorRunTime"),
    ("shuffle_read_b", "shuffleReadBytes"),
    ("shuffle_write_b", "shuffleWriteBytes"),
    ("input_b", "inputBytes"),
    ("gc_ms", "jvmGcTime"),
)


def profile(spark, qs, names, sf_dir, plans_dir, tag, runs):
    for name in names:  # pre-build every plan (discovery actions)
        qs[name](spark, sf_dir)
    for name in names:
        df = qs[name](spark, sf_dir)
        if plans_dir:
            raw = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            p = Path(plans_dir) / f"{name}_{tag}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(raw)
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df.count()  # warmup
        seen = {s.stageId() for s in _stage_list(spark)}
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.count()
            walls.append(time.perf_counter() - t0)
        stages = []
        for s in _stage_list(spark):
            if s.stageId() in seen:
                continue
            # each timed run materializes its own stage objects, so a
            # stage row is already per-run — report raw values
            rec = {"stage_id": s.stageId(), "name": s.name()[:80]}
            for key, attr in FIELDS:
                rec[key] = int(getattr(s, attr)())
            stages.append(rec)
        stages.sort(key=lambda r: -r["exec_run_ms"])
        print(json.dumps({
            "query": name,
            "wall_median": round(sorted(walls)[len(walls) // 2], 4),
            "wall_all": [round(w, 4) for w in walls],
            "stages": stages[:12],
            "n_stages": len(stages),
        }), flush=True)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and not args[0].startswith("--") else "/root/testdata/sf0.1"
    plans_dir, tag, runs = None, "before", 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans-dir":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    from bench import BENCH_QUERIES
    from bgpexplorer_spark.contract import all_queries

    qs = all_queries()
    if not names:
        names = list(BENCH_QUERIES)
    spark = get_spark("profile")
    spark.range(1).count()
    profile(spark, qs, names, sf_dir, plans_dir, tag, runs)
    spark.stop()


if __name__ == "__main__":
    main()

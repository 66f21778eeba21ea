"""Plan fingerprints for the bench query set.

Round-4 postmortem: bench wall-times drifted ~1.3x with byte-identical
operator code, and nothing could say whether the *plans* had changed
(Spark upgrade, stats drift, config change) or only the machine was
busy. This pins each bench query's pre-execution physical plan — the
AdaptiveSparkPlan initial plan at sf0.001 — as a normalized hash, so a
plan change fails `tests/test_plan_fingerprints.py` loudly and
wall-clock drift on matching fingerprints is, by elimination,
environmental.

Regenerate after an INTENTIONAL plan change:

    REGEN_PLAN_FP=1 python -m pytest tests/test_plan_fingerprints.py -q
    (or: python tools/plan_fingerprints.py)

The normalization strips run-varying noise (expression ids, codegen ids,
paths, object addresses, statistics) but keeps operator names, join
strategies, partitioning, and pushed-filter shapes — exactly the things
whose silent change would explain a real slowdown.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

FP_FILE = Path(__file__).resolve().parent / "plan_fingerprints.json"
SF_DIR = "/root/testdata/sf0.001"

_NOISE = [
    (re.compile(r"#\d+[L]?"), "#N"),            # expression ids
    (re.compile(r"\[id=#?\d+\]"), "[id=N]"),    # codegen / exchange ids
    (re.compile(r"plan_id=\d+"), "plan_id=N"),
    (re.compile(r"@[0-9a-fA-F]{6,}"), "@ADDR"),  # JVM object addresses
    (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
    (re.compile(r"(file:)?/[^\s,\]\)]*(testdata|tmp|warehouse|checkpoint)[^\s,\]\)]*"), "<path>"),
    (re.compile(r"ExistingRDD\[[^\]]*\]"), "ExistingRDD[...]"),  # checkpoint RDD lineage
    (re.compile(r", \d+ paths?\b"), ", N paths"),
    (re.compile(r"Location: \S+"), "Location: <loc>"),
]


def normalize_plan(plan: str) -> str:
    for rx, sub in _NOISE:
        plan = rx.sub(sub, plan)
    return plan


def plan_fingerprint(df) -> str:
    """Hash of the normalized pre-execution physical plan (the AQE
    initial plan — deterministic for fixed input stats, unlike the
    post-execution final plan)."""
    raw = df._jdf.queryExecution().executedPlan().toString()
    return hashlib.sha256(normalize_plan(raw).encode()).hexdigest()[:16]


def compute_all(spark, sf_dir: str = SF_DIR) -> dict[str, str]:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import BENCH_QUERIES
    from bgpexplorer_spark.contract import all_queries

    qs = all_queries()
    return {name: plan_fingerprint(qs[name](spark, sf_dir)) for name in BENCH_QUERIES}


def main() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bgpexplorer_spark.session import get_spark

    spark = get_spark("plan_fingerprints")
    fps = compute_all(spark)
    FP_FILE.write_text(json.dumps(fps, indent=2, sort_keys=True) + "\n")
    print(f"wrote {len(fps)} fingerprints to {FP_FILE}")
    spark.stop()


if __name__ == "__main__":
    main()

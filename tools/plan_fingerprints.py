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
# normalized plan TEXTS pinned alongside the hashes, so a fingerprint
# mismatch can be diffed to the exact operator line that moved instead
# of reducing to "hash changed"
FP_TEXTS = Path(__file__).resolve().parent / "plan_fingerprint_texts.json.gz"
SF_DIR = "/root/testdata/sf0.001"


def write_pins(plans: "dict[str, str]") -> None:
    import gzip

    fps = {
        name: hashlib.sha256(p.encode()).hexdigest()[:16]
        for name, p in plans.items()
    }
    FP_FILE.write_text(json.dumps(fps, indent=2, sort_keys=True) + "\n")
    FP_TEXTS.write_bytes(
        gzip.compress(json.dumps(plans, sort_keys=True).encode(), mtime=0)
    )


def read_pinned_texts() -> "dict[str, str]":
    import gzip

    if not FP_TEXTS.exists():
        return {}
    return json.loads(gzip.decompress(FP_TEXTS.read_bytes()))

_NOISE = [
    # lambda variables (higher-order functions) carry a session-global
    # monotonically-increasing counter IN THE NAME (lambda x_7), not
    # just in the expr id — normalize before the #id pass
    (re.compile(r"(lambda [a-zA-Z]+)_\d+"), r"\1_L"),
    (re.compile(r"#\d+[L]?"), "#N"),            # expression ids
    # FileScan truncates DataFilters at a fixed RAW width, so the cut
    # point shifts with expression-id digit counts; the full predicate
    # is covered by the Filter node + PushedFilters anyway
    (re.compile(r"DataFilters: \[.*?(?=, Format:)"), "DataFilters: <df>"),
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


def compute_plans(spark, sf_dir: str = SF_DIR) -> "dict[str, str]":
    """Normalized pre-execution plan TEXT per bench query."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import BENCH_QUERIES
    from bgpexplorer_spark.contract import all_queries

    # The CacheManager substitutes InMemoryTableScan into any plan whose
    # logical subtree matches a persisted one, so the fingerprint would
    # depend on whatever the session cached before this call (e.g. other
    # tests in a shared pytest session). Clear it: fingerprints are then
    # a pure function of (code, input schema) in BENCH_QUERIES order —
    # persists registered by earlier queries IN this loop are part of
    # that deterministic order.
    spark.catalog.clearCache()
    qs = all_queries()
    return {
        name: normalize_plan(
            qs[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for name in BENCH_QUERIES
    }


def compute_all(spark, sf_dir: str = SF_DIR) -> dict[str, str]:
    return {
        name: hashlib.sha256(plan.encode()).hexdigest()[:16]
        for name, plan in compute_plans(spark, sf_dir).items()
    }


def main() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bgpexplorer_spark.session import get_spark

    # cpus=4 — MUST match tests/conftest.py's session: shuffle-partition
    # counts are printed inside Exchange hashpartitioning(..., N) nodes,
    # so a script run on a 32-core box would pin a 32-partition flavor
    # that the 8-partition pytest gate then rejects wholesale (r11: a
    # roundclose regen flipped ALL 55 pins; the only real diff was 8→32)
    spark = get_spark("plan_fingerprints", cpus=4)
    plans = compute_plans(spark)
    write_pins(plans)
    print(f"wrote {len(plans)} fingerprints to {FP_FILE} (+texts)")
    spark.stop()


if __name__ == "__main__":
    main()

"""Pin the bench queries' physical plans (SURVEY §4 enforcement).

Any plan change — join strategy flip, lost pushdown, new shuffle — fails
here loudly instead of surfacing as a mystery wall-clock drift in the
next round's BENCH comparison. After an INTENTIONAL plan change:

    REGEN_PLAN_FP=1 python -m pytest tests/test_plan_fingerprints.py -q
"""

from __future__ import annotations

import json
import os

import pytest

from tools.plan_fingerprints import (
    FP_FILE,
    SF_DIR,
    compute_plans,
    read_pinned_texts,
    write_pins,
)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_bench_plan_fingerprints(spark):
    plans = compute_plans(spark, SF_DIR)
    if os.environ.get("REGEN_PLAN_FP") == "1" or not FP_FILE.exists():
        write_pins(plans)
        pytest.skip(f"regenerated {len(plans)} fingerprints")
    pinned = json.loads(FP_FILE.read_text())
    pinned_texts = read_pinned_texts()
    import hashlib

    changed = sorted(
        name
        for name, p in plans.items()
        if pinned.get(name) != hashlib.sha256(p.encode()).hexdigest()[:16]
    )
    if changed:
        # write per-query unified diffs so the failure names the exact
        # operator line that moved, not just "hash changed"
        import difflib
        import pathlib

        dump = pathlib.Path("/tmp/plan_fp_diffs")
        dump.mkdir(exist_ok=True)
        for name in changed:
            diff = "\n".join(
                difflib.unified_diff(
                    pinned_texts.get(name, "").splitlines(),
                    plans[name].splitlines(),
                    "pinned", "current", lineterm="",
                )
            )
            (dump / f"{name}.diff").write_text(diff + "\n")
        raise AssertionError(
            "physical plan changed for: " + ", ".join(changed)
            + f" — diffs in /tmp/plan_fp_diffs/; if intentional, "
            "regenerate with REGEN_PLAN_FP=1"
        )

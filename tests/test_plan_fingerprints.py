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

from tools.plan_fingerprints import FP_FILE, SF_DIR, compute_all


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_bench_plan_fingerprints(spark):
    current = compute_all(spark, SF_DIR)
    if os.environ.get("REGEN_PLAN_FP") == "1" or not FP_FILE.exists():
        FP_FILE.write_text(json.dumps(current, indent=2, sort_keys=True) + "\n")
        pytest.skip(f"regenerated {len(current)} fingerprints")
    pinned = json.loads(FP_FILE.read_text())
    changed = {
        name: (pinned.get(name), fp)
        for name, fp in current.items()
        if pinned.get(name) != fp
    }
    assert not changed, (
        "physical plan changed for: "
        + ", ".join(sorted(changed))
        + " — if intentional, regenerate with REGEN_PLAN_FP=1"
    )

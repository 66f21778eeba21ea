"""The committed SELFCHECK log must certify the CURRENT contract.

Round 7 shipped a 179/179 log one commit before a 180th query landed —
the driver happened to sample the new query, but the committed
certificate was stale at HEAD. This test makes that drift impossible to
ship silently: the newest ``SELFCHECK_r*.log`` at the repo root must
contain one ``<name>: OK`` row for EXACTLY the declared query set. When
it fails, regenerate the log in the same commit that adds/renames a
query::

    python tools/selfcheck.py /root/testdata/sf0.01   # then rewrite the log
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
_ROW = re.compile(r"^([A-Za-z0-9_]+): (OK|FAIL)", re.MULTILINE)


def _latest_log() -> Path:
    logs = sorted(
        ROOT.glob("SELFCHECK_r*.log"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert logs, "no committed SELFCHECK_r*.log at the repo root"
    return logs[-1]


def test_selfcheck_log_matches_declared_queries():
    from bgpexplorer_spark.contract import QUERIES

    log = _latest_log()
    rows = _ROW.findall(log.read_text())
    names = [n for n, _ in rows]
    assert len(names) == len(set(names)), f"duplicate rows in {log.name}"
    missing = set(QUERIES) - set(names)
    extra = set(names) - set(QUERIES)
    assert not missing and not extra, (
        f"{log.name} is stale vs contract.QUERIES — regenerate it in the "
        f"same commit (missing={sorted(missing)}, extra={sorted(extra)})"
    )
    bad = [n for n, status in rows if status != "OK"]
    assert not bad, f"{log.name} certifies failing rows: {bad}"

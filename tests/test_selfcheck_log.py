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

import importlib.util
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
_ROW = re.compile(r"^([A-Za-z0-9_]+): (OK|FAIL)", re.MULTILINE)
_DIGEST = re.compile(r"^ENGINE-DIGEST: ([0-9a-f]{32})", re.MULTILINE)


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


def test_selfcheck_log_matches_engine_state():
    """The certificate must be tied to the ENGINE STATE it was produced
    from, not just the query set: the log's ENGINE-DIGEST header (written
    by tools/selfcheck.py over every engine .py + plan fingerprints) must
    match the working tree. An operator rewrite after the log refresh
    fails here until the log is regenerated — round 8's log predated the
    final paragraph-dedup rewrite by 6 minutes and the query-set gate
    couldn't see it."""
    spec = importlib.util.spec_from_file_location(
        "selfcheck_mod", ROOT / "tools" / "selfcheck.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    log = _latest_log()
    m = _DIGEST.search(log.read_text())
    assert m, (
        f"{log.name} has no ENGINE-DIGEST header — regenerate it with the "
        "current tools/selfcheck.py"
    )
    current = mod.engine_digest()
    assert m.group(1) == current, (
        f"{log.name} was generated from a DIFFERENT engine state "
        f"(log {m.group(1)}, working tree {current}) — an engine edit "
        "landed after the log refresh; regenerate the log at HEAD"
    )

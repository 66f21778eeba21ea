"""Snapshot lifecycle daemon — the reference's ``snapshot_file`` /
``snapshot_every`` behavior (src/config.rs:471-483; load-on-start with
warn-and-fresh on error src/bgpsvc.rs:200-209; periodic store during
update processing src/bgprib.rs:886-890; store-on-shutdown
src/bgprib.rs:925-927), wired to this engine's native snapshot form.

The native snapshot here is the distributed parquet table
(``operators/rib.write_snapshot`` — partitioned, sorted, bloom-filtered),
the Spark analog of the reference's own CBOR file; a recurring
driver-side CBOR collect would not scale, so ``tools/export_snapshot``
stays the one-shot migration-interchange path.

Layout under ``path``: versioned subdirectories ``v<millis>`` plus a
``CURRENT`` marker file naming the live one — parquet directory writes
are not atomic, so the marker flip is the commit point (readers and a
crashed writer never see a half-written snapshot), mirroring the
reference's write-then-rename. One previous version is kept, older ones
are pruned.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
import time
import warnings

from pyspark.sql import DataFrame, SparkSession

_MARKER = "CURRENT"


def load_snapshot_dir(spark: SparkSession, path: str) -> DataFrame | None:
    """Bootstrap history from a SnapshotKeeper directory. Missing dir,
    missing/garbled marker, or an unreadable snapshot → warn and return
    None (start fresh), the reference's load_snapshot error posture."""
    from bgpexplorer_spark.operators.rib import read_snapshot

    marker = os.path.join(path, _MARKER)
    try:
        with open(marker, encoding="ascii") as f:
            current = f.read().strip()
        # confine to the generated shape ('v<epoch>'): a tampered or
        # garbled marker ('..', absolute paths) must not escape `path`
        if not re.fullmatch(r"v\d+", current):
            raise ValueError(f"bad snapshot marker {current!r}")
        return read_snapshot(spark, os.path.join(path, current))
    except Exception as e:  # noqa: BLE001 — any load error means fresh start
        if os.path.exists(path):
            warnings.warn(f"Error loading snapshot: {e}", stacklevel=2)
        return None


class SnapshotKeeper:
    """Periodic + on-stop snapshot writer.

    ``get_history`` is called at each save and must return the history
    DataFrame to persist (a closure over the service's live table, so
    each save sees current state). Save errors warn and the daemon keeps
    running — one failed save must not kill ingest (reference
    store_snapshot warn, src/bgprib.rs:888-890,925-927).
    """

    def __init__(self, get_history, path: str, every_sec: int = 43200):
        self._get_history = get_history
        self.path = path
        self.every_sec = every_sec
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # serializes saves: stop()'s final store must never race a
        # still-running periodic save on the marker flip
        self._save_lock = threading.Lock()

    def save_once(self) -> str | None:
        """Write one snapshot version and flip the marker; returns the
        new version's directory (None on error, after a warning)."""
        from bgpexplorer_spark.operators.rib import write_snapshot

        with self._save_lock:
            try:
                version = f"v{int(time.time() * 1000)}"
                vdir = os.path.join(self.path, version)
                os.makedirs(self.path, exist_ok=True)
                write_snapshot(self._get_history(), vdir)
                marker = os.path.join(self.path, _MARKER)
                prev = None
                try:
                    with open(marker, encoding="ascii") as f:
                        prev = f.read().strip()
                except OSError:
                    pass
                tmp = f"{marker}.part-{version}"
                with open(tmp, "w", encoding="ascii") as f:
                    f.write(version)
                os.replace(tmp, marker)  # the commit point
                self._prune(keep=(version, prev))
                return vdir
            except Exception as e:  # noqa: BLE001
                warnings.warn(f"store_snapshot error: {e}", stacklevel=2)
                return None

    def _prune(self, keep: tuple) -> None:
        """Drop every version dir except the marker's current and its
        COMMITTED predecessor. Keeping by marker lineage (not by
        lexicographic recency) means a partial dir left by a failed
        write is pruned, never retained in place of the last good
        snapshot."""
        try:
            versions = [
                d for d in os.listdir(self.path)
                if d.startswith("v") and d[1:].isdigit()
            ]
        except OSError:
            return
        survivors = {k for k in keep if k}
        for d in versions:
            if d not in survivors:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _run(self) -> None:
        while not self._stop.wait(self.every_sec):
            self.save_once()

    def start(self) -> "SnapshotKeeper":
        if self._thread is None:
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._run, name="snapshot-keeper", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        """Stop the cadence and write the final snapshot (the
        reference's store-on-shutdown). A still-running periodic save
        can't race the final one — saves serialize on ``_save_lock`` and
        the final save runs last, so CURRENT ends at shutdown state."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=300)
            self._thread = None
        self.save_once()

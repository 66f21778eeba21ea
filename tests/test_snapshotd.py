"""Snapshot lifecycle daemon (reference snapshot_file/snapshot_every:
load-on-start, periodic store, store-on-stop — src/bgpsvc.rs:200-209,
src/bgprib.rs:886-927) over the engine's native parquet snapshot."""

from __future__ import annotations

import os
import time

import pytest

from bgpexplorer_spark.operators.ingest import build_history
from bgpexplorer_spark.snapshotd import SnapshotKeeper, load_snapshot_dir
from tests.ribdata import make_updates, u


def _hist(spark, n=4, t0=0):
    return build_history(make_updates(spark, [
        u(f"10.0.{i}.0/24", t=t0 + i, aspath=[("Seq", [65001, 100 + i])])
        for i in range(n)
    ]))


def test_save_load_roundtrip_and_marker_commit(spark, tmp_path):
    snap = str(tmp_path / "snap")
    hist = _hist(spark)
    keeper = SnapshotKeeper(lambda: hist, snap, every_sec=3600)
    vdir = keeper.save_once()
    assert vdir and os.path.isdir(vdir)
    assert (tmp_path / "snap" / "CURRENT").read_text() == os.path.basename(vdir)

    back = load_snapshot_dir(spark, snap)
    cols = ["rib", "nlri_str", "ts", "active", "aspath"]
    assert sorted(map(repr, back.select(cols).collect())) == sorted(
        map(repr, hist.select(cols).collect())
    )


def test_versions_pruned_marker_tracks_latest(spark, tmp_path):
    snap = str(tmp_path / "snap")
    hist = _hist(spark)
    keeper = SnapshotKeeper(lambda: hist, snap, every_sec=3600)
    dirs = [os.path.basename(keeper.save_once()) for _ in range(4)]
    versions = sorted(d for d in os.listdir(snap) if d.startswith("v"))
    assert len(versions) <= 2 and dirs[-1] in versions  # latest + 1 prior
    assert (tmp_path / "snap" / "CURRENT").read_text() == dirs[-1]


def test_load_missing_or_garbled_starts_fresh(spark, tmp_path):
    # missing dir: silent None
    assert load_snapshot_dir(spark, str(tmp_path / "nope")) is None
    # garbled marker: warn + None (the reference's warn-and-fresh)
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "CURRENT").write_text("../escape")
    with pytest.warns(UserWarning, match="Error loading snapshot"):
        assert load_snapshot_dir(spark, str(snap)) is None
    # marker pointing at a missing version: warn + None
    (snap / "CURRENT").write_text("v123")
    with pytest.warns(UserWarning, match="Error loading snapshot"):
        assert load_snapshot_dir(spark, str(snap)) is None
    # '..' has no separator but escapes `path` — must be rejected by the
    # v<digits> shape check, not read from the parent directory
    for bad in ("..", ".", "v12x", "xv12", "~root", "v"):
        (snap / "CURRENT").write_text(bad)
        with pytest.warns(UserWarning, match="bad snapshot marker"):
            assert load_snapshot_dir(spark, str(snap)) is None


def test_periodic_and_stop_saves(spark, tmp_path):
    """The cadence thread saves on its interval; stop() writes the final
    snapshot (store-on-shutdown) with the CURRENT state."""
    snap = str(tmp_path / "snap")
    state = {"hist": _hist(spark, n=2)}
    keeper = SnapshotKeeper(lambda: state["hist"], snap, every_sec=1)
    keeper.start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not os.path.exists(
            os.path.join(snap, "CURRENT")
        ):
            time.sleep(0.2)
        assert os.path.exists(os.path.join(snap, "CURRENT"))
    finally:
        state["hist"] = _hist(spark, n=5)  # state grew before shutdown
        keeper.stop()
    back = load_snapshot_dir(spark, snap)
    assert back.count() == 5  # the stop() save captured the newest state


def test_config_wires_keeper(spark, tmp_path):
    from bgpexplorer_spark.config import from_inifile, start_snapshot_keeper

    ini = tmp_path / "a.ini"
    snap = tmp_path / "snap"
    ini.write_text(
        f"[main]\nsnapshot={snap}\nsnapshot_every=3600\n"
    )
    cfg = from_inifile(str(ini))
    assert cfg.snapshot_file == str(snap) and cfg.snapshot_every == 3600
    hist = _hist(spark)
    keeper = start_snapshot_keeper(cfg, lambda: hist)
    try:
        assert keeper is not None and keeper.every_sec == 3600
    finally:
        keeper.stop()
    assert load_snapshot_dir(spark, str(snap)).count() == 4

    # no snapshot key -> no keeper
    ini2 = tmp_path / "b.ini"
    ini2.write_text("[main]\n")
    assert start_snapshot_keeper(from_inifile(str(ini2)), lambda: hist) is None

"""Clean re-measure of the streaming state paths + the idempotency tax.

Round 8 added durable-state lineage tracking to
``run_flap_damping_incremental`` (epoch-guarded replay protection:
per-batch parquet state persist + a _LINEAGE file). The round-8 bench
read ~1.4x lower across ALL streaming paths (environment-shaped), which
left the MARGINAL cost of that addition unquantified — and the headline
bench never exercises it at all (it passes ``state_dir=None``).

This tool isolates the question:

1. re-runs the four bench streaming paths exactly as bench.py does
   (same marginal Δevents/Δsec construction), for a quiet-machine
   baseline refresh, and
2. drives the incremental damping fold over N forced micro-batches
   (maxFilesPerTrigger=1 over N source files) with the durable persist
   OFF (state_dir=None) vs ON (state_dir set), reporting the per-batch
   and relative overhead of the lineage persist.

Usage::

    python tools/measure_streaming.py [SF_DIR] [N_BATCHES]

Prints one JSON document. Results belong in ARCHITECTURE.md's streaming
section; re-run on a quiet machine.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_persist_tax(spark, sf_dir: str, n_batches: int = 8) -> dict:
    """Per-batch cost of the durable persist (parquet state + _LINEAGE)
    in run_flap_damping_incremental: same N-micro-batch drive with
    state_dir unset vs set; the difference / n_batches is the tax."""
    from pyspark.sql import functions as F

    from bgpexplorer_spark.contract import derived_updates
    from bgpexplorer_spark.schemas import UPDATES_SCHEMA
    from bgpexplorer_spark.streaming.feed import run_flap_damping_incremental

    src = tempfile.mkdtemp(prefix="ms_updates_")
    base = derived_updates(spark, sf_dir)
    # N equal event files -> N micro-batches under maxFilesPerTrigger=1
    for i in range(n_batches):
        (
            base.filter(F.pmod(F.xxhash64("nlri_str", "ts"), F.lit(n_batches)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
    n_events = spark.read.parquet(src).count()

    def drive(state_dir: str | None) -> float:
        ck = tempfile.mkdtemp(prefix="ms_ck_")
        stream = (
            spark.readStream.schema(UPDATES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        run_flap_damping_incremental(stream, ck, state_dir=state_dir).awaitTermination()
        dt = time.perf_counter() - t0
        shutil.rmtree(ck, ignore_errors=True)
        return dt

    out: dict = {"events": n_events, "n_batches": n_batches}
    try:
        # interleave OFF/ON runs so machine drift hits both arms equally
        offs, ons = [], []
        for _ in range(3):
            offs.append(drive(None))
            sd = tempfile.mkdtemp(prefix="ms_state_")
            ons.append(drive(sd))
            shutil.rmtree(sd, ignore_errors=True)
        t_off, t_on = min(offs), min(ons)
        out["persist_off_sec"] = round(t_off, 4)
        out["persist_on_sec"] = round(t_on, 4)
        out["persist_off_runs"] = [round(x, 4) for x in offs]
        out["persist_on_runs"] = [round(x, 4) for x in ons]
        out["tax_sec_per_batch"] = round((t_on - t_off) / n_batches, 4)
        out["tax_pct"] = round(100.0 * (t_on - t_off) / t_off, 1)
        out["events_per_sec_off"] = round(n_events / t_off)
        out["events_per_sec_on"] = round(n_events / t_on)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import bench

    spark = bench.get_spark("measure-streaming")
    spark.range(1).count()
    load0 = os.getloadavg()
    out = {
        "sf_dir": sf_dir,
        "bench_streaming": bench._bench_streaming(spark, sf_dir),
        "persist_tax": measure_persist_tax(spark, sf_dir, n_batches),
        "loadavg": [round(x, 2) for x in (*load0, *os.getloadavg())],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Mimic the driver's t2 gate locally: run every queries() entry in Spark
AND its oracle_sql() in DuckDB on the same parquet, compare row count +
column names + order-insensitive value multiset.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bgpexplorer_spark.session import get_spark  # noqa: E402

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        try:
            return v.isoformat(sep=" ")
        except TypeError:  # datetime.date takes no sep
            return v.isoformat()
    return str(v)

def hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest(), lines

def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark("selfcheck", cpus=8)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        if name not in osql:
            print(f"{name}: rows-only (no oracle) spark_rows={len(srows)}")
            continue
        try:
            ores = con.execute(osql[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh, slines = hash_rows(scols, [tuple(r) for r in srows])
        oh, olines = hash_rows(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} cols={'OK' if ok_cols else (scols, ocols)} hash={'OK' if ok_hash else 'DIFF'}")
        if status != "OK":
            fails.append(name)
            sset, oset = set(slines), set(olines)
            for x in list(sorted(sset - oset))[:3]:
                print(f"   spark-only: {x[:160]}")
            for x in list(sorted(oset - sset))[:3]:
                print(f"   duck-only:  {x[:160]}")
    spark.stop()
    print(f"\n{'ALL OK' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()

"""Join strategies for the shapes Catalyst doesn't pick automatically
(SURVEY.md §4 scale posture): bucketed co-location and skew salting.

- :func:`write_bucketed` / :func:`read_bucketed` — materialize a table
  bucketed (and sorted) on its join key. Two tables bucketed the same
  way join with ZERO Exchange: at 100 TB that deletes the single most
  expensive stage of a fact-fact join (both full-table shuffles). The
  parquet layout is the co-location; it survives restarts and is shared
  by every downstream job (plan-asserted in tests/test_scale_plans.py).
- :func:`salted_join` — when one join key is pathologically hot (the
  default-route prefix, an empty-text dedup bucket), AQE's skew split
  helps readers but a *deterministic* salt bounds the worst task ahead
  of time: the big side spreads each key over ``salt`` subkeys, the
  small side replicates ``salt``x. Result-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int = 32,
    key: list[str] | str = "nlri_str",
    sort: bool = True,
) -> None:
    """Materialize ``df`` as an external parquet table hash-bucketed (and
    in-bucket sorted) on ``key``. Joins/aggregations on the bucket key
    read the layout instead of shuffling; the bucket count is the join
    parallelism, so size it to the cluster (32 here mirrors local[32])."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").option("path", path)
    w = w.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(name)

def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """The bucketed table — metastore-backed so Catalyst knows the
    layout (a bare ``spark.read.parquet`` of the same files would NOT
    see the bucketing and would shuffle anyway)."""
    return spark.table(name)

def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the big side gets a deterministic subkey
    (hash of the whole row mod ``salt``), the small side is replicated
    ``salt``x, and the join runs on (key..., _salt) — a hot key's rows
    land in ``salt`` tasks instead of one. Multiset-identical to
    ``big.join(small, on, how)`` for inner/left joins (the salt column
    never leaves this function). Replication costs |small| x salt rows:
    use for genuinely small-but-unbroadcastable sides or pre-aggregated
    dimensions."""
    keys = [on] if isinstance(on, str) else list(on)
    bigs = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(salt)).cast(
            "int"
        ),
    )
    smalls = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)]))
    )
    return bigs.join(smalls, keys + ["_salt"], how).drop("_salt")

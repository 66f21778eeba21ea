"""Similarity search over embedding columns (BASELINE.json north star):
brute-force cosine top-k baseline + hyperplane-LSH bucketing as the scale
path. Dot products are built-in higher-order functions (zip_with +
aggregate) — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))

def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

def py_norm(vec: list[float]) -> float:
    """Driver-side ‖vec‖ with the EXACT float sequence of :func:`norm`
    (ascending-index ``acc + x*x`` fold, then sqrt — Python floats are
    IEEE doubles and each op is correctly rounded, so the result is
    bit-identical to the Spark fold). Used to hoist the norm of a
    LITERAL vector (query vector, inlined centroid) out of per-row
    expressions: ``norm`` over a literal array is NOT constant-folded
    (lambda-bearing HOFs are never foldable), so without the hoist every
    row re-runs the O(dim) interpreted fold per literal vector (r11
    "Not yet optimized": 8× per row at the ivf bench config).
    Verified bit-equal at sf0.1 AND sf1 (exceptAll both directions on
    raw doubles, r12)."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + x * x
    return math.sqrt(acc)

def _z0(c: Column) -> Column:
    """Normalize the IEEE signed zero after rounding: ``x + 0.0`` maps
    -0.0 to +0.0 and changes nothing else (NULL stays NULL). DuckDB's
    round() keeps the sign of a tiny negative (-0.00004 -> -0.0) while
    Spark's BigDecimal HALF_UP emits +0.0 — EQUAL values whose
    different bit patterns hash differently in the driver's Arrow
    comparator. Found by the zipf alternate-fixture selfcheck sweep
    (sim_rp_project, 2 of 3200 components); applied to every EMITTED
    rounded column that can land in (-5e-5, 0], with the matching
    ``+ 0.0`` in the oracles. Internal-only rounds (rank windows,
    integer grids) are unaffected: -0.0 orders and casts like 0.0."""
    return c + F.lit(0.0)

def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector — the
    exact baseline (one scan, one TakeOrdered; no shuffle beyond top-k).
    The query's norm is a constant: computed driver-side (:func:`py_norm`,
    bit-equal to the fold) instead of re-folding the literal array per
    row; ``dot/(norm(v)·lit)`` keeps :func:`cosine`'s operation order,
    so scores are bit-identical."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    score = dot(v, q) / (norm(v) * F.lit(py_norm([float(x) for x in query_vec])))
    return (
        df.select(
            F.col(id_col),
            _z0(F.round(score, 4)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )

def cosine_topk_gemm(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k via Arrow-batched numpy GEMM — the
    AT-SCALE exact path. Same result contract as :func:`cosine_topk`
    (round-4 cosine via Spark's F.round so rounding semantics match the
    HOF path and the SQL oracle exactly, ties by id), different
    execution: each Arrow batch becomes one (batch × d) matrix-vector
    product in BLAS instead of a per-row higher-order-function fold, and
    only each batch's top-k rows (plus a rounding-quantum boundary
    margin) survive to the final TakeOrdered. At a billion vectors the scan is embarrassingly
    parallel, the driver sees partitions × k candidate rows, and the
    arithmetic runs at memory bandwidth. Zero-norm vectors are EXCLUDED
    (cosine undefined) — stricter than the HOF path, which raises under
    ANSI division-by-zero."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (m @ qn) / norms
            # Emit UNROUNDED cosines and round in Spark: F.round's
            # HALF_UP-on-shortest-repr matches the DuckDB oracle, while
            # np.round is half-to-even on the fp-scaled value — a
            # 4th-decimal halfway case would diverge. Prune each batch to
            # its k best plus a 2e-4 boundary margin: any row the final
            # (rounded desc, id) order could still rank above the k-th
            # kept row lies within one rounding quantum of it, so the
            # margin makes local pruning exact under the global order.
            finite = np.isfinite(cos)
            idx = np.nonzero(finite)[0]
            ids = pdf[id_col].to_numpy()[idx]
            vals = cos[idx]
            if len(idx) > k:
                kth = np.partition(vals, len(vals) - k)[len(vals) - k]
                keep = vals >= kth - 2e-4
                ids, vals = ids[keep], vals[keep]
            yield pd.DataFrame({id_col: ids, "cos_sim": vals})

    return (
        df.select(id_col, vec_col)
        .mapInPandas(batches, f"{id_col} long, cos_sim double")
        .select(id_col, _z0(F.round("cos_sim", 4)).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _plane_coef(i: Column, j: int) -> Column:
    """Deterministic pseudo-random hyperplane coefficient for dim i of
    plane j: a Knuth multiplicative scramble of (i + 64·j) reduced
    mod 97, centered — ∈ [-48, 48]. The scramble's j-period is 97
    planes, so every plane up to n_planes=97 is a DISTINCT hyperplane.
    (The first construction, ((i·31 + j·17) mod 7) − 3, had period 7 in
    j — 31 ≡ 17 ≡ 3 (mod 7) makes the coefficient depend only on
    (i+j) mod 7, so plane j+7 was bit-identical to plane j and the
    bucket space silently capped at 2^7 patterns no matter how many
    planes the caller asked for — found by review in r10 after the
    adaptive-planes recipe asked for 12.) All intermediates stay far
    below 2^53, so the DuckDB oracle replays the arithmetic exactly."""
    return (
        ((i + F.lit(64 * j)) * 2654435761 % 97 - F.lit(48))
    ).cast("double")

def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH: sign bit per plane → integer bucket id.
    Vectors in the same bucket are ANN candidates; cosine-verify within.

    The plane coefficients are DETERMINISTIC (_plane_coef's arithmetic)
    — evaluate them in Python and inline each plane as a LITERAL double
    array, so the projection is one zip_with product + ascending-i fold
    (the rp_project lesson, r11: re-deriving the coefficient inside the
    lambda is interpreted per ELEMENT and dominated sim_knn_capped at
    sf10 — 92.8 s, ratio ~14, vs the literal form below; same float
    sequence, bit-identical buckets, constant plan size)."""
    bucket = F.lit(0).cast("bigint")
    for j in range(n_planes):
        coefs = F.array(*[
            F.lit(float((i + 64 * j) * 2654435761 % 97 - 48))
            for i in range(dim)
        ])
        proj = F.aggregate(
            F.zip_with(vec, coefs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket

def ann_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the scan to buckets within
    ``probe_hamming`` of the query's bucket, then exact cosine. At scale
    the bucket column is a partition/sort key so non-matching buckets are
    skipped entirely."""
    import math

    dim = len(query_vec)
    qb = 0
    for j in range(n_planes):
        proj = sum(
            query_vec[i] * (((i + 64 * j) * 2654435761 % 97) - 48)
            for i in range(dim)
        )
        if proj >= 0:
            qb |= 1 << j
    probe = [qb]
    if probe_hamming >= 1:
        probe += [qb ^ (1 << j) for j in range(n_planes)]
    bucketed = df.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), n_planes, dim))
    return cosine_topk(
        bucketed.filter(F.col("_bucket").isin(probe)), query_vec, k, id_col, vec_col
    )

# Broadcast the over-cap bucket list only while it provably fits a few MB
# of hashed relation; above this many rows the anti-join falls back to a
# merge-pinned shuffle (never-broadcast-corpus-derived rule).
_SHED_BROADCAST_ROW_BOUND = 65536


def _shed_mega_buckets(
    b: DataFrame, max_bucket: int, bucket_col: str = "_bucket",
    approx_n: int | None = None,
) -> DataFrame:
    """Drop rows of LSH buckets holding more than ``max_bucket`` vectors
    — the embedding-side mega-bucket shed. Real embedding spaces cluster
    HARD (anisotropy: most vectors share a dominant direction, so
    hyperplane sign patterns correlate and occupancy is far more skewed
    than the 2^planes uniform ideal — the sf0.01 synthetic already puts
    9.2% of vectors in one of its 2^6 buckets). A mega-bucket's in-bucket
    self-join grows quadratically in its size, so at 100 TB the cap
    bounds the candidate join at buckets × cap² — the same lever, same
    anti-join shape as dedup.lsh_buckets(max_bucket=…); never a
    count().over() occupancy window, which would sort every
    bucket-membership row.

    Anti-join side strategy: the over-cap list has at most
    n/(cap+1) rows (each entry represents > cap vectors) — "tiny" only
    relative to the corpus. Under the ADAPTIVE plane recipe
    (2^planes ≈ n/cap, mean occupancy ≈ cap) a constant FRACTION of
    buckets sits over cap, so the list grows Θ(n/cap): a forced
    broadcast would contradict the never-broadcast-corpus-derived rule
    at exactly the scales the recipe targets (r10 review). Callers
    that know the corpus size pass ``approx_n``; the broadcast is kept
    only while the n/(cap+1) bound stays under
    ``_SHED_BROADCAST_ROW_BOUND`` rows, else the anti-join is pinned to
    a shuffled merge join. ``approx_n=None`` (legacy callers) keeps the
    broadcast and is only sound for FIXED n_planes, where the list is
    bounded by 2^planes regardless of corpus size.

    Recall trade (DOCUMENTED, oracle-verified in sim_knn_capped): a
    single-band vector in a shed bucket emits no edges — the same
    residue class as singleton buckets; callers wanting guaranteed
    degree re-run that residue through :func:`knn_residue_scores`
    (driver-verified in sim_knn_complete), and dense near-identical
    clusters are what :func:`semantic_dedup` collapses more cheaply
    anyway."""
    over = (
        b.groupBy(bucket_col)
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") > max_bucket)
        .select(bucket_col)
    )
    small = approx_n is None or (
        approx_n // (max_bucket + 1) <= _SHED_BROADCAST_ROW_BOUND
    )
    over = F.broadcast(over) if small else over.hint("merge")
    return b.join(over, bucket_col, "left_anti")

def _bucketed_with_norm(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, dim: int,
    max_bucket: int | None, approx_n: int | None,
) -> DataFrame:
    """Shared candidate frame for the in-bucket self-joins: id, the
    double-cast vector ``_v``, its LSH ``_bucket``, and the HOISTED norm
    ``_n`` — computed ONCE per vector before the join instead of once
    per candidate pair (the norm fold is O(dim); inside an in-bucket
    self-join it would otherwise re-run ~occupancy× per vector — the
    dominant cost of sim_knn_* at sf1, r10 review). ``dot/(a._n*b._n)``
    is the same expression tree at the same rounding point as
    :func:`cosine`, so edge sets are bit-identical. Since the r11
    one-exchange candidate builder (:func:`_bucket_vec_pairs`) the
    frame feeds a groupBy, not a self-join, so the old merge hint is
    gone — with no join there is no AQE-broadcast exposure at all."""
    b = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("_bucket", hyperplane_bucket(F.col("_v"), n_planes, dim))
        .withColumn("_n", norm(F.col("_v")))
        # cached: the mega-bucket shed double-consumes this frame (the
        # over-cap aggregate + the anti-join), and the bucket/norm
        # folds are the expensive part of building it
        .cache()
    )
    if max_bucket is not None:
        b = _shed_mega_buckets(b, max_bucket, approx_n=approx_n)
    return b


def embedding_neardup_pairs(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, dim: int = 64,
    max_bucket: int | None = None,
    approx_n: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: cosine
    computed only within buckets (the embedding analog of MinHash+LSH
    dedup). ``max_bucket``: see :func:`_shed_mega_buckets` (default off
    — the exact-banding contract); ``approx_n`` bounds the shed's
    anti-join broadcast."""
    b = _bucketed_with_norm(df, id_col, vec_col, n_planes, dim, max_bucket, approx_n)
    return (
        _bucket_vec_pairs(b, id_col, ordered=True)
        .select(
            F.col("_a.i").alias("id_a"),
            F.col("_b.i").alias("id_b"),
            F.round(
                dot(F.col("_a.v"), F.col("_b.v"))
                / (F.col("_a.n") * F.col("_b.n")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _bucket_vec_pairs(b: DataFrame, id_col: str, ordered: bool) -> DataFrame:
    """ONE-exchange in-bucket candidate builder for the embedding
    family (the dedup._bucket_pair_explode shape generalized to carry
    the vector and its hoisted norm; r11 optimization): aggregate each
    LSH bucket to its (id, vector, norm) member list, then explode the
    pairs — ``ordered`` True yields i < j once (near-dup pairs), False
    yields both directions (per-source kNN edges). The bucketed rows
    cross the wire ONCE through the groupBy exchange; the prior
    merge-pinned self-join shuffled and sorted them twice. With no join
    there is also no AQE-broadcast exposure (the sf10 OOM class the
    merge hints guarded). Occupancy stays bounded by the adaptive plane
    count / ``max_bucket`` shed, so per-bucket lists are small by
    construction."""
    grouped = (
        b.groupBy("_bucket")
        .agg(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col("_v").alias("v"),
                    F.col("_n").alias("n"),
                )
            ).alias("_ms")
        )
        .filter(F.size("_ms") > 1)
    )
    cond = "x.i > _a.i" if ordered else "x.i != _a.i"
    return grouped.select(F.explode("_ms").alias("_a"), "_ms").select(
        "_a", F.explode(F.expr(f"filter(_ms, x -> {cond})")).alias("_b")
    )

def knn_graph(
    df: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, dim: int = 64,
    max_bucket: int | None = None,
    approx_n: int | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over an embedding column —
    the building block SemDeDup, density/diversity sampling, and
    graph-clustering curation recipes all start from: for every vector,
    its k most-similar neighbors among the vectors sharing its LSH
    bucket, with exact cosine scores. Output: (src, dst, cos_sim, rank),
    rank 1 = nearest. Cosines are rounded to 4 decimals BEFORE ranking
    (ties broken by dst id) so the edge set is deterministic and
    engine-reproducible.

    Scale shape: ONE bucket equi-join builds candidates (no all-pairs —
    same bound as :func:`embedding_neardup_pairs`), then one per-source
    top-k window partitioned by src. Fewer planes → denser candidate
    sets and better recall at more compute; callers trade off via
    ``n_planes``. Vectors alone in their bucket emit no edges (callers
    wanting guaranteed degree re-run those through brute-force
    :func:`cosine_topk` — at scale that residue is tiny).

    ``max_bucket`` (default off) is the production lever for skewed
    embedding spaces — see :func:`_shed_mega_buckets`: vectors in shed
    buckets join the no-edge residue at a documented recall cost;
    ``approx_n`` (corpus size, when the caller knows it) bounds the
    shed's anti-join broadcast.
    """
    b = _bucketed_with_norm(df, id_col, vec_col, n_planes, dim, max_bucket, approx_n)
    pairs = (
        _bucket_vec_pairs(b, id_col, ordered=False)
        .select(
            F.col("_a.i").alias("src"),
            F.col("_b.i").alias("dst"),
            _z0(
                F.round(
                    dot(F.col("_a.v"), F.col("_b.v"))
                    / (F.col("_a.n") * F.col("_b.n")),
                    4,
                )
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_density(
    df: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, dim: int = 64,
    max_bucket: int | None = None,
    approx_n: int | None = None,
) -> DataFrame:
    """Per-vector kNN-density score — the outlier/junk signal curation
    recipes threshold on (SemDeDup §3 keeps LOW-similarity items as the
    diverse representatives; noise filters drop the lowest-density
    tail): for each vector, the mean cosine to its ≤k approximate
    nearest neighbors from :func:`knn_graph`. Output: (id, k_found,
    density round 4); vectors with no bucket-mates emit no row (the
    same documented residue as knn_graph — at scale it's tiny and a
    caller can default it to density 0, the most-outlier score).

    Determinism across engines: each edge's cosine is already rounded
    to 4 decimals; the mean is an EXACT integer sum of the 1e4-scaled
    cosines, rounded HALF-UP onto the 1e-4 grid with integer floor
    arithmetic — `floor((10·s/k + 5) / 10)` — so neither
    float-accumulation order nor an engine's halfway-rounding mode
    (Spark HALF_UP vs DuckDB half-even) can flap the last decimal
    against the oracle. (10·s ≤ 5·10⁵ is double-exact, and 10·s/k is
    at least 1/k away from an integer unless exactly integral, so the
    floor is stable.)

    Scale shape: knn_graph's bucket equi-join + per-source window, then
    ONE map-side-combinable aggregate on the source id — nothing new
    touches the corpus."""
    g = knn_graph(
        df, k=k, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, dim=dim, max_bucket=max_bucket,
        approx_n=approx_n,
    )
    return _density_from_edges(g.select("src", "cos_sim"), id_col)


def _density_from_edges(edges: DataFrame, id_col: str) -> DataFrame:
    """(id, k_found, density) from scored edges — the shared exact
    integer half-up mean on the 1e4 grid (see :func:`knn_density`):
    neither float-accumulation order nor an engine's halfway-rounding
    mode can flap the last decimal against the DuckDB oracle."""
    e4 = F.round(F.col("cos_sim") * 10000).cast("bigint")
    agg = edges.groupBy(F.col("src").alias(id_col)).agg(
        F.count(F.lit(1)).alias("k_found"),
        F.sum(e4).alias("_s_e4"),
    )
    mean_e4 = F.floor(
        (F.col("_s_e4") * 10.0 / F.col("k_found") + 5.0) / 10.0
    )
    return agg.select(
        id_col,
        F.col("k_found").cast("int").alias("k_found"),
        (mean_e4 / 10000.0).alias("density"),
    )


def knn_residue_scores(
    df: DataFrame, scored_ids: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_probe: int = 64,
) -> DataFrame:
    """Guaranteed-degree fallback for the bucketed kNN residue — the
    vectors :func:`knn_graph` emits NO edges for (alone in their LSH
    bucket, or shed by ``max_bucket``). At 100 TB that residue of a
    capped, adaptive-plane index is exactly the outlier set a curation
    pipeline most wants scored, so it gets a real score, not a
    documented default: exact brute-force cosine against the ``n_probe``
    lowest-id vectors (the same deterministic, training-free convention
    as :func:`ivf_centroids`), top-k per residue vector, then the same
    exact-integer density mean.

    Scale shape: ``scored_ids`` (corpus-derived, possibly corpus-sized)
    is removed by a merge-pinned LEFT ANTI join — never broadcast; the
    probe frame is bounded by the LITERAL ``n_probe`` (independent of
    corpus size), so IT broadcasts into one nested-loop pass over the
    residue: O(residue × n_probe) with both norms hoisted. Residue
    vectors with no scorable probe partner (self was the only probe)
    emit k_found=0 / density 0.0 — the most-outlier score."""
    residue = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
        .join(scored_ids.select(id_col).hint("merge"), id_col, "left_anti")
        .withColumn("_n", norm(F.col("_v")))
    )
    probe = F.broadcast(
        df.filter(F.col(id_col) < n_probe)
        .select(
            F.col(id_col).alias("_pid"),
            F.col(vec_col).cast("array<double>").alias("_pv"),
        )
        .withColumn("_pn", norm(F.col("_pv")))
    )
    pairs = (
        residue.join(probe, F.col(id_col) != F.col("_pid"))
        .select(
            F.col(id_col).alias("src"),
            F.col("_pid").alias("dst"),
            F.round(
                dot(F.col("_v"), F.col("_pv")) / (F.col("_n") * F.col("_pn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst"))
    topk = pairs.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    scored = _density_from_edges(topk.select("src", "cos_sim"), id_col)
    return (
        residue.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("k_found"), F.lit(0)).cast("int").alias("k_found"),
            F.coalesce(F.col("density"), F.lit(0.0)).alias("density"),
        )
    )


def knn_density_complete(
    df: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 6, dim: int = 64,
    max_bucket: int | None = None,
    approx_n: int | None = None,
    n_probe: int = 64,
) -> DataFrame:
    """kNN density with GUARANTEED coverage: every input vector gets
    exactly one row. Bucket-mates are scored by the capped LSH graph
    (:func:`knn_density` — cheap, candidate-bounded); the no-edge
    residue (singleton + shed buckets) is scored by the bounded
    brute-force probe fallback (:func:`knn_residue_scores`). Output:
    (id, k_found, density, residue) where ``residue`` marks fallback
    rows — a curation pipeline thresholds density and can weight the
    two provenances differently."""
    # cached: consumed twice (the non-residue output rows AND the
    # residue anti-join side) — without the cache the whole bucketed
    # graph would execute twice (same precedent as the dedup family's
    # cached signature frame)
    dens = knn_density(
        df, k=k, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, dim=dim, max_bucket=max_bucket, approx_n=approx_n,
    ).cache()
    fallback = knn_residue_scores(
        df, dens, k=k, id_col=id_col, vec_col=vec_col, n_probe=n_probe
    )
    return dens.withColumn("residue", F.lit(False)).unionByName(
        fallback.withColumn("residue", F.lit(True))
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantizer + probed inverted lists — the classic
# scale path alongside LSH. Centroids are deterministic (the k lowest-id
# vectors) so the index is reproducible across engines without training.
# ---------------------------------------------------------------------------

def ivf_centroids(
    df: DataFrame, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Coarse quantizer: the k lowest-id vectors act as centroids —
    kmeans-free and deterministic (a trained quantizer drops in by
    swapping this function; the assign/probe plumbing is unchanged)."""
    return df.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cvec")
    )

# Above this many centroids/codes, literal inlining would bloat the plan
# (expression-tree size and codegen both scale with it); switch to a
# broadcast of the codebook instead. 1024 literal-inlined 64-d centroids
# is ~0.5 MB of plan — comfortably under codegen limits.
INLINE_CODEBOOK_MAX = 1024


def ivf_assign(
    df: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    keep_vec: bool = False, keep_score: bool = False,
    inline_max: int = INLINE_CODEBOOK_MAX,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(vec_id, cid): each vector assigned to its max-cosine centroid.

    The centroid set is small by construction (a coarse quantizer), so
    up to ``inline_max`` centroids are collected and inlined as LITERAL
    vectors: the assignment becomes a pure map — one cosine per centroid
    per row and a ``greatest`` over the (score, cid) structs — with NO
    row amplification and NO shuffle. (The previous crossJoin+groupBy
    shape amplified every row k× and paid an exchange on vec_id; at
    100 TB that is k× scan + a full shuffle for what a projection can
    do.) Ties break to the highest cid (struct ordering),
    deterministically — identical to max(struct).

    Above ``inline_max`` the codebook is attached as ONE broadcast row
    (array<struct<cid,cvec,cn>>) and the argmax folds over it with
    ``aggregate`` — still no row amplification and no shuffle of the
    corpus, but the plan stays constant-size however many centroids
    there are (the huge-codebook fallback the literal path can't serve).
    Both paths compute the identical (score, cid) maximum.

    Norm hoist (r12, the same discipline as the kNN family's
    ``_bucketed_with_norm``): ``norm(_v)`` is materialized ONCE per row
    in its own Project (``_nv``) instead of re-folding inside every
    centroid's cosine (k× the O(dim) interpreted fold), and each
    centroid's norm is a CONSTANT — :func:`py_norm` on the literal
    path, a per-entry ``cn`` built once into the broadcast codebook on
    the fallback path. ``dot/( _nv · cn )`` keeps :func:`cosine`'s
    operation order (norm(a)·norm(b) product, same division), so
    scores are bit-identical (exceptAll-verified both directions at
    sf0.1 and sf1)."""
    head = centroids.limit(inline_max + 1).collect()
    extra = [F.col(c) for c in (keep_cols or [])]
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"), *extra
    ).select("*", norm(F.col("_v")).alias("_nv"))
    if len(head) <= inline_max:
        cents = sorted((r["cid"], [float(x) for x in r["cvec"]]) for r in head)
        scored = [
            F.struct(
                (
                    dot(F.col("_v"), F.array(*[F.lit(x) for x in cvec]))
                    / (F.col("_nv") * F.lit(py_norm(cvec)))
                ).alias("score"),
                F.lit(cid).cast("bigint").alias("cid"),
            )
            for cid, cvec in cents
        ]
        best = scored[0] if len(scored) == 1 else F.greatest(*scored)
    else:
        carr = centroids.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cid").cast("bigint").alias("cid"),
                        F.col("cvec").cast("array<double>").alias("cvec"),
                        norm(F.col("cvec").cast("array<double>")).alias("cn"),
                    )
                )
            ).alias("_cents")
        )
        v = v.join(F.broadcast(carr))  # 1-row broadcast: no amplification
        # score every centroid ONCE (transform), then lexicographic
        # array_max over (score, cid) structs — identical to the literal
        # path's greatest() semantics (ties to the highest cid), without
        # evaluating the cosine twice per entry the way a when()-fold
        # would (Spark doesn't CSE across lambda branches)
        best = F.array_max(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    (dot(F.col("_v"), c["cvec"]) / (F.col("_nv") * c["cn"])).alias(
                        "score"
                    ),
                    c["cid"].alias("cid"),
                ),
            )
        )
    cols = [F.col(id_col), best.getField("cid").alias("cid")]
    if keep_score:  # the max cosine itself (prototypicality) — free here
        cols.append(best.getField("score").alias("proto_score"))
    if keep_vec:  # still a pure projection — no join to fetch the vector
        cols.append(F.col("_v").alias(vec_col))
    # keep_cols ride the projection too — consumers that need extra row
    # attributes (e.g. a ground-truth label) would otherwise pay a
    # corpus×corpus join just to re-attach them
    cols.extend(F.col(c) for c in (keep_cols or []))
    return v.select(*cols)

def ivf_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, nprobe: int = 2,
    n_centroids: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF search: score only the inverted lists of the ``nprobe``
    centroids closest to the query, exact cosine within. At rest the cid
    is a partition key, so unprobed lists are never scanned.

    ``assigned``: a precomputed (and typically persisted) ivf_assign
    result — the IVF index IS persistent state in any real deployment
    (built once at ingest, stored as the cid partition layout); without
    it every query re-quantizes the whole corpus, which is the index
    BUILD cost, not the query cost."""
    cents = ivf_centroids(df, n_centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probes = (
        cents.select("cid", cosine(F.col("cvec"), q).alias("_qs"))
        .orderBy(F.col("_qs").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    if assigned is None:
        assigned = ivf_assign(df, cents, id_col, vec_col)
    cand = df.join(assigned, id_col).join(F.broadcast(probes), "cid", "left_semi")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)

def write_ivf_index(
    df: DataFrame, path: str, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index AT REST: vectors + their cid, parquet
    partitioned BY cid — the inverted lists become directories, so a
    probed query is partition pruning, not a scan (the 100 TB posture:
    unprobed lists are never opened)."""
    cents = ivf_centroids(df, n_centroids, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    (
        df.join(assigned, id_col)
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(path)
    )

def ivf_topk_at_rest(
    spark, path: str, query_vec: list[float], k: int = 10, nprobe: int = 2,
    n_centroids: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Query the at-rest IVF index: pick the ``nprobe`` nearest centroids
    (tiny job over the centroid vectors), then scan ONLY those cid
    partitions via a literal ``isin`` — Catalyst turns it into
    PartitionFilters, so the scan never touches unprobed lists."""
    idx = spark.read.parquet(path)
    cents = ivf_centroids(idx, n_centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_ids = [
        r["cid"]
        for r in cents.select("cid", cosine(F.col("cvec"), q).alias("_qs"))
        .orderBy(F.col("_qs").desc(), F.col("cid"))
        .limit(nprobe)
        .collect()
    ]
    cand = idx.filter(F.col("cid").isin(probe_ids))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)

def ivf_refine(
    df: DataFrame,
    centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd (k-means) refinement of the coarse quantizer: per iteration,
    assign every vector to its max-cosine centroid (the map-side
    literal-centroid projection of :func:`ivf_assign` — no shuffle, no
    row amplification), then recompute each centroid as the element-wise
    mean of its cluster via posexplode + two map-side-combinable
    aggregates (shuffle volume k x dim per partition, not corpus-sized).
    Empty clusters keep their previous centroid. k x dim stays
    driver-sized by construction (it is a COARSE quantizer), so refined
    centroids re-inline as literals every round — each iteration is one
    job over the corpus, like the reference index builders this mirrors.
    """
    cur = centroids.select("cid", F.col("cvec").cast("array<double>").alias("cvec"))
    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    for _ in range(iters):
        assigned = ivf_assign(df, cur, id_col, vec_col)
        joined = assigned.join(vecs, id_col)
        newc = (
            joined.select("cid", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        keep = cur.join(newc.select("cid"), "cid", "left_anti")
        cur = newc.unionByName(keep)
    return cur


def semantic_dedup(
    df: DataFrame, threshold: float = 0.95, n_clusters: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse-cluster
    the embedding space, call two items semantic duplicates when their
    cosine similarity INSIDE a cluster reaches ``threshold``, close
    duplicate groups transitively, and keep the minimum id per group.

    Scale shape — the paper's observation is that semantic duplicates
    land in the same k-means cell, so the quadratic stage runs per cell,
    never corpus-wide: assignment is a pure projection (literal
    centroids, no shuffle — :func:`ivf_assign`), the pair join shuffles
    once on cid and is bounded by max cell size, and the group closure
    is the same log-round connected-components operator the MinHash
    path uses. A trained k-means quantizer drops in via ``centroids``
    (:func:`ivf_refine`); the default is the deterministic
    lowest-id quantizer, same as the IVF index.

    Returns the full keep-list: (id, cid, component, is_kept) — one row
    per input item; ``is_kept`` marks the group representative."""
    from bgpexplorer_spark.operators.dedup import connected_components

    cents = centroids if centroids is not None else ivf_centroids(
        df, n_clusters, id_col, vec_col
    )
    assigned = ivf_assign(df, cents, id_col, vec_col, keep_vec=True)
    # hoist each vector's norm ONCE before the in-cell self-join (the
    # _bucketed_with_norm discipline): inside the join the O(dim) norm
    # fold would otherwise re-run once per candidate pair per side;
    # dot/(a._n*b._n) keeps cosine()'s operation order → bit-identical
    withn = assigned.select("*", norm(F.col(vec_col)).alias("_n"))
    a, b = withn.alias("a"), withn.alias("b")
    pairs = (
        a.join(b, "cid")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a._n") * F.col("b._n")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    return (
        assigned.select(F.col(id_col), "cid")
        .join(comp, id_col, "left")
        .select(
            F.col(id_col), "cid",
            F.coalesce("component", F.col(id_col)).alias("component"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)).alias(
                "is_kept"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product quantization for
# nearest neighbor search"): vectors compress to m one-byte-ish codes,
# search scans CODES with a per-query lookup table — the memory-side
# companion of IVF (FAISS's IVFPQ = ivf_assign partitioning + this).
# Codebooks are deterministic (per-subspace subvectors of the lowest-id
# vectors, like ivf_centroids) so the index reproduces across engines;
# a trained quantizer drops in by swapping pq_codebooks.
# ---------------------------------------------------------------------------

def _l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    df: DataFrame, m: int = 4, codes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code, cvec): per-subspace codebooks — subspace ``s`` of the
    ``codes`` lowest-id vectors. m*codes rows total: driver-sized by
    construction, the PQ analog of the coarse IVF quantizer."""
    d = dim // m
    v = F.col(vec_col).cast("array<double>")
    subs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"), F.slice(v, s * d + 1, d).alias("cvec")
        )
        for s in range(m)
    ])
    return (
        df.filter(F.col(id_col) < codes)
        .select(F.col(id_col).alias("code"), F.explode(subs).alias("_e"))
        .select(F.col("_e.sub").alias("sub"), "code", F.col("_e.cvec").alias("cvec"))
    )


def pq_encode(
    df: DataFrame, codebooks: DataFrame, m: int = 4, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    inline_max: int = INLINE_CODEBOOK_MAX,
) -> DataFrame:
    """(id, codes ARRAY<INT>): each subvector mapped to its nearest
    (L2) codebook entry, ties to the lowest code. Up to ``inline_max``
    entries per subspace, the codebook is collected and inlined as
    literals, so encoding is a pure projection over the corpus — the
    index build is one scan, no shuffle, and the output is m ints per
    vector instead of ``dim`` floats (the whole point at 100 TB: the
    code table is ~100× smaller than the vectors). Larger codebooks
    attach as ONE broadcast row and the per-subspace argmin folds with
    ``aggregate`` — constant plan size, same (dist, code) minimum,
    identical lowest-code tie-break (strict ``<`` over the
    code-sorted array keeps the first)."""
    d = dim // m
    rows = codebooks.limit(m * inline_max + 1).collect()
    v = F.col(vec_col).cast("array<double>")
    # subvectors materialized into their own Project FIRST (r11): each
    # per-code _l2 is a separate expression tree, so an inline slice is
    # re-evaluated once per codebook entry (m×codes array copies per
    # row; inside the broadcast path's transform lambda it would re-run
    # per entry interpreted). Measured at sf1: encode+scan noop
    # 0.42-0.49 → 0.26-0.34 s/run (−35-40%), codes identical.
    subs = df.select(
        F.col(id_col), *[F.slice(v, s * d + 1, d).alias(f"_s{s}") for s in range(m)]
    )
    code_cols = []
    if len(rows) <= m * inline_max:
        cb: dict[int, list[tuple[int, list[float]]]] = {}
        for r in rows:
            cb.setdefault(r["sub"], []).append(
                (r["code"], [float(x) for x in r["cvec"]])
            )
        for s in range(m):
            sub = F.col(f"_s{s}")
            scored = [
                F.struct(
                    _l2(sub, F.array(*[F.lit(x) for x in cvec])).alias("dist"),
                    F.lit(code).cast("int").alias("code"),
                )
                for code, cvec in sorted(cb[s])
            ]
            best = scored[0] if len(scored) == 1 else F.least(*scored)
            code_cols.append(best.getField("code"))
        return subs.select(F.col(id_col), F.array(*code_cols).alias("codes"))
    cbarr = codebooks.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("sub").cast("int").alias("sub"),
                    F.col("code").cast("int").alias("code"),
                    F.col("cvec").cast("array<double>").alias("cvec"),
                )
            )
        ).alias("_cb")
    )
    for s in range(m):
        sub = F.col(f"_s{s}")  # materialized column, NOT a captured
        # slice — a lambda-captured slice re-copies per codebook entry
        # score each codebook entry ONCE, then lexicographic array_min
        # over (dist, code) — same lowest-code tie-break as F.least over
        # the code-sorted literal structs, one distance eval per entry
        best = F.array_min(
            F.transform(
                F.filter(F.col("_cb"), lambda c: c["sub"] == s),
                lambda c: F.struct(
                    _l2(sub, c["cvec"]).alias("dist"),
                    c["code"].alias("code"),
                ),
            )
        )
        code_cols.append(best.getField("code"))
    return (
        subs.join(F.broadcast(cbarr))  # 1-row broadcast: no amplification
        .select(F.col(id_col), F.array(*code_cols).alias("codes"))
    )


def pq_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    m: int = 4, codes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    encoded: DataFrame | None = None,
    inline_max: int = INLINE_CODEBOOK_MAX,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query's per-subspace
    distance table to every codebook entry is computed ONCE on the
    driver (m*codes doubles), inlined as literal arrays (or, above
    ``inline_max`` codes, attached as ONE broadcast row so the plan
    stays constant-size), and each stored vector's approximate distance
    is m array lookups summed — a pure projection over the CODE table
    followed by a TakeOrdered. Pass ``encoded`` (persisted pq_encode
    output) in a real deployment; the vectors themselves are never
    touched at query time."""
    d = dim // m
    cbdf = pq_codebooks(df, m, codes, dim, id_col, vec_col)
    cb: dict[int, dict[int, list[float]]] = {}
    for r in cbdf.collect():
        cb.setdefault(r["sub"], {})[r["code"]] = [float(x) for x in r["cvec"]]
    if encoded is None:
        encoded = pq_encode(df, cbdf, m, dim, id_col, vec_col)
    # per-subspace LUT, 6-dp pre-round so the cross-engine sum of m
    # entries is order-insensitive (same trick as bm25_topk)
    lut: list[list[float]] = []
    for s in range(m):
        q_s = query_vec[s * d : (s + 1) * d]
        row = []
        for code in sorted(cb[s]):
            acc = 0.0
            for qx, cx in zip(q_s, cb[s][code]):
                acc += (float(qx) - cx) * (float(qx) - cx)
            row.append(round(acc, 6))
        lut.append(row)
    if codes <= inline_max:
        dist = None
        for s in range(m):
            term = F.element_at(
                F.array(*[F.lit(x) for x in lut[s]]),
                F.element_at("codes", s + 1) + 1,
            )
            dist = term if dist is None else dist + term
        scored = encoded.select(
            F.col(id_col), F.round(dist, 4).alias("approx_dist")
        )
    else:
        # huge-codebook fallback: ship the LUT once per executor as a
        # single broadcast row instead of m*codes literals in the plan
        spark = encoded.sparkSession
        lutdf = spark.createDataFrame([(lut,)], "_lut array<array<double>>")
        dist = F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("_lut"),
                lambda c, l: F.element_at(l, c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = encoded.join(F.broadcast(lutdf)).select(
            F.col(id_col), F.round(dist, 4).alias("approx_dist")
        )
    return scored.orderBy("approx_dist", id_col).limit(k)


def ivfpq_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    nprobe: int = 2, n_centroids: int = 8,
    m: int = 4, codes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the FAISS-scale composition: the coarse quantizer picks
    ``nprobe`` cells (partition pruning at rest), and within the probed
    cells the ranking is asymmetric-distance over PQ CODES, so the query
    reads m ints per candidate instead of ``dim`` floats. Pass the
    persisted ``assigned`` (ivf_assign) and ``encoded`` (pq_encode)
    index tables in a real deployment; both are build-once state."""
    cents = ivf_centroids(df, n_centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probes = (
        cents.select("cid", cosine(F.col("cvec"), q).alias("_qs"))
        .orderBy(F.col("_qs").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    if assigned is None:
        assigned = ivf_assign(df, cents, id_col, vec_col)
    if encoded is None:
        encoded = pq_encode(
            df, pq_codebooks(df, m, codes, dim, id_col, vec_col),
            m, dim, id_col, vec_col,
        )
    cand = encoded.join(assigned, id_col).join(
        F.broadcast(probes), "cid", "left_semi"
    ).select(id_col, "codes")
    return pq_topk(
        df, query_vec, k, m, codes, dim, id_col, vec_col, encoded=cand
    )


def prototype_prune(
    df: DataFrame, centroids: DataFrame, keep_frac: float = 0.5,
    hard_first: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototype dataset pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): assign every vector to its nearest centroid,
    score prototypicality as the cosine to that centroid, and keep
    ``keep_frac`` of each cluster — the LEAST prototypical (hardest)
    examples first when ``hard_first`` (the paper's choice for abundant
    data), most prototypical first otherwise (scarce data). Output:
    (id, cid, proto_score, rank, kept) — callers filter on ``kept`` but
    get the full ranking for re-thresholding without a re-run.

    Scale shape: the assignment+score is :func:`ivf_assign`'s
    shuffle-free literal/broadcast projection (keep_score); the
    per-cluster quota is ONE window over cid (a single Exchange on the
    cluster key — no per-cluster collect, no global sort). Deterministic:
    scores round to 4 decimals before ranking, ties break on id.
    """
    a = ivf_assign(df, centroids, id_col, vec_col, keep_score=True)
    s = a.select(
        F.col(id_col), "cid", _z0(F.round("proto_score", 4)).alias("proto_score")
    )
    order = F.col("proto_score").asc() if hard_first else F.col("proto_score").desc()
    w = Window.partitionBy("cid").orderBy(order, F.col(id_col))
    wc = Window.partitionBy("cid")
    return (
        s.withColumn("rank", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "kept", F.col("rank") <= F.ceil(F.lit(float(keep_frac)) * F.col("_n"))
        )
        .drop("_n")
    )


def mips_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Maximum-inner-product top-k against a literal query vector — the
    retrieval scoring used by dual-encoder rankers (unnormalized dot,
    NOT cosine: vector magnitude is part of the learned score). One
    scan, one TakeOrdered; the HOF dot product stays JVM-side.

    At scale, MIPS reduces to cosine ANN by norm augmentation
    (:func:`mips_augment`): append sqrt(M² − ‖x‖²) to every vector (M =
    corpus max norm) and 0 to the query — the augmented corpus is
    constant-norm M, so cosine order on the augmented space IS
    inner-product order and the whole IVF/PQ kit applies unchanged
    (Bachrach et al. 2014, the Shrivastava-Li ALSH simplification)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            _z0(F.round(dot(F.col(vec_col).cast("array<double>"), q), 4)).alias(
                "inner_product"
            ),
        )
        .orderBy(F.col("inner_product").desc(), F.col(id_col))
        .limit(k)
    )


def mips_augment(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[DataFrame, float]:
    """Norm-augmentation transform reducing MIPS to cosine similarity:
    returns (df with ``vec_col`` replaced by the (dim+1)-vector
    ``[x, sqrt(M² − ‖x‖²)]``, M) where M is the corpus max norm (one
    tiny aggregate). Query vectors get a 0 appended
    (:func:`mips_query_augment`); cosine/IVF/PQ top-k on the augmented
    space returns inner-product order on the original space."""
    m = df.select(F.max(norm(F.col(vec_col).cast("array<double>"))).alias("m")
                  ).first()["m"]
    m = float(m)
    v = F.col(vec_col).cast("array<double>")
    pad = F.sqrt(F.greatest(F.lit(m * m) - dot(v, v), F.lit(0.0)))
    out = df.withColumn(vec_col, F.concat(v, F.array(pad)))
    return out, m


def mips_query_augment(query_vec: list[float]) -> list[float]:
    return [float(x) for x in query_vec] + [0.0]


def _column_means(df: DataFrame, vec_col: str, dim: int):
    """(mean ndarray, row count) in one built-in agg (dim sums + count)."""
    import numpy as np

    v = F.col(vec_col).cast("array<double>")
    agg = df.select(
        *[F.sum(F.get(v, i)).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = agg["n"]
    return np.array([agg[f"s{i}"] / n for i in range(dim)]), n


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64,
    center: bool = False, mean=None,
) -> DataFrame:
    """Distributed Gram / scatter matrix XᵀX as a long-form table
    (i, j, val), upper triangle (i ≤ j) — the one-pass reduction every
    spectral embedding step (PCA, whitening, ZCA) needs. Each Arrow
    batch contributes ONE dim×dim partial product in BLAS
    (``m.T @ m``), emitted as dim(dim+1)/2 rows; the final groupBy sums
    #batches × O(dim²) tiny rows — the only shuffle, independent of the
    corpus size. ``center=True`` subtracts the column means first
    (one extra built-in agg — two scans max; pass a precomputed ``mean``
    to skip it) making the output n·Cov(X) computed as Σ(x−μ)ᵀ(x−μ) —
    the cancellation-free form (g/n − μμᵀ loses the variance in float
    rounding when ‖μ‖ ≫ σ).

    100 TB posture: the corpus scan is embarrassingly parallel, the
    shuffle is O(partitions × dim²) regardless of row count, and the
    result is driver-sized (dim² numbers) — collect it and
    eigendecompose with :func:`pca_fit`."""
    import numpy as np

    if mean is not None:
        mean = np.asarray(mean, dtype=np.float64)
    elif center:
        mean, _ = _column_means(df, vec_col, dim)

    iu = np.triu_indices(dim)

    def batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if mean is not None:
                m = m - mean
            g = m.T @ m
            yield pd.DataFrame({
                "i": iu[0].astype(np.int32),
                "j": iu[1].astype(np.int32),
                "val": g[iu],
            })

    return (
        df.select(vec_col)
        .mapInPandas(batches, "i int, j int, val double")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
    )


def pca_fit(
    df: DataFrame, n_components: int, vec_col: str = "embedding",
    dim: int = 64,
) -> dict:
    """Fit PCA on an embedding column: one distributed
    :func:`gram_matrix` pass (centered) + a driver-side dim×dim ``eigh``
    — the correct split at any scale (the data never leaves the
    executors; only the dim² scatter matrix does). Returns
    ``{"components": k×dim list (rows = descending-eigenvalue
    eigenvectors, sign-fixed so each row's largest-|coef| entry is
    positive), "explained_variance": k list, "mean": dim list, "n":
    rows}``."""
    import numpy as np

    mean, n = _column_means(df, vec_col, dim)
    # centered gram (Σ(x−μ)ᵀ(x−μ)) — NOT g/n − μμᵀ, which cancels the
    # variance away in float rounding when the embedding mean dominates
    rows = gram_matrix(df, vec_col, dim, mean=mean).collect()
    g = np.zeros((dim, dim))
    for r in rows:
        g[r.i, r.j] = r.val
        g[r.j, r.i] = r.val
    cov = g / n
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T
    # eigenvector sign is arbitrary: fix each so its largest-|coef|
    # entry is positive (deterministic across BLAS builds)
    for r in range(comps.shape[0]):
        if comps[r, np.argmax(np.abs(comps[r]))] < 0:
            comps[r] = -comps[r]
    return {
        "components": comps.tolist(),
        "explained_variance": [float(vals[i]) for i in order],
        "mean": mean.tolist(),
        "n": int(n),
    }


def pca_project(
    df: DataFrame, model: dict, vec_col: str = "embedding",
    out_col: str = "pca", whiten: bool = False, eps: float = 1e-12,
) -> DataFrame:
    """Apply a :func:`pca_fit` model: center by the literal mean, dot
    with each literal component row (JVM HOF math — the same literal-
    projection shape as :func:`ivf_assign`), optionally whiten (divide
    by sqrt(eigenvalue) → unit variance per output dim). Map-only, zero
    shuffles; the model is a plan literal with the usual broadcast
    fallback territory at large k×dim."""
    v = F.col(vec_col).cast("array<double>")
    mean = F.array(*[F.lit(float(x)) for x in model["mean"]])
    centered = F.zip_with(v, mean, lambda x, m: x - m)
    outs = []
    for r, comp in enumerate(model["components"]):
        c = F.array(*[F.lit(float(x)) for x in comp])
        d = dot(centered, c)
        if whiten:
            d = d / F.lit(float(max(model["explained_variance"][r], eps)) ** 0.5)
        outs.append(d)
    return df.withColumn(out_col, F.array(*outs))


def cluster_purity(
    df: DataFrame, centroids: DataFrame, label_col: str = "label",
    id_col: str = "vec_id", vec_col: str = "embedding",
    inline_max: int = INLINE_CODEBOOK_MAX,
) -> DataFrame:
    """Per-cell label purity of the coarse quantizer — the clustering /
    embedding-quality diagnostic a curation pipeline reads before
    trusting cluster-level decisions (cluster_sample, prototype_prune,
    SemDeDup cells): assign every vector to its max-cosine centroid
    (the shuffle-free literal-codebook :func:`ivf_assign`, ground-truth
    label riding the projection via ``keep_cols`` — no corpus join),
    then ONE (cid, label) aggregate and a cells×labels-sized majority
    argmax. Output: (cid, n, majority_label, n_majority, purity), with
    purity = n_majority/n as exact integer half-up on the 1e-4 grid
    (engine rounding modes cannot diverge). Majority ties break to the
    LOWEST label. Scale shape: one codegen'd scan + one
    map-side-combinable aggregate; the window runs on cells×labels
    rows, never the corpus."""
    a = ivf_assign(
        df, centroids, id_col=id_col, vec_col=vec_col,
        inline_max=inline_max, keep_cols=[label_col],
    )
    per = a.groupBy("cid", label_col).agg(F.count(F.lit(1)).alias("_nl"))
    w = Window.partitionBy("cid")
    wrank = Window.partitionBy("cid").orderBy(
        F.col("_nl").desc(), F.col(label_col)
    )
    return (
        per.withColumn("n", F.sum("_nl").over(w))
        .withColumn("_rk", F.row_number().over(wrank))
        .filter(F.col("_rk") == 1)
        .select(
            "cid",
            F.col("n").cast("bigint").alias("n"),
            F.col(label_col).alias("majority_label"),
            F.col("_nl").cast("bigint").alias("n_majority"),
            (
                F.floor(
                    (F.col("_nl") * 100000.0 / F.col("n") + 5.0) / 10.0
                ) / 10000.0
            ).alias("purity"),
        )
    )


def pq_distortion(
    df: DataFrame, codebooks: DataFrame | None = None,
    m: int = 4, codes: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    inline_max: int = INLINE_CODEBOOK_MAX,
) -> DataFrame:
    """Per-subspace product-quantization distortion — the index-quality
    number that decides m/codes before committing a 100 TB encode: for
    every vector and subspace, the min-L2² to the codebook (the same
    argmin :func:`pq_encode` assigns by), aggregated to
    (sub, n, mse). Per-row distortions are rounded to the 1e-4 grid and
    summed as INTEGERS, mean half-up on the same grid — float
    accumulation order can't flap the result across engines. Scale
    shape: literal-codebook projection (zero shuffle) + one m×-explode
    + one map-side-combinable aggregate to m rows."""
    if codebooks is None:
        codebooks = pq_codebooks(df, m=m, codes=codes, dim=dim,
                                 id_col=id_col, vec_col=vec_col)
    d = dim // m
    rows = codebooks.collect()
    cb: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        cb.setdefault(r["sub"], []).append(
            (r["code"], [float(x) for x in r["cvec"]])
        )
    v = F.col(vec_col).cast("array<double>")
    # subvectors materialized first — the pq_encode discipline: an
    # inline slice re-copies once per codebook entry's _l2 tree
    subs = df.select(
        *[F.slice(v, s * d + 1, d).alias(f"_s{s}") for s in range(m)]
    )
    dist_structs = []
    for s in range(m):
        sub = F.col(f"_s{s}")
        scored = [
            F.struct(
                _l2(sub, F.array(*[F.lit(x) for x in cvec])).alias("dist"),
                F.lit(code).cast("int").alias("code"),
            )
            for code, cvec in sorted(cb[s])
        ]
        best = scored[0] if len(scored) == 1 else F.least(*scored)
        dist_structs.append(
            F.struct(
                F.lit(s).alias("sub"),
                F.round(best.getField("dist"), 4).alias("dist"),
            )
        )
    e4 = F.round(F.col("_d.dist") * 10000).cast("bigint")
    return (
        subs.select(F.explode(F.array(*dist_structs)).alias("_d"))
        .groupBy(F.col("_d.sub").alias("sub"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(e4).alias("_s"))
        .select(
            "sub",
            F.col("n").cast("bigint").alias("n"),
            (
                F.floor((F.col("_s") * 10.0 / F.col("n") + 5.0) / 10.0)
                / 10000.0
            ).alias("mse"),
        )
    )


def rp_project(
    df: DataFrame, k: int = 16, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss sparse sign random projection to ``k``
    dims: proj[j] = Σ_i v[i]·sign_ij / √k with sign_ij = ±1 drawn from
    the SAME multiplicative-scramble family as the LSH hyperplanes
    (_plane_coef — distinctness guarded up to its 97-plane period by
    the hash-family property tests). The at-scale dimensionality
    reducer when :func:`pca_fit`'s covariance pass is not affordable:
    deterministic, training-free, zero-shuffle (one Arrow-batched
    projection), and engine-replayable so the reduced vectors are a
    verifiable contract, rounded to 4 decimals per component.

    Execution (r12, guide §4.2 — batch the arithmetic, keep rounding in
    Spark): the raw components are accumulated in numpy inside
    ``mapInPandas`` with the EXACT float sequence of the previous
    literal-array zip_with fold — per component j, ``acc += v[i]·s_ij``
    for i ascending, one correctly-rounded multiply+add per step on
    IEEE doubles, so raw sums are bit-identical (exceptAll-verified
    both directions at sf0.1 and sf1) — and the contract-defining
    ``round(x·inv, 4) + 0.0`` stays a Spark expression, the same
    rounding point as before. Why not the pure-JVM forms (measured
    history, sf0.1/sf1 per run): the literal-array zip_with fold was
    execution-bound at 0.75/3.3 s (16 interpreted O(dim) HOF folds per
    row); a chained ±element_at codegen tree was execution-fast but
    re-paid ~3.3 s of 1024-node planning per ACTION; the numpy form is
    both constant-plan-size AND vectorized: benched count() at sf1
    2.1 → 0.55 s/run, noop execution at parity or better."""
    import math

    import numpy as np

    inv = 1.0 / math.sqrt(k)
    sign = np.empty((dim, k), dtype=np.float64)
    for j in range(k):
        for i in range(dim):
            sign[i, j] = 1.0 if ((i + 64 * j) * 2654435761 % 97 - 48) >= 0 else -1.0

    def batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            acc = np.zeros((len(pdf), k), dtype=np.float64)
            for i in range(dim):  # ascending-i fold: the contract order
                acc += m[:, [i]] * sign[[i], :]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "_raw": list(acc)}
            )

    raw = df.select(id_col, vec_col).mapInPandas(
        batches, f"{id_col} long, _raw array<double>"
    )
    return raw.select(
        F.col(id_col),
        F.transform(
            F.col("_raw"), lambda x: _z0(F.round(x * F.lit(inv), 4))
        ).alias(out_col),
    )


def sign_signature(
    df: DataFrame, bits: int = 60,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, simhash): the ``bits``-bit SIGN binarization of an embedding
    — bit i set iff v[i] ≥ 0 — the classic binary-embedding compaction
    (a 64-dim float vector becomes one bigint; 60 bits is the widest
    form that stays inside a SIGNED 64-bit integer in both engines, the
    portable_hash60 discipline). Exact integer arithmetic end-to-end:
    the fold sums distinct powers of two as BIGINTs (a double
    accumulator would lose exactness past 2^53), so summation order is
    irrelevant and any engine agrees bit-for-bit. One zip_with fold
    against a literal powers array — constant plan size, zero shuffle.
    The column is named ``simhash`` so the SimHash banding/search
    machinery composes unchanged."""
    v = F.col(vec_col).cast("array<double>")
    powers = F.array(*[
        F.lit(1 << i).cast("bigint") for i in range(bits)
    ])
    sig = F.aggregate(
        F.zip_with(
            F.slice(v, 1, bits), powers,
            lambda x, p: F.when(x >= 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), sig.alias("simhash"))


def _py_sign_signature(vec: list[float], bits: int = 60) -> int:
    """Driver-side replay of :func:`sign_signature` for a query vector."""
    s = 0
    for i in range(bits):
        if vec[i] >= 0:
            s |= 1 << i
    return s


def sign_hamming_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, bits: int = 60,
    id_col: str = "vec_id", vec_col: str = "embedding",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Binary-embedding ANN: top-k by Hamming distance between sign
    signatures — the cheapest retrieval tier (16 bytes/vector of
    storage at 100 TB; bit_count(xor) is one JVM instruction pair per
    row vs a 64-mul HOF cosine). Pass ``signatures`` (a persisted
    :func:`sign_signature` output — the index IS resident state in a
    real deployment) to skip re-binarizing the corpus; ties break by
    id. Output: (id, hamming)."""
    sig = signatures if signatures is not None else sign_signature(
        df, bits=bits, id_col=id_col, vec_col=vec_col
    )
    q = _py_sign_signature([float(x) for x in query_vec], bits)
    return (
        sig.select(
            F.col(id_col),
            F.bit_count(F.col("simhash").bitwiseXOR(F.lit(q).cast("bigint")))
            .cast("int").alias("hamming"),
        )
        .orderBy("hamming", id_col)
        .limit(k)
    )


def sign_neardup_pairs(
    df: DataFrame, max_hamming: int = 3, bits: int = 60,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate candidate pairs over the sign signature
    — SimHash FOR EMBEDDINGS: pairs whose binarizations differ in ≤
    ``max_hamming`` bits, found with the EXACT-coverage AND-OR banded
    join (dedup._banded_hamming_pairs: C(6,3) 30-bit concatenated
    combination keys over 10-bit sub-bands at the 60-bit default — the
    measured anti-quadratic shape from the text SimHash path, reused
    wholesale because sign_signature emits the same ``simhash``
    column). Identical result set to brute-force hamming ≤ max_hamming;
    output (id_a, id_b, hamming)."""
    from bgpexplorer_spark.operators.dedup import _banded_hamming_pairs

    sig = sign_signature(df, bits=bits, id_col=id_col, vec_col=vec_col)
    return _banded_hamming_pairs(
        sig, id_col, sub_bits=bits // 6, n_sub=6,
        max_hamming=max_hamming, sig_bits=bits,
    )


def _union_tagged_topk(parts: list[DataFrame]) -> DataFrame:
    from functools import reduce

    return reduce(DataFrame.unionByName, parts)


def ann_recall(
    df: DataFrame, queries: list[tuple[int, list[float]]], k: int = 10,
    nprobe: int = 2, n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assigned: DataFrame | None = None, use_gemm: bool = False,
) -> DataFrame:
    """Index-quality evaluation: recall@k of the IVF search against the
    exact brute-force top-k, per query — the number that decides nprobe
    / n_centroids BEFORE a 100 TB index build (the reference ships its
    index parameters fixed; a Spark pipeline must earn them on a
    sample, which is exactly this operator's job).

    ``queries`` is a LITERAL-bounded eval sample ((qid, vector) pairs —
    the ivf_centroids convention: collected once, inlined as literals),
    NOT a corpus-derived frame, so nothing here broadcasts corpus data.
    Per query the exact side is one scan + TakeOrdered (embarrassingly
    parallel, no wide exchange) and the ANN side probes the shared
    persisted ``assigned`` index; both sides are tagged with qid and
    unioned, then a single left join counts overlap. Output one row per
    query: (qid, hits, k, recall) with recall = hits/k rounded 4.
    """
    exact_parts, ann_parts = [], []
    for qid, qv in queries:
        tag = F.lit(int(qid)).cast("bigint").alias("qid")
        if not use_gemm:
            exact_parts.append(
                cosine_topk(df, qv, k, id_col, vec_col).select(tag, F.col(id_col))
            )
        ann_parts.append(
            ivf_topk(
                df, qv, k, nprobe, n_centroids, id_col, vec_col, assigned
            ).select(tag, F.col(id_col))
        )
    # use_gemm: the n_q exact scan+TakeOrdered plans collapse into ONE
    # GEMM corpus scan (identical result contract — equivalence-tested)
    exact = (
        cosine_topk_gemm_multi(df, queries, k, id_col, vec_col)
        .select("qid", F.col(id_col))
        if use_gemm
        else _union_tagged_topk(exact_parts)
    )
    ann = _union_tagged_topk(ann_parts).withColumn("_hit", F.lit(1))
    return (
        exact.join(ann, ["qid", id_col], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("hits"))
        .select(
            "qid",
            "hits",
            F.lit(k).alias("k"),
            F.round(F.col("hits") / F.lit(k), 4).alias("recall"),
        )
    )


def matryoshka_overlap(
    df: DataFrame, queries: list[tuple[int, list[float]]], k: int = 10,
    dims: int = 16, id_col: str = "vec_id", vec_col: str = "embedding",
    use_gemm: bool = False,
) -> DataFrame:
    """Truncated-dimension retrieval evaluation (the Matryoshka /
    dimension-budget question): overlap@k between exact cosine top-k on
    the FULL vectors and on their first ``dims`` components. At 100 TB
    the dominant ANN cost is bytes scanned per vector; if overlap@k at
    dims=16 is near 1.0 the index stores a 4× smaller prefix and
    re-ranks survivors at full precision. Same literal-bounded query
    sample + scan-and-TakeOrdered shape as :func:`ann_recall` — the
    truncated side slices map-side (F.slice, no shuffle). Output one
    row per query: (qid, dims, hits, k, overlap).
    """
    trunc = df.select(
        F.col(id_col),
        F.slice(F.col(vec_col).cast("array<double>"), 1, dims).alias(vec_col),
    )
    tqueries = [(qid, qv[:dims]) for qid, qv in queries]
    if use_gemm:
        # both rankings in ONE corpus scan each (see cosine_topk_gemm_multi)
        full = cosine_topk_gemm_multi(df, queries, k, id_col, vec_col).select(
            "qid", F.col(id_col)
        )
        tr = cosine_topk_gemm_multi(trunc, tqueries, k, id_col, vec_col).select(
            "qid", F.col(id_col)
        )
    else:
        full_parts, trunc_parts = [], []
        for (qid, qv), (_, tqv) in zip(queries, tqueries):
            tag = F.lit(int(qid)).cast("bigint").alias("qid")
            full_parts.append(
                cosine_topk(df, qv, k, id_col, vec_col).select(tag, F.col(id_col))
            )
            trunc_parts.append(
                cosine_topk(trunc, tqv, k, id_col, vec_col).select(
                    tag, F.col(id_col)
                )
            )
        full = _union_tagged_topk(full_parts)
        tr = _union_tagged_topk(trunc_parts)
    tr = tr.withColumn("_hit", F.lit(1))
    return (
        full.join(tr, ["qid", id_col], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("hits"))
        .select(
            "qid",
            F.lit(dims).alias("dims"),
            "hits",
            F.lit(k).alias("k"),
            F.round(F.col("hits") / F.lit(k), 4).alias("overlap"),
        )
    )


def cosine_topk_gemm_multi(
    df: DataFrame, queries: list[tuple[int, list[float]]], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for MANY queries in ONE corpus scan — the
    at-scale exact side of the evaluation operators: per Arrow batch,
    one (batch × d) @ (d × n_q) GEMM scores every query at once, each
    query's batch-local top-k (plus the 2e-4 rounding-quantum boundary
    margin — see :func:`cosine_topk_gemm`) survives, and one window
    over the partitions × n_q × ~k candidate rows ranks the global
    top-k per query. Per-query unioned TakeOrdered plans pay n_q corpus
    scans; this pays ONE — at a billion vectors the difference is the
    whole eval budget. Same result contract as per-query
    :func:`cosine_topk` (rounding in Spark, ties by id); zero-norm
    vectors are EXCLUDED (cosine undefined). Output
    (qid, id, cos_sim), k rows per query.
    """
    import numpy as np

    qids = [int(q) for q, _ in queries]
    qm = np.asarray([v for _, v in queries], dtype=np.float64)
    qn = (qm / np.linalg.norm(qm, axis=1, keepdims=True)).T  # d × n_q

    def batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (m @ qn) / norms[:, None]
            ids = pdf[id_col].to_numpy()
            o_q, o_i, o_v = [], [], []
            for ji, qid in enumerate(qids):
                col = cos[:, ji]
                idx = np.nonzero(np.isfinite(col))[0]
                vals, bids = col[idx], ids[idx]
                if len(idx) > k:
                    kth = np.partition(vals, len(vals) - k)[len(vals) - k]
                    keep = vals >= kth - 2e-4
                    bids, vals = bids[keep], vals[keep]
                o_q.append(np.full(len(bids), qid, dtype=np.int64))
                o_i.append(bids)
                o_v.append(vals)
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(o_q),
                    id_col: np.concatenate(o_i),
                    "cos_sim": np.concatenate(o_v),
                }
            )

    cand = df.select(id_col, vec_col).mapInPandas(
        batches, f"qid long, {id_col} long, cos_sim double"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        cand.select("qid", id_col, _z0(F.round("cos_sim", 4)).alias("cos_sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ann_recall_sweep(
    df: DataFrame, queries: list[tuple[int, list[float]]], k: int = 10,
    nprobes: list[int] = (1, 2, 4), n_centroids: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assigned: DataFrame | None = None, use_gemm: bool = True,
) -> DataFrame:
    """THE index tuning curve: recall@k at every candidate ``nprobe``,
    with an ``nprobe`` column — recall vs probe budget in one result,
    the whole decision input for setting nprobe before a 100 TB
    deployment (each +1 probe costs a proportional slice of the corpus
    scan; the curve says what it buys). The exact ground truth is
    computed ONCE — one GEMM corpus scan (``use_gemm``, default) or
    one TakeOrdered union — cached, and joined against every sweep
    point's ANN side; only the probed-list retrievals repeat, which is
    the part the sweep is ABOUT. Pass a persisted ``assigned`` to keep
    the sweep index-build-free. Output: (nprobe, qid, hits, k, recall).
    """
    from functools import reduce

    if use_gemm:
        exact = cosine_topk_gemm_multi(df, queries, k, id_col, vec_col).select(
            "qid", F.col(id_col)
        )
    else:
        exact = _union_tagged_topk(
            [
                cosine_topk(df, qv, k, id_col, vec_col).select(
                    F.lit(int(qid)).cast("bigint").alias("qid"), F.col(id_col)
                )
                for qid, qv in queries
            ]
        )
    # the ground truth is identical across sweep points: compute once,
    # cache (queries x k rows), reuse under every nprobe's overlap join
    exact = exact.cache()
    parts = []
    for np_ in nprobes:
        ann = _union_tagged_topk(
            [
                ivf_topk(
                    df, qv, k, np_, n_centroids, id_col, vec_col, assigned
                ).select(
                    F.lit(int(qid)).cast("bigint").alias("qid"), F.col(id_col)
                )
                for qid, qv in queries
            ]
        ).withColumn("_hit", F.lit(1))
        parts.append(
            exact.join(ann, ["qid", id_col], "left")
            .groupBy("qid")
            .agg(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                .cast("bigint")
                .alias("hits")
            )
            .select(
                F.lit(int(np_)).alias("nprobe"),
                "qid",
                "hits",
                F.lit(k).alias("k"),
                F.round(F.col("hits") / F.lit(k), 4).alias("recall"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def embedding_drift(
    df_a: DataFrame, df_b: DataFrame, centroids: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-distribution drift between two corpora (yesterday vs
    today), reported PER QUANTIZER CELL — the embedding-side complement
    of pipeline.vocab_drift: each side is assigned to the shared coarse
    codebook (shuffle-free literal projection, ivf_assign), and per
    cell the report gives both occupancy counts, both occupancy shares,
    and the cosine between the two sides' cell MEANS (did the cell
    move, not just grow). A cell whose share jumped is new topical
    mass; a cell whose mean rotated is semantic drift inside a stable
    topic — the two failure modes an embedding-space monitor watches.

    Determinism: per-dimension sums are exact BIGINTs on the 1e-6 grid
    (posexplode + combinable sums — the ivf_refine aggregation shape),
    means divide those integers, and the cosine folds the two mean
    arrays in index order — no float accumulation whose order an
    engine could choose. Cells empty on a side emit NULL centroid_cos
    (no mean to compare); shares are each side's own total. Output:
    (cid, count_a, count_b, share_a, share_b, centroid_cos).
    """

    def cell_stats(d: DataFrame, suffix: str) -> DataFrame:
        assigned = ivf_assign(d, centroids, id_col, vec_col, keep_vec=True)
        e6 = F.transform(
            F.col(vec_col), lambda v: F.round(v * 1000000).cast("bigint")
        )
        per_dim = (
            assigned.select("cid", F.posexplode(e6).alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        return (
            per_dim.groupBy("cid")
            .agg(
                F.max("n").alias(f"count_{suffix}"),
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s"))),
                    lambda st: st["s"],
                ).alias(f"_sums_{suffix}"),
            )
        )

    a = cell_stats(df_a, "a")
    b = cell_stats(df_b, "b")
    joined = a.hint("merge").join(b.hint("merge"), "cid", "full_outer")
    tot = joined.agg(
        F.sum(F.coalesce("count_a", F.lit(0))).alias("ta"),
        F.sum(F.coalesce("count_b", F.lit(0))).alias("tb"),
    ).first()
    mean = lambda sums, n: F.transform(  # noqa: E731
        sums, lambda s: s / (F.col(n) * 1000000.0)
    )
    ma, mb = mean(F.col("_sums_a"), "count_a"), mean(F.col("_sums_b"), "count_b")
    return joined.select(
        "cid",
        F.coalesce("count_a", F.lit(0)).cast("bigint").alias("count_a"),
        F.coalesce("count_b", F.lit(0)).cast("bigint").alias("count_b"),
        F.round(F.coalesce("count_a", F.lit(0)) / F.lit(float(tot["ta"] or 1)), 6).alias(
            "share_a"
        ),
        F.round(F.coalesce("count_b", F.lit(0)) / F.lit(float(tot["tb"] or 1)), 6).alias(
            "share_b"
        ),
        F.when(
            F.col("count_a").isNotNull() & F.col("count_b").isNotNull(),
            _z0(F.round(cosine(ma, mb), 4)),
        ).alias("centroid_cos"),
    )

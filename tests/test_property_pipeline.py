"""Property-based invariants for the training-pipeline operators
(operators/pipeline) against independent pure-Python models: random
corpora, any divergence is an operator bug."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bgpexplorer_spark.operators import pipeline

def _hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.text(
            alphabet=st.sampled_from("ab \t"), min_size=0, max_size=40
        ),
        st.sampled_from(["en", "de", "fr", "zh"]),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)

@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, frac=st.floats(min_value=0.0, max_value=1.0))
def test_stratified_sample_matches_model(spark, docs, frac):
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        r.doc_id
        for r in pipeline.stratified_sample(
            df, "lang", {"en": frac}, "doc_id", default_fraction=0.25
        ).collect()
    }
    want = {
        i
        for i, _t, lang in docs
        if _hash32(str(i)) / 2**32 < (frac if lang == "en" else 0.25)
    }
    assert got == want

@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, max_tokens=st.integers(min_value=1, max_value=16))
def test_pack_sequences_matches_model(spark, docs, max_tokens):
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in pipeline.pack_sequences(df, max_tokens, n_shards=4).collect()
    }
    # model: shard by md5 hash, lay out in id order, cut every max_tokens
    shards: dict[int, list[tuple[int, int]]] = {}
    for i, text, _l in docs:
        nt = len([t for t in text.split() if t])
        shards.setdefault(_hash32(str(i)) % 4, []).append((i, nt))
    for sh, items in shards.items():
        off = 0
        for i, nt in sorted(items):
            r = out[i]
            assert (r.shard, r.start_offset, r.n_tokens) == (sh, off, nt)
            first = off // max_tokens
            last = (off + max(nt, 1) - 1) // max_tokens
            assert (r.chunk_first, r.chunk_last, r.n_chunks) == (
                first,
                last,
                last - first + 1,
            )
            off += nt
    assert set(out) == {i for i, _t, _l in docs}

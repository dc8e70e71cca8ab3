"""span_near over span_or slots, span_first, and function_score
field_value_factor — hand-built docs with known positions."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (field_value_factor_topk,
                                           okapi_bm25_topk, queries_df,
                                           query_terms)
from bertopic_spark.operators.fulltext import (span_first_match,
                                               span_near_match,
                                               span_near_or_match)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "merge then later join happens"),          # merge..join span 4
        (1, "join before hash never after"),           # wrong order only
        (2, "hash join tight"),                        # hash..join span 2
        (3, "nothing relevant here"),
        (4, "merge join and also hash join"),          # several chains
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_or_slots(docs):
    got = {r["doc_id"]: r["min_span"] for r in
           span_near_or_match(docs, [("hash", "merge"), ("join",)],
                              slop=6).collect()}
    assert got == {0: 4, 2: 2, 4: 2}


def test_span_or_reduces_to_span_near(docs):
    a = {(r["doc_id"], r["min_span"]) for r in
         span_near_or_match(docs, [("hash",), ("join",)], slop=6).collect()}
    b = {(r["doc_id"], r["min_span"]) for r in
         span_near_match(docs, ["hash", "join"], slop=6).collect()}
    assert a == b


def test_span_or_slop_filters(docs):
    got = {r["doc_id"] for r in
           span_near_or_match(docs, [("hash", "merge"), ("join",)],
                              slop=0).collect()}
    assert got == {2, 4}  # only adjacency survives slop=0


def test_span_or_validation(docs):
    with pytest.raises(ValueError):
        span_near_or_match(docs, [("hash",)])
    with pytest.raises(ValueError):
        span_near_or_match(docs, [("hash",), ()])


def test_span_first(docs):
    got = {r["doc_id"]: r["first_pos"] for r in
           span_first_match(docs, ["join", "hash"], end=2).collect()}
    # doc1: join at 0; doc2: hash at 0; doc4: join at 1 (pos+1 == end)
    assert got == {1: 0, 2: 0, 4: 1}
    wide = {r["doc_id"]: r["first_pos"] for r in
            span_first_match(docs, ["join", "hash"], end=4).collect()}
    assert wide == {0: 3, 1: 0, 2: 0, 4: 1}


def test_fvf_multiply_matches_manual(spark, docs):
    d = docs.withColumn("stars", F.col("doc_id") * 10 + 1)
    qt = query_terms(queries_df(spark, {0: "join"}), "ascii_code")
    base = {r["doc_id"]: r["score"] for r in
            okapi_bm25_topk(d, qt, k=10, text_col="text").collect()}
    import math
    got = {r["doc_id"]: r["score"] for r in
           field_value_factor_topk(d, qt, "stars", k=10, factor=0.5,
                                   modifier="ln1p", text_col="text").collect()}
    for did, s in got.items():
        assert s == pytest.approx(
            base[did] * math.log1p(0.5 * (did * 10 + 1)), rel=1e-12)


def test_fvf_rerank_not_rescore(spark):
    """A doc outside the raw top-1 must be able to take rank 1."""
    rows = [(0, "join join join", 1.0), (1, "join", 1000.0)]
    d = spark.createDataFrame(rows, "doc_id long, text string, pop double")
    qt = query_terms(queries_df(spark, {0: "join"}), "ascii_code")
    top = field_value_factor_topk(d, qt, "pop", k=1, factor=1.0,
                                  modifier="ln1p", text_col="text").collect()
    assert top[0]["doc_id"] == 1


def test_fvf_validation(spark, docs):
    qt = query_terms(queries_df(spark, {0: "join"}), "ascii_code")
    with pytest.raises(ValueError, match="modifier"):
        field_value_factor_topk(docs, qt, "doc_id", modifier="exp")
    with pytest.raises(ValueError, match="boost_mode"):
        field_value_factor_topk(docs, qt, "doc_id", boost_mode="avg")


def test_span_or_postings_parity(docs):
    from bertopic_spark.operators.fulltext import (doc_term_positions,
                                                   span_near_or_match_postings)
    pos = doc_term_positions(docs, "text", "doc_id")
    a = {(r["doc_id"], r["min_span"]) for r in
         span_near_or_match(docs, [("hash", "merge"), ("join",)],
                            slop=6).collect()}
    b = {(r["doc_id"], r["min_span"]) for r in
         span_near_or_match_postings(pos, [("hash", "merge"), ("join",)],
                                     slop=6).collect()}
    assert a == b and a


@pytest.mark.parametrize("pattern", ["win*", "*dow", "*indo*", "w?ndow",
                                     "wi*ow", "*zzz*"])
def test_wildcard_indexed_parity(spark, pattern):
    from bertopic_spark.operators.fulltext import (term_trigrams,
                                                   wildcard_terms,
                                                   wildcard_terms_indexed)
    dic = spark.createDataFrame(
        [("window",), ("windows",), ("widow",), ("meadow",), ("win",),
         ("wind",), ("shadow",), ("indoor",)], "term string")
    tri = term_trigrams(dic)
    assert wildcard_terms_indexed(dic, tri, pattern) == \
        wildcard_terms(dic, pattern)


def test_wildcard_indexed_fallback_and_validation(spark):
    from bertopic_spark.operators.fulltext import (term_trigrams,
                                                   wildcard_terms_indexed)
    dic = spark.createDataFrame([("ab",), ("axb",), ("ayyb",)], "term string")
    tri = term_trigrams(dic)
    # no literal run reaches 3 chars -> falls back to the scan path
    assert wildcard_terms_indexed(dic, tri, "a*b") == ["ab", "axb", "ayyb"]
    with pytest.raises(ValueError, match="matches everything"):
        wildcard_terms_indexed(dic, tri, "**")

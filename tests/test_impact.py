"""Impact-quantized serving (operators/bm25.quantize_impacts/impact_topk):
certified error bound vs exact BM25, resolution monotonicity, degenerate
uniform-score corpus."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (bm25_topk, doc_scores, impact_topk,
                                           quantize_impacts, queries_df,
                                           query_terms)


@pytest.fixture(scope="module")
def scored(documents_df):
    return doc_scores(documents_df, "text", "doc_id").persist()


@pytest.fixture(scope="module")
def qt(spark):
    return query_terms(queries_df(
        spark, {0: "customer order line", 1: "data table column"}))


def _err_vs_exact(scored, qt, bits):
    imp, meta = quantize_impacts(scored, bits=bits)
    approx = impact_topk(imp, meta, qt, k=1 << 30)
    exact = bm25_topk(scored, qt, k=1 << 30).select(
        "query_id", "doc_id", F.col("score").alias("exact"))
    j = approx.join(exact, ["query_id", "doc_id"]).select(
        F.abs(F.col("score") - F.col("exact")).alias("err"),
        "err_bound").collect()
    assert j, "no overlapping results"
    return j


@pytest.mark.parametrize("bits", [4, 8])
def test_error_bound_certified(scored, qt, bits):
    for r in _err_vs_exact(scored, qt, bits):
        assert r["err"] <= r["err_bound"] + 1e-9


def test_more_bits_tighter(scored, qt):
    worst4 = max(r["err_bound"] for r in _err_vs_exact(scored, qt, 4))
    worst12 = max(r["err_bound"] for r in _err_vs_exact(scored, qt, 12))
    assert worst12 < worst4 / 100  # 8 extra bits = 256x finer levels


def test_uniform_scores_are_exact(spark):
    s = spark.createDataFrame(
        [(0, "aa", 1, 0.5), (1, "aa", 1, 0.5), (1, "bb", 1, 0.5)],
        "doc_id long, term string, tf long, score double")
    imp, meta = quantize_impacts(s, bits=8)
    assert {r["q"] for r in imp.collect()} == {0}
    qt = spark.createDataFrame([(0, "aa"), (0, "bb")], "query_id long, term string")
    out = impact_topk(imp, meta, qt, k=5).collect()
    got = {r["doc_id"]: (r["score"], r["err_bound"]) for r in out}
    assert got[0] == (0.5, 0.0) and got[1] == (1.0, 0.0)


def test_validates_bits(scored):
    with pytest.raises(ValueError):
        quantize_impacts(scored, bits=0)
    with pytest.raises(ValueError):
        quantize_impacts(scored, bits=17)

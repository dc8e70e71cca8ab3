"""multi_match best_fields (operators/bm25.multi_match_topk): dis_max and
bool-should degenerate cases, boost routing, field-local statistics."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (multi_match_topk, okapi_bm25_topk,
                                           queries_df, query_terms)


@pytest.fixture(scope="module")
def fielded(spark):
    rows = [
        (0, "alpha beta", "alpha alpha gamma delta"),
        (1, "gamma", "beta beta beta epsilon"),
        (2, "delta epsilon", "alpha gamma gamma"),
    ]
    return spark.createDataFrame(rows, "doc_id long, title string, body string")


def _qt(spark, text="alpha gamma"):
    return query_terms(queries_df(spark, {0: text}), "ascii_code")


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_single_field_equals_okapi(spark, fielded):
    mm = multi_match_topk(fielded, _qt(spark), {"body": 1.0}, k=10)
    ok = okapi_bm25_topk(fielded, _qt(spark), k=10, text_col="body")
    assert _scores(mm) == pytest.approx(_scores(ok), abs=1e-12)


def test_tie_breaker_zero_is_dismax(spark, fielded):
    qt = _qt(spark)
    t = _scores(multi_match_topk(fielded, qt, {"title": 1.0}, k=10))
    b = _scores(multi_match_topk(fielded, qt, {"body": 1.0}, k=10))
    mm = _scores(multi_match_topk(fielded, qt, {"title": 1.0, "body": 1.0},
                                  k=10, tie_breaker=0.0))
    for d in mm:
        assert mm[d] == pytest.approx(
            max(t.get(d, 0.0), b.get(d, 0.0)), abs=1e-12)


def test_tie_breaker_one_is_sum(spark, fielded):
    qt = _qt(spark)
    t = _scores(multi_match_topk(fielded, qt, {"title": 1.0}, k=10))
    b = _scores(multi_match_topk(fielded, qt, {"body": 1.0}, k=10))
    mm = _scores(multi_match_topk(fielded, qt, {"title": 1.0, "body": 1.0},
                                  k=10, tie_breaker=1.0))
    for d in mm:
        assert mm[d] == pytest.approx(
            t.get(d, 0.0) + b.get(d, 0.0), abs=1e-12)


def test_boost_scales_field_leg(spark, fielded):
    qt = _qt(spark, "delta")  # only doc 0 body + doc 2 title contain delta
    mm = _scores(multi_match_topk(fielded, qt, {"title": 5.0, "body": 1.0},
                                  k=10, tie_breaker=0.0))
    t = _scores(multi_match_topk(fielded, qt, {"title": 1.0}, k=10))
    assert mm[2] == pytest.approx(5.0 * t[2], abs=1e-12)


def test_validation(spark, fielded):
    with pytest.raises(ValueError, match="non-empty"):
        multi_match_topk(fielded, _qt(spark), {})
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match_topk(fielded, _qt(spark), {"body": 1.0}, tie_breaker=1.5)

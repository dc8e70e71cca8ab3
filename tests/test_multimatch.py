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


def test_cross_fields_blends_df(spark):
    """The first_name/last_name failure: a term rare in one field but
    absent from the other must NOT get that field's giant idf — the
    blended (max) df gives both fields the same conservative idf."""
    from bertopic_spark.operators.bm25 import (multi_match_cross_fields_topk,
                                               multi_match_topk)
    from pyspark.sql import functions as F

    rows = [
        (0, "will smith", "smith"),      # the right person
        (1, "will", "turner"),           # first name only
        (2, "smith", "jones"),           # 'smith' in the WRONG field
    ] + [(10 + i, f"f{i}", f"l{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, first string, last string")
    qt = spark.createDataFrame([(0, "will"), (0, "smith")],
                               "query_id long, term string")
    cross = multi_match_cross_fields_topk(
        docs, qt, {"first": 1.0, "last": 1.0}, k=3)
    top = cross.orderBy("rank").collect()
    assert top[0]["doc_id"] == 0  # both terms matched beats single-term
    # blended df('smith') = max(df_first, df_last) = 1... both fields see
    # the SAME idf for the same term:
    one = multi_match_cross_fields_topk(
        docs.filter(F.col("doc_id").isin(0, 2)), qt,
        {"first": 1.0, "last": 1.0}, k=5, tie_breaker=0.0)
    s = {r["doc_id"]: r["score"] for r in one.collect()}
    assert 0 in s and 2 in s


def test_cross_fields_tie_breaker_one_sums_fields(spark):
    from bertopic_spark.operators.bm25 import multi_match_cross_fields_topk

    docs = spark.createDataFrame(
        [(0, "alpha", "alpha"), (1, "alpha", "beta"), (2, "gamma", "delta")],
        "doc_id long, a string, b string")
    qt = spark.createDataFrame([(0, "alpha")], "query_id long, term string")
    mx = {r["doc_id"]: r["score"] for r in multi_match_cross_fields_topk(
        docs, qt, {"a": 1.0, "b": 1.0}, k=5, tie_breaker=0.0).collect()}
    sm = {r["doc_id"]: r["score"] for r in multi_match_cross_fields_topk(
        docs, qt, {"a": 1.0, "b": 1.0}, k=5, tie_breaker=1.0).collect()}
    # doc 0 matches in both fields: sum > max; doc 1 single field: equal
    assert sm[0] > mx[0]
    assert sm[1] == pytest.approx(mx[1], abs=1e-12)

"""BM25L exact-math pin and significant_text duplicate filtering."""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import bm25l_topk
from bertopic_spark.operators.fulltext import significant_text


def test_bm25l_hand_math(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa aa aa aa aa aa"), (2, "cc dd")],
        "doc_id long, content string")
    qt = spark.createDataFrame([(0, "aa")], "query_id long, term string")
    k1, b, delta = 1.2, 0.75, 0.5
    out = {r["doc_id"]: r["score"]
           for r in bm25l_topk(docs, qt, k=10, k1=k1, b=b,
                               delta=delta).collect()}
    n, avgdl = 3, (2 + 6 + 2) / 3
    idf = math.log((n + 1) / (2 + 0.5))

    def score(tf, dl):
        c = tf / (1 - b + b * dl / avgdl)
        return idf * (k1 + 1) * (c + delta) / (k1 + c + delta)

    assert out[0] == pytest.approx(score(1, 2), abs=1e-9)
    assert out[1] == pytest.approx(score(6, 6), abs=1e-9)
    assert 2 not in out


def test_bm25l_long_doc_floor(spark):
    # a very long doc with one match still earns nearly idf*(k1+1)*delta/
    # (k1+delta) — not ~0 as under plain Okapi with the same b
    rows = [(0, "aa " + "zz " * 400), (1, "aa bb")]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    qt = spark.createDataFrame([(0, "aa")], "query_id long, term string")
    out = {r["doc_id"]: r["score"]
           for r in bm25l_topk(docs, qt, k=10, delta=0.5).collect()}
    assert out[0] > 0.3 * out[1]  # the delta floor keeps long docs alive


def test_significant_text_dedup_collapses_boilerplate(spark):
    dup = "qq ww boilerplate licensetext headertext"
    rows = [(i, dup) for i in range(6)] + [
        (100, "qq ww alpha beta"), (101, "qq gamma delta"),
        (102, "unrelated words here"), (103, "qq ww epsilon")] + [
        (200 + i, f"filler{i} other text body") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    with_dedup = {r["term"] for r in significant_text(
        docs, "qq ww", k_docs=4, k_terms=10,
        filter_duplicate_text=True).collect()}
    without = {r["term"] for r in significant_text(
        docs, "qq ww", k_docs=4, k_terms=10,
        filter_duplicate_text=False).collect()}
    # without dedup the 30 copies flood the foreground sample
    assert "boilerplate" in without
    # with dedup one copy remains; real co-occurring terms surface
    assert {"alpha", "beta", "epsilon"} & with_dedup

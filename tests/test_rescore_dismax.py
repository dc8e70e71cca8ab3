"""Rescore window / dis_max / boosting invariants (Lucene-ES second-pass
ranking family, operators/bm25.py). Oracle value-parity is covered by the
gates ``rescore_topk`` / ``dismax_topk`` / ``boosting_topk``; these tests
pin the semantic invariants the SQL can't express."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.entry_queries import DRIVER_QUERIES, MODE
from bertopic_spark.operators.bm25 import (
    boosting_topk,
    dismax_topk,
    okapi_bm25_topk,
    queries_df,
    query_terms,
    rescore_topk,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def qt(spark):
    return query_terms(queries_df(spark, DRIVER_QUERIES), MODE)


def _topk_map(df, score_col="score"):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r[score_col], 9)))
    return {q: sorted(v) for q, v in out.items()}


def test_rescore_zero_weight_is_first_pass(docs, qt):
    # rescore_weight=0 → blended == bm25, so top-k must equal the plain
    # Okapi ranking (window >= k never cuts a top-k doc)
    base = _topk_map(okapi_bm25_topk(docs, qt, k=10, text_col="text",
                                     mode=MODE))
    re0 = _topk_map(rescore_topk(docs, qt, k=10, window_size=30,
                                 query_weight=1.0, rescore_weight=0.0,
                                 text_col="text", mode=MODE))
    assert base and re0.keys() == base.keys()
    for q in base:
        assert [d for _, d, _ in re0[q]] == [d for _, d, _ in base[q]]
        for (_, _, s0), (_, _, s1) in zip(re0[q], base[q]):
            assert s0 == pytest.approx(s1, abs=1e-9)


def test_rescore_stays_inside_window(docs, qt):
    # ES semantics: docs outside the first-pass window can never re-enter
    wnd = _topk_map(okapi_bm25_topk(docs, qt, k=20, text_col="text",
                                    mode=MODE))
    allowed = {q: {d for _, d, _ in v} for q, v in wnd.items()}
    out = _topk_map(rescore_topk(docs, qt, k=10, window_size=20,
                                 text_col="text", mode=MODE))
    assert out
    for q, v in out.items():
        assert {d for _, d, _ in v} <= allowed[q]


def test_dismax_single_field_is_okapi(docs, qt):
    base = _topk_map(okapi_bm25_topk(docs, qt, k=10, text_col="text",
                                     mode=MODE))
    dm = _topk_map(dismax_topk(docs, qt, ["text"], tie_breaker=0.3, k=10,
                               mode=MODE))
    assert dm == base


def test_dismax_tie_breaker_monotonic(docs, qt):
    # per (query, doc): max <= max + tie*(sum-max) <= sum; compare the
    # full hit relations (k large enough to keep every candidate)
    d = docs.withColumn("title", F.substring("text", 1, 80))
    runs = {
        t: {(r["query_id"], r["doc_id"]): r["score"]
            for r in dismax_topk(d, qt, ["text", "title"], tie_breaker=t,
                                 k=10 ** 6, mode=MODE).collect()}
        for t in (0.0, 0.3, 1.0)
    }
    assert runs[0.0] and runs[0.0].keys() == runs[1.0].keys()
    for key in runs[0.0]:
        assert (runs[0.0][key] <= runs[0.3][key] + 1e-12
                <= runs[1.0][key] + 2e-12)


def test_boosting_identity_and_demotion(docs, qt):
    neg = ["slow", "filter"]
    ident = boosting_topk(docs, qt, neg, negative_boost=1.0, k=10,
                          text_col="text", mode=MODE)
    base = _topk_map(okapi_bm25_topk(docs, qt, k=10, text_col="text",
                                     mode=MODE))
    im = _topk_map(ident)
    assert {q: [(r, d) for r, d, _ in v] for q, v in im.items()} == \
           {q: [(r, d) for r, d, _ in v] for q, v in base.items()}

    # boost=1 run still FLAGS matching docs, and some doc must match the
    # corpus-vocab negative terms (guards a trivially-empty fixture)
    flagged = {(r["query_id"], r["doc_id"]): r["demoted"]
               for r in ident.collect()}
    assert any(flagged.values())

    # demoted docs carry exactly boost × undemoted score
    full1 = {(r["query_id"], r["doc_id"]): (r["score"], r["demoted"])
             for r in boosting_topk(docs, qt, neg, negative_boost=1.0,
                                    k=10 ** 6, text_col="text",
                                    mode=MODE).collect()}
    half = {(r["query_id"], r["doc_id"]): (r["score"], r["demoted"])
            for r in boosting_topk(docs, qt, neg, negative_boost=0.5,
                                   k=10 ** 6, text_col="text",
                                   mode=MODE).collect()}
    assert full1.keys() == half.keys()
    for key, (s1, dem) in full1.items():
        s2, dem2 = half[key]
        assert dem == dem2
        want = s1 * 0.5 if dem else s1
        assert s2 == pytest.approx(want, abs=1e-9)

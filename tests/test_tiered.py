"""Tiered champion-list serving (operators/bm25.tiered_bm25_topk): the
certificate must make tier-1 answers PROVABLY rank-identical to the
exhaustive scorer at every champion size, including the adversarial
negative-score case (a truncated term's unseen negative contribution must
force escalation, never a silently-wrong exact-looking score)."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (bm25_topk, champion_lists,
                                           doc_scores, queries_df,
                                           query_terms, tiered_bm25_topk)


@pytest.fixture(scope="module")
def setup(spark):
    from bertopic_spark.corpus import fixture_queries, load_corpus

    corpus = load_corpus(spark, n_files=400)
    scores = doc_scores(corpus, mode="ascii_code").persist()
    qt = query_terms(queries_df(spark, fixture_queries(10)), "ascii_code").persist()
    base = sorted(map(tuple, bm25_topk(scores, qt, k=5).collect()))
    yield scores, qt, base
    scores.unpersist()
    qt.unpersist()


@pytest.mark.parametrize("m", [4, 16, 128, 400])
def test_rank_identical_at_every_champion_size(setup, m):
    scores, qt, base = setup
    rep = {}
    got = sorted(map(tuple, tiered_bm25_topk(
        scores, qt, k=5, m=m, _report_out=rep).collect()))
    assert got == base
    n_q = len(rep["served_tier1"]) + len(rep["escalated"])
    assert n_q == 10
    if m >= 400:  # complete champion lists: every query certified
        assert not rep["escalated"]


def test_negative_score_truncation_never_lies(spark):
    # one doc (d0) scores high on 'rare' but has a NEGATIVE contribution
    # on the truncated common term; with m small its champion entry for
    # the common term is cut — a naive lb would overstate d0's score.
    rows = [
        ("rare", 0, 5.0), ("rare", 1, 4.0),
        ("common", 0, -3.0), ("common", 1, -0.1),
        ("common", 2, -0.2), ("common", 3, -0.3),
    ]
    scores = spark.createDataFrame(rows, "term string, doc_id long, score double")
    qt = spark.createDataFrame([(0, "rare"), (0, "common")],
                               "query_id long, term string")
    base = sorted(map(tuple, bm25_topk(scores, qt, k=2).collect()))
    # true: d1 = 4.0-0.1 = 3.9 beats d0 = 5.0-3.0 = 2.0
    assert [r[1] for r in sorted(base, key=lambda r: r[3])] == [1, 0]
    for m in (1, 2, 3, 4):
        rep = {}
        got = sorted(map(tuple, tiered_bm25_topk(
            scores, qt, k=2, m=m, _report_out=rep).collect()))
        assert got == base, (m, rep)


def test_champion_bounds_flags(spark):
    rows = [("a", i, float(10 - i)) for i in range(5)] + [("b", 0, 1.0)]
    scores = spark.createDataFrame(rows, "term string, doc_id long, score double")
    ch, bounds = champion_lists(scores, m=3)
    b = {r["term"]: (r["smin_out"], r["incomplete"]) for r in bounds.collect()}
    assert b["a"] == (8.0, 1)  # truncated at 3 of 5: weakest kept = 8.0
    assert b["b"] == (0.0, 0)  # complete list: no unseen posting possible
    assert ch.filter("term = 'a'").count() == 3


def test_persisted_handle_released(spark, setup):
    scores, qt, _ = setup
    handles = []
    tiered_bm25_topk(scores, qt, k=5, m=16, _persisted_out=handles).collect()
    assert len(handles) == 1
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    for h in handles:
        h.unpersist(blocking=True)
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after == before - 1


def test_okapi_doc_scores_decomposition(spark):
    """bm25_topk over okapi_doc_scores == okapi_bm25_topk: the per-term
    decomposition feeding blocks/WAND/champions is exact."""
    from bertopic_spark.corpus import fixture_queries, load_corpus
    from bertopic_spark.operators.bm25 import okapi_bm25_topk, okapi_doc_scores

    corpus = load_corpus(spark, n_files=300)
    qt = query_terms(queries_df(spark, fixture_queries(6)), "ascii_code")
    rel = okapi_doc_scores(corpus, persist_counts=False)
    got = [(r.query_id, r.doc_id, r["rank"], round(r.score, 12)) for r in
           bm25_topk(rel, qt, k=5).orderBy("query_id", "rank").collect()]
    want = [(r.query_id, r.doc_id, r["rank"], round(r.score, 12)) for r in
            okapi_bm25_topk(corpus, qt, k=5, persist_counts=False)
            .orderBy("query_id", "rank").collect()]
    assert got == want and got
    # non-negative by construction: the champion-bound precondition
    assert rel.filter("score < 0").count() == 0

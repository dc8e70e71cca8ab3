"""Parent-child block join (ES has_child / inner_hits): score_mode
arithmetic vs a hand fold of the child hits, min_children gating, and
inner-hits containment."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (block_join_inner_hits, child_hits,
                                           doc_scores, has_child_topk,
                                           queries_df, query_terms)

MODE = "ascii_code"


@pytest.fixture(scope="module")
def ctx(spark, corpus_df):
    from bertopic_spark.corpus import fixture_queries

    scores = doc_scores(corpus_df, mode=MODE).cache()
    qt = query_terms(queries_df(spark, fixture_queries(3)), MODE)
    parents = corpus_df.select("doc_id", "repo")
    ch = child_hits(scores, qt, parents, "repo").cache()
    assert ch.count() > 0
    return scores, qt, parents, ch


def _fold(ch_rows, mode, min_children):
    import collections
    by = collections.defaultdict(list)
    for r in ch_rows:
        by[(r.query_id, r.repo)].append(r.score)
    out = {}
    for (q, p), ss in by.items():
        if len(ss) < min_children:
            continue
        v = {"max": max, "min": min, "sum": sum,
             "avg": lambda x: sum(x) / len(x)}[mode](ss)
        out[(q, p)] = (v, len(ss))
    return out


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min"])
def test_score_modes_match_hand_fold(spark, ctx, mode):
    scores, qt, parents, ch = ctx
    rows = ch.collect()
    want = _fold(rows, mode, 2)
    got = has_child_topk(scores, qt, parents, "repo", k=10**6,
                         score_mode=mode, min_children=2).collect()
    assert {(r.query_id, r.repo) for r in got} == set(want)
    for r in got:
        v, n = want[(r.query_id, r.repo)]
        assert r.score == pytest.approx(v, abs=1e-9)
        assert r.n_children == n


def test_min_children_gates_before_ranking(spark, ctx):
    scores, qt, parents, ch = ctx
    big = has_child_topk(scores, qt, parents, "repo", k=5, min_children=1)
    few = has_child_topk(scores, qt, parents, "repo", k=5,
                         min_children=10**6)
    assert few.count() == 0
    assert big.count() > 0
    assert big.filter(F.col("rank") > 5).count() == 0


def test_inner_hits_contained_and_ranked(spark, ctx):
    scores, qt, parents, ch = ctx
    tp = has_child_topk(scores, qt, parents, "repo", k=3, score_mode="max")
    ih = block_join_inner_hits(scores, qt, parents, "repo", tp, m=2)
    tps = {(r.query_id, r.repo) for r in tp.collect()}
    chd = {(r.query_id, r.repo, r.doc_id): r.score for r in ch.collect()}
    seen = {}
    for r in ih.collect():
        assert (r.query_id, r.repo) in tps
        assert chd[(r.query_id, r.repo, r.doc_id)] == \
            pytest.approx(r.score, abs=1e-12)
        assert 1 <= r.child_rank <= 2
        seen.setdefault((r.query_id, r.repo), []).append(r.child_rank)
    for ranks in seen.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # max score_mode: the parent's score equals its best inner hit
    best = {}
    for r in ih.collect():
        key = (r.query_id, r.repo)
        best[key] = max(best.get(key, float("-inf")), r.score)
    for r in tp.collect():
        assert r.score == pytest.approx(best[(r.query_id, r.repo)], abs=1e-9)


def test_bad_score_mode_raises(spark, ctx):
    scores, qt, parents, ch = ctx
    with pytest.raises(ValueError):
        has_child_topk(scores, qt, parents, "repo", score_mode="median")

"""Segment serving path: bucket layout, pruned scan, serve_topk identity,
pure-Python xxhash64 parity."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.corpus import fixture_queries
from bertopic_spark.index.segments import (
    build_block_index,
    pruned_block_scan,
    serve_topk,
    term_bucket,
    write_index_segments,
)
from bertopic_spark.index.xxh import xxhash64_str
from bertopic_spark.operators.bm25 import bm25_topk, doc_scores, queries_df, query_terms
from bertopic_spark.tokenizer import tokenize_one

SPAN = 64


@pytest.fixture(scope="module")
def seg_path(spark, corpus_df, tmp_path_factory):
    scores = doc_scores(corpus_df, mode="ascii_code").persist()
    blocks = build_block_index(scores, SPAN)
    path = str(tmp_path_factory.mktemp("segs") / "idx")
    write_index_segments(blocks, path, n_buckets=16)
    return path, scores


def test_xxhash64_matches_spark(spark):
    terms = ["", "a", "the", "userName", "x" * 31, "y" * 32, "東京", "naïve", "zz9"]
    df = spark.createDataFrame([(t,) for t in terms], "t string")
    got = {r["t"]: r["h"] for r in df.select("t", F.xxhash64("t").alias("h")).collect()}
    for t in terms:
        assert got[t] == xxhash64_str(t), t


def test_bucket_layout_pruned_scan(spark, seg_path):
    path, scores = seg_path
    sc = pruned_block_scan(spark, path, ["the", "license"], n_buckets=16)
    terms = {r["term"] for r in sc.select("term").distinct().collect()}
    assert terms <= {"the", "license"} and terms
    plan = sc._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan or "bucket" in plan
    # bucket assignment matches the writer
    rows = spark.read.parquet(path).select("term", "bucket").distinct().collect()
    for r in rows:
        assert r["bucket"] == term_bucket(r["term"], 16)


def test_serve_topk_rank_identical(spark, corpus_df, seg_path):
    path, scores = seg_path
    fq = fixture_queries(20)
    qts = {qid: sorted(set(tokenize_one(fq[qid], "ascii_code"))) for qid in sorted(fq)}
    got = {}
    for r in serve_topk(spark, path, qts, k=10, span=SPAN, n_buckets=16).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    qt = query_terms(queries_df(spark, fq), "ascii_code")
    want = {}
    for r in bm25_topk(scores, qt, k=10).collect():
        want.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    assert set(got) == set(want)
    for q in want:
        gw = sorted(got[q])
        ww = sorted(want[q])
        assert [(r, d) for r, d, _ in gw] == [(r, d) for r, d, _ in ww], q
        for (_, _, gs), (_, _, ws) in zip(gw, ww):
            assert gs == pytest.approx(ws, abs=1e-12)


def test_index_server_matches_cold_path_and_releases_cache(spark, seg_path):
    """Warm serving session (IndexServer): identical results to the cold
    serve_topk path, and the pinned relation is released on close()."""
    from bertopic_spark.index.segments import IndexServer

    path, _ = seg_path
    fq = fixture_queries(10)
    qts = {qid: sorted(set(tokenize_one(fq[qid], "ascii_code")))
           for qid in sorted(fq)}

    def rel(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9)))
        return {q: sorted(v) for q, v in out.items()}

    cold = rel(serve_topk(spark, path, qts, k=10, span=SPAN, n_buckets=16))
    n0 = spark.sparkContext._jsc.getPersistentRDDs().size()
    with IndexServer(spark, path, span=SPAN, n_buckets=16) as srv:
        warm = rel(srv.topk(qts, k=10))
        # single-query serve against the cache too
        one = rel(srv.topk({0: qts[0]}, k=10))
    assert warm == cold
    assert one[0] == cold[0]
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == n0

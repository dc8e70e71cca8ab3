"""Scatter-gather shard search (ES dfs_query_then_fetch semantics).

With globally-computed statistics (the DFS phase), per-shard local top-k +
coordinator merge must be RANK-IDENTICAL to the exhaustive path — scores,
docids and tie-breaks. Without the DFS phase (per-shard idf, ES's default
query_then_fetch), shard-local df skew shifts scores: demonstrated below.
"""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (
    bm25_topk, bm25_topk_adhoc, dfs_shard_topk, doc_scores, queries_df,
    query_terms)

QUERIES = {
    0: "def return value",
    1: "class method self",
    2: "import module package",
    3: "for index range loop",
}


@pytest.fixture(scope="module")
def scores_and_qterms(spark, corpus_df):
    qt = query_terms(queries_df(spark, QUERIES), "ascii_code")
    sc = doc_scores(corpus_df, text_col="content", mode="ascii_code",
                    persist_counts=False).persist()
    yield sc, qt
    sc.unpersist()


def test_dfs_shard_topk_rank_identical(scores_and_qterms):
    sc, qt = scores_and_qterms
    exhaustive = bm25_topk(sc, qt, k=10).collect()
    for n_shards in (2, 8, 64):
        sharded = dfs_shard_topk(sc, qt, k=10, n_shards=n_shards).collect()
        key = lambda r: (r["query_id"], r["rank"])
        a = {key(r): (r["doc_id"], round(r["score"], 9)) for r in exhaustive}
        b = {key(r): (r["doc_id"], round(r["score"], 9)) for r in sharded}
        assert a == b, f"n_shards={n_shards} diverged from exhaustive"


def test_dfs_shard_topk_small_k_more_shards_than_hits(scores_and_qterms):
    """k=1 with many shards: the coordinator merge must still pick the
    single global argmax even though 64 local winners reach it."""
    sc, qt = scores_and_qterms
    exhaustive = bm25_topk(sc, qt, k=1).collect()
    sharded = dfs_shard_topk(sc, qt, k=1, n_shards=64).collect()
    assert sorted((r["query_id"], r["doc_id"]) for r in exhaustive) == \
        sorted((r["query_id"], r["doc_id"]) for r in sharded)


def test_query_then_fetch_local_stats_misrank(spark, corpus_df):
    """WHY the DFS phase exists: per-shard statistics (ES default
    query_then_fetch) score the same doc differently depending on which
    shard it landed in — df and avgdl are shard-local — so the merged
    scores diverge from the global ones."""
    qt = query_terms(queries_df(spark, QUERIES), "ascii_code")
    glob = {(r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk_adhoc(corpus_df, qt, k=10,
                                     text_col="content", mode="ascii_code",
                                     persist_counts=False).collect()}
    n_shards = 2
    shard = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards))
    local = {}
    for s in range(n_shards):  # driver loop: demo only, tiny fixture
        part = corpus_df.filter(shard == s)
        for r in bm25_topk_adhoc(part, qt, k=10, text_col="content",
                                 mode="ascii_code",
                                 persist_counts=False).collect():
            local[(r["query_id"], r["doc_id"])] = r["score"]
    common = set(glob) & set(local)
    assert common, "no overlapping (query, doc) hits to compare"
    diffs = [k for k in common if abs(glob[k] - local[k]) > 1e-9]
    assert diffs, "shard-local statistics unexpectedly matched global scores"

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


def test_selective_search_full_probe_rank_identical(spark, corpus_df):
    """n_probe == n_shards searches everything: selective search with
    global statistics must be rank-identical to exhaustive BM25."""
    from bertopic_spark.operators.bm25 import selective_search_topk

    qt = query_terms(queries_df(spark, QUERIES), "ascii_code")
    exhaustive = bm25_topk_adhoc(corpus_df, qt, k=10,
                                 text_col="content").collect()
    sel = selective_search_topk(corpus_df, qt, k=10, n_probe=8, n_shards=8,
                                text_col="content",
                                persist_counts=False).collect()
    key = lambda r: (r["query_id"], r["rank"])
    a = {key(r): (r["doc_id"], round(r["score"], 9)) for r in exhaustive}
    b = {key(r): (r["doc_id"], round(r["score"], 9)) for r in sel}
    assert a == b


def test_selective_search_probe_subset_of_exhaustive(spark, corpus_df):
    """n_probe < n_shards returns only docs from selected shards, and
    every returned doc carries its exhaustive (global-stats) score."""
    from bertopic_spark.operators.bm25 import (cori_shard_scores,
                                               selective_search_topk)

    qt = query_terms(queries_df(spark, QUERIES), "ascii_code")
    sel = selective_search_topk(corpus_df, qt, k=10, n_probe=2, n_shards=8,
                                text_col="content",
                                persist_counts=False).collect()
    shards = cori_shard_scores(corpus_df, qt, n_shards=8,
                               text_col="content",
                               persist_counts=False).collect()
    chosen = {(r["query_id"], r["shard"]) for r in shards if r["rank"] <= 2}
    assert sel and all(
        (r["query_id"], r["doc_id"] % 8) in chosen for r in sel)
    full = {(r["query_id"], r["doc_id"]): r["score"] for r in
            bm25_topk_adhoc(corpus_df, qt, k=10**6,
                            text_col="content").collect()}
    assert all(abs(full[(r["query_id"], r["doc_id"])] - r["score"]) < 1e-9
               for r in sel)


def test_cori_default_belief_and_validation(spark):
    """A shard containing none of the query's terms gets exactly the
    default belief b; in-vocab accounting ignores OOV terms."""
    from bertopic_spark.operators.bm25 import cori_shard_scores

    docs = spark.createDataFrame(
        [(0, "rare rare common"), (1, "common filler words"),
         (2, "rare common mix"), (3, "filler words again")],
        "doc_id long, content string")
    # n_shards=2: shard 0 = docs {0,2} (both contain 'rare'), shard 1 = {1,3}
    q = spark.createDataFrame([(0, "rare"), (0, "zz_oov")],
                              "query_id long, term string")
    out = {r["shard"]: r for r in
           cori_shard_scores(docs, q, n_shards=2,
                             persist_counts=False).collect()}
    assert out[1]["belief"] == 0.4          # pure default: no matched term
    assert out[0]["belief"] > 0.4 and out[0]["rank"] == 1
    with pytest.raises(ValueError):
        cori_shard_scores(docs, q, n_shards=0)
    from bertopic_spark.operators.bm25 import selective_search_topk
    with pytest.raises(ValueError):
        selective_search_topk(docs, q, n_probe=3, n_shards=2)

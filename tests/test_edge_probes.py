"""Degenerate-input probes for the serving and build paths: empty query,
OOV-only query, NULL content, empty corpus, single-class corpus.

These document the engine's contract at the edges a 100-TB crawl WILL hit
(nulls and empties are routine at scale); each probe asserts either a sane
empty result or a clear error — never a silent wrong answer.
"""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.index.segments import (
    IndexServer,
    build_block_index,
    serve_topk,
    write_index_segments,
)
from bertopic_spark.operators.bm25 import doc_scores
from bertopic_spark.operators.ctfidf import ctfidf
from bertopic_spark.operators.postings import class_term_counts, doc_term_counts

SPAN = 64

CORPUS_SCHEMA = (
    "repo string, path string, commit string, content string, doc_id long"
)


@pytest.fixture(scope="module")
def tiny_seg(spark, tmp_path_factory):
    rows = [
        ("r", f"f{i}.py", "c0", f"def handler_{i}(): return widget_{i % 3}", i)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    scores = doc_scores(df, mode="ascii_code")
    path = str(tmp_path_factory.mktemp("edge") / "seg")
    write_index_segments(build_block_index(scores, SPAN), path, n_buckets=4)
    return path


def test_empty_query_batch(spark, tiny_seg):
    """Empty batch → empty result with the serving schema, not a crash."""
    out = serve_topk(spark, tiny_seg, {}, k=5, span=SPAN, n_buckets=4)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "doc_id", "score", "rank"}
    with IndexServer(spark, tiny_seg, span=SPAN, n_buckets=4) as srv:
        assert srv.topk({}, k=5).count() == 0


def test_oov_only_query_and_mixed_batch(spark, tiny_seg):
    """A query of only out-of-vocabulary terms returns no rows for that
    query while the rest of the batch is unaffected."""
    oov = {7: ["zzzqx", "notaterm99"]}
    assert serve_topk(spark, tiny_seg, oov, k=5, span=SPAN, n_buckets=4).count() == 0
    mixed = {1: ["handler_1"], 7: ["zzzqx"]}
    got = serve_topk(spark, tiny_seg, mixed, k=5, span=SPAN, n_buckets=4).collect()
    assert {r["query_id"] for r in got} == {1}


def test_null_content_rows_drop_from_postings(spark):
    """NULL content tokenizes to a NULL array; explode drops the row — the
    doc is absent from the index (documented), everything else intact."""
    rows = [("r", "a.py", "c", "alpha beta", 0),
            ("r", "b.py", "c", None, 1),
            ("r", "c.py", "c", "alpha gamma", 2)]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA)
    scores = doc_scores(df, mode="ascii_code", persist_counts=False)
    ids = {r["doc_id"] for r in scores.select("doc_id").distinct().collect()}
    assert ids == {0, 2}


def test_empty_corpus_builds_empty_index(spark, tmp_path):
    """Zero input rows → zero postings, a servable (empty) index, and no
    divide-by-zero from the avgdl aggregate."""
    df = spark.createDataFrame([], CORPUS_SCHEMA)
    scores = doc_scores(df, mode="ascii_code", persist_counts=False)
    assert scores.count() == 0
    path = str(tmp_path / "seg")
    write_index_segments(build_block_index(scores, SPAN), path, n_buckets=4)
    out = serve_topk(spark, path, {0: ["alpha"]}, k=5, span=SPAN, n_buckets=4)
    assert out.count() == 0


def test_single_class_corpus_finite_scores(spark):
    """One class: idf and the avg-length normalizer degenerate but must
    stay finite (reference `_ctfidf.py` computes log(1 + A/tf) with A =
    avg class length — fine at k=1; nothing divides by (k-1))."""
    rows = [("r", f"f{i}.py", "c", "common shared tokens here", i)
            for i in range(5)]
    df = spark.createDataFrame(rows, CORPUS_SCHEMA).withColumn("cls", F.lit(0))
    dt = doc_term_counts(df, "content", ["cls"], "ascii_code")
    sc = ctfidf(class_term_counts(dt, ["cls"]), ["cls"])
    vals = [r["score"] for r in sc.collect()]
    assert vals and all(v is not None and abs(v) < float("inf") for v in vals)


# ---------------------------------------------------------------------------
# Round-3 retrieval/pipeline operators at the edges
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (0, "the customer placed an order for the table", "en", "s1"),
        (1, None, "en", "s1"),                       # NULL text
        (2, "", "de", "s2"),                         # empty text
        (3, "order order order order order", "de", None),  # NULL field 2
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_new_ops_null_and_empty_text(spark, edge_docs):
    from bertopic_spark.operators.bm25 import (bm25_topk_stratified,
                                               bm25f_topk, passage_topk,
                                               queries_df, query_terms)
    from bertopic_spark.operators.fulltext import proximity_match
    from bertopic_spark.operators.pipeline import training_shards
    from bertopic_spark.operators.textstats import gopher_filter, pack_shards

    qt = query_terms(queries_df(spark, {0: "customer order"}), "ascii_code")
    # NULL/empty docs simply never match; no crash, no NULL rows
    assert proximity_match(edge_docs, ["customer", "order"], 10,
                           "text").count() == 1
    p = passage_topk(edge_docs, qt, window=4, stride=2, k=10,
                     text_col="text")
    assert {r.doc_id for r in p.collect()} == {0, 3}
    f = bm25f_topk(edge_docs, qt, {"text": 1.0, "source": 2.0}, k=10)
    assert {r.doc_id for r in f.collect()} == {0, 3}
    s = bm25_topk_stratified(edge_docs, qt, "lang", k=10, text_col="text")
    assert {(r.lang, r.doc_id) for r in s.collect()} == {("en", 0), ("de", 3)}
    # NULL/empty text packs as 0 tokens but keeps its row
    ps = {r.doc_id: (r.n_tokens, r.shard_id)
          for r in pack_shards(edge_docs, 6, text_col="text").collect()}
    assert ps[1] == (0, 1) and ps[2] == (0, 1)
    assert ps[0][0] == 8 and ps[0][1] == 0
    # gopher drops all four (too short), so the pipeline yields no shards
    assert gopher_filter(edge_docs).filter("keep").count() == 0
    assert training_shards(edge_docs, 100, text_col="text").count() == 0


def test_new_ops_empty_corpus(spark, edge_docs):
    from bertopic_spark.operators.bm25 import (bm25f_topk, passage_topk,
                                               prf_expand_topk, queries_df,
                                               query_terms)
    from bertopic_spark.operators.fulltext import (proximity_match,
                                                   term_associations)
    from bertopic_spark.operators.textstats import pack_shards

    empty = edge_docs.limit(0)
    qdf = queries_df(spark, {0: "customer order"})
    qt = query_terms(qdf, "ascii_code")
    assert proximity_match(empty, ["a1", "b2"], 5, "text").count() == 0
    assert passage_topk(empty, qt, 4, 2, text_col="text").count() == 0
    assert bm25f_topk(empty, qt, {"text": 1.0}).count() == 0
    assert prf_expand_topk(empty, qdf, text_col="text").count() == 0
    assert pack_shards(empty, 10, text_col="text").count() == 0
    assert term_associations(empty, ["customer"]).count() == 0


def test_lm_and_ltr_edge_probes(spark):
    from bertopic_spark.operators.bm25 import lm_topk, ltr_features

    corpus = spark.createDataFrame(
        [("r", "f.py", "c0", "alpha beta", 0)], CORPUS_SCHEMA)
    empty_q = spark.createDataFrame([], "query_id long, term string")
    assert lm_topk(corpus, empty_q, text_col="content").count() == 0
    assert ltr_features(corpus, empty_q, text_col="content").count() == 0
    oov_q = spark.createDataFrame([(0, "zzz")], "query_id long, term string")
    assert lm_topk(corpus, oov_q, text_col="content").count() == 0
    assert ltr_features(corpus, oov_q, text_col="content").count() == 0
    empty_c = spark.createDataFrame([], CORPUS_SCHEMA)
    q = spark.createDataFrame([(0, "alpha")], "query_id long, term string")
    assert lm_topk(empty_c, q, text_col="content").count() == 0


def test_tiered_edge_probes(spark):
    from bertopic_spark.operators.bm25 import tiered_bm25_topk

    empty_scores = spark.createDataFrame(
        [], "term string, doc_id long, score double")
    q = spark.createDataFrame([(0, "alpha")], "query_id long, term string")
    rep = {}
    # empty index: every query escalates, exhaustive over empty = empty
    assert tiered_bm25_topk(empty_scores, q, k=3, m=4,
                            _report_out=rep).count() == 0
    assert rep["escalated"] == [0]
    # empty query batch
    empty_q = spark.createDataFrame([], "query_id long, term string")
    scores = spark.createDataFrame([("alpha", 0, 1.0)],
                                   "term string, doc_id long, score double")
    assert tiered_bm25_topk(scores, empty_q, k=3, m=4).count() == 0


def test_graph_edge_probes(spark):
    from bertopic_spark.operators.graph import (cooccurrence_edges,
                                                textrank_keywords)

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert cooccurrence_edges(empty_docs, "text", "doc_id").count() == 0
    assert textrank_keywords(empty_docs, "text", "doc_id").count() == 0
    # single-term docs: no pairs, empty graph, empty keywords
    solo = spark.createDataFrame([(i, "alpha") for i in range(5)],
                                 "doc_id long, text string")
    assert cooccurrence_edges(solo, "text", "doc_id").count() == 0
    assert textrank_keywords(solo, "text", "doc_id").count() == 0
    # null text rows contribute nothing and do not crash
    nulls = spark.createDataFrame([(0, "alpha beta"), (1, None)],
                                  "doc_id long, text string")
    assert cooccurrence_edges(nulls, "text", "doc_id").count() == 1


def test_round3_batch_edge_probes(spark, edge_docs):
    from bertopic_spark.operators.bm25 import (boosting_topk, dismax_topk,
                                               queries_df, query_terms,
                                               rescore_topk)
    from bertopic_spark.operators.fulltext import span_near_match
    from bertopic_spark.operators.pipeline import (domain_mix_plan,
                                                   domain_mix_sample)
    from bertopic_spark.operators.sketch import (histogram_quantiles,
                                                 histogram_sketch)

    qt = query_terms(queries_df(spark, {0: "customer order"}), "ascii_code")
    empty = edge_docs.limit(0)

    # NULL/empty text never matches; empty corpus yields empty top-k
    assert span_near_match(edge_docs, ["customer", "order"], 5,
                           "text").count() == 1
    assert span_near_match(empty, ["customer", "order"], 5,
                           "text").count() == 0
    got = rescore_topk(edge_docs, qt, k=2, window_size=2, text_col="text")
    assert {r.doc_id for r in got.collect()} <= {0, 3} and got.count() > 0
    assert rescore_topk(empty, qt, k=2, window_size=2,
                        text_col="text").count() == 0
    dm = dismax_topk(edge_docs, qt, ["text", "source"], k=5)
    assert {r.doc_id for r in dm.collect()} == {0, 3}
    assert dismax_topk(empty, qt, ["text"], k=5).count() == 0
    bq = boosting_topk(edge_docs, qt, ["table"], negative_boost=0.1,
                       k=5, text_col="text")
    flags = {r.doc_id: r.demoted for r in bq.collect()}
    assert flags.get(0) is True and flags.get(3) is False
    assert boosting_topk(empty, qt, ["table"], text_col="text").count() == 0

    # histogram: empty input → empty sketch → empty quantiles (no crash)
    sk = histogram_sketch(empty, "doc_id", 0.0, 10.0, 5)
    assert sk.count() == 0
    assert histogram_quantiles(sk, [0.5], 0.0, 10.0, 5).count() == 0

    # domain mix: NULL domain rows group under NULL and stay consistent;
    # empty corpus → empty plan and sample
    plan = domain_mix_plan(edge_docs, "lang", "doc_id", budget=10.0)
    assert plan.count() == 2
    assert domain_mix_plan(empty, "lang", "doc_id", budget=1.0).count() == 0
    assert domain_mix_sample(
        empty, plan, "lang", "doc_id").count() == 0


# -- round-3 additions: RM3, impact serving, multi-fragment snippets, --------
# -- coherence metrics --------------------------------------------------------


@pytest.fixture(scope="module")
def mini_docs(spark):
    rows = [(i, f"alpha beta gamma_{i % 2} delta") for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_rm3_oov_only_query_is_empty(spark, mini_docs):
    """Every query term OOV → no candidates in round 1, no feedback docs,
    empty result — not a crash, not a prior-only ranking."""
    from bertopic_spark.operators.bm25 import queries_df, rm3_topk

    out = rm3_topk(mini_docs, queries_df(spark, {0: "zzz_never_seen"}), mu=50.0)
    assert out.count() == 0


def test_impact_empty_query_terms(spark, mini_docs):
    from bertopic_spark.operators.bm25 import (doc_scores, impact_topk,
                                               quantize_impacts)

    imp, meta = quantize_impacts(doc_scores(mini_docs))
    qt = spark.createDataFrame([], "query_id long, term string")
    out = impact_topk(imp, meta, qt, k=5)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "doc_id", "score", "err_bound",
                                "rank"}


def test_top_snippets_null_and_empty_text(spark):
    from bertopic_spark.operators.fulltext import top_snippets

    d = spark.createDataFrame(
        [(0, None), (1, ""), (2, "alpha beta alpha")],
        "doc_id long, text string")
    out = top_snippets(d, ["alpha"], n_fragments=2, window=2).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_coherence_single_doc_and_disjoint_vocab(spark):
    """One doc: every top-k pair co-occurs everywhere → u_mass pairs are
    ln((1+1)/1); a topic whose words never co-occur stays defined (NPMI
    −1 per pair)."""
    import math

    from bertopic_spark.operators.evaluation import npmi_coherence, umass_coherence

    dt = spark.createDataFrame([(1, "aa"), (1, "bb")], "doc_id long, term string")
    topk = spark.createDataFrame(
        [("t", 1, "aa", 2.0), ("t", 2, "bb", 1.0)],
        "topic string, rank int, term string, score double")
    u = umass_coherence(topk, dt, ["topic"]).collect()[0]["coherence"]
    assert abs(u - round(math.log(2.0), 6)) < 1e-9
    n = npmi_coherence(topk, dt, ["topic"]).collect()[0]["coherence"]
    assert n == 1.0  # co-occur in every (the only) doc


def test_auto_reduce_single_topic_noop(spark, mini_docs):
    from bertopic_spark.model import BERTopicSpark

    m = BERTopicSpark(class_cols=["topic"]).fit(
        mini_docs.withColumn("topic", F.lit(0)), "content", "doc_id")
    out = m.reduce_topics("auto", distance_threshold=1.0)
    assert out is m and not m.mappings_

"""Doc-level BM25 retrieval: Spark exhaustive scorer vs local oracle —
rank-identical docIDs AND scores (north rule gate)."""

import pytest

from bertopic_spark import oracle
from bertopic_spark.corpus import fixture_queries
from bertopic_spark.operators.bm25 import bm25_topk, doc_scores, queries_df, query_terms

MODE = "ascii_code"


@pytest.fixture(scope="module")
def queries():
    return fixture_queries(40)


@pytest.fixture(scope="module")
def spark_topk(spark, corpus_df, queries):
    scores = doc_scores(corpus_df, mode=MODE).cache()
    qt = query_terms(queries_df(spark, queries), MODE)
    rows = bm25_topk(scores, qt, k=10).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: [(d, s) for _, d, s in sorted(v)] for q, v in out.items()}


@pytest.fixture(scope="module")
def oracle_topk(corpus_rows, queries):
    return oracle.bm25_topk(
        [r["content"] for r in corpus_rows],
        [r["doc_id"] for r in corpus_rows],
        queries, k=10, mode=MODE,
    )


def test_rank_identical_to_oracle(spark_topk, oracle_topk, queries):
    for qid in queries:
        want = oracle_topk[qid]
        got = spark_topk.get(qid, [])
        assert [d for d, _ in got] == [d for d, _ in want], (qid, queries[qid])
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (qid, gd)


def test_stop_term_queries_covered(spark_topk, oracle_topk):
    # stop-term-only queries (0-4) hit (almost) every doc → full top-10;
    # OOV-bearing queries (5-9) are covered by the rank-identity test.
    for qid in range(5):
        assert len(oracle_topk[qid]) == 10
        assert len(spark_topk[qid]) == 10


def test_rank_stable_across_parallelism(spark, corpus_df, queries, spark_topk):
    # same job, different partitioning → identical ranking (doc_id tie-break
    # + integer-derived scores make this deterministic)
    scores = doc_scores(corpus_df.repartition(3), mode=MODE)
    qt = query_terms(queries_df(spark, queries), MODE)
    rows = bm25_topk(scores, qt, k=10).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    got = {q: [d for _, d in sorted(v)] for q, v in out.items()}
    want = {q: [d for d, _ in v] for q, v in spark_topk.items()}
    assert got == want


def test_adhoc_path_rank_identical(spark, corpus_df, queries, spark_topk):
    # bm25_topk_adhoc pushes the query-term filter below scoring; results
    # must be identical to the full-index path (docIDs AND scores)
    from bertopic_spark.operators.bm25 import bm25_topk_adhoc

    qt = query_terms(queries_df(spark, queries), MODE)
    rows = bm25_topk_adhoc(corpus_df, qt, k=10, mode=MODE).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    got = {q: [(d, s) for _, d, s in sorted(v)] for q, v in out.items()}
    assert got == spark_topk


def test_more_like_this_invariants(spark, documents_df):
    from bertopic_spark.operators.bm25 import more_like_this

    seeds = [0, 7, 42]
    held = []
    out = more_like_this(documents_df, seeds, n_terms=5, k=10,
                         text_col="text", id_col="doc_id",
                         _persisted_out=held)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r["rank"], r.doc_id, r.score))
    assert set(by_q) == set(seeds)
    for q, rs in by_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(x[1] != q for x in rs)            # self-hit excluded
        scores = [x[2] for x in rs]
        assert scores == sorted(scores, reverse=True)
    # deterministic under a different partitioning
    out2 = more_like_this(documents_df.repartition(13), seeds, n_terms=5,
                          k=10, text_col="text", id_col="doc_id",
                          persist_counts=False)
    assert {(r.query_id, r.doc_id, r["rank"]) for r in out2.collect()} == \
           {(r.query_id, r.doc_id, r["rank"]) for r in rows}
    for df in held:
        df.unpersist()
    with pytest.raises(ValueError):
        more_like_this(documents_df, [], text_col="text", id_col="doc_id")


def test_rrf_fuse_hand_computed(spark):
    from bertopic_spark.operators.bm25 import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id long, doc_id long, rank long")
    got = {(r.query_id, r.doc_id): (round(r.score, 9), r["rank"])
           for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    # 11: 1/62 + 1/61 ranks first; 10: 1/61; 13: 1/62; 12: 1/63
    assert got[(0, 11)] == (round(1 / 62 + 1 / 61, 9), 1)
    assert got[(0, 10)] == (round(1 / 61, 9), 2)
    assert got[(0, 13)] == (round(1 / 62, 9), 3)
    assert got[(0, 12)] == (round(1 / 63, 9), 4)
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


@pytest.fixture(scope="module")
def queries_small():
    # real corpus-vocabulary queries (qids 10,11 of the seeded fixture set);
    # plain English words never match the snake_case code tokens
    full = fixture_queries(12)
    return {0: full[10], 1: full[11]}


@pytest.fixture(scope="module")
def qterms_small(spark, queries_small):
    qt = query_terms(queries_df(spark, queries_small), MODE)
    assert qt.count() >= 2
    return qt


def test_collapse_topk_brute(spark, corpus_df, qterms_small):
    qterms = qterms_small
    corpus = corpus_df
    import collections

    from bertopic_spark.operators.bm25 import bm25_topk_adhoc, collapse_topk

    held = []
    hits = bm25_topk_adhoc(corpus, qterms, k=10**6, text_col="content",
                           _persisted_out=held).drop("rank")
    got = [(r.query_id, r.doc_id, r.lang, round(r.score, 9), r["rank"])
           for r in collapse_topk(hits, corpus.select("doc_id", "lang"),
                                  "lang", per_key=2, k=5)
           .orderBy("query_id", "rank").collect()]
    lang = {r.doc_id: r.lang for r in corpus.select("doc_id", "lang").collect()}
    ranked = collections.defaultdict(list)
    for r in hits.collect():
        ranked[r.query_id].append((-r.score, r.doc_id))
    want = []
    for qid in sorted(ranked):
        seen, out = collections.Counter(), []
        for negs, did in sorted(ranked[qid]):
            if seen[lang[did]] < 2:
                seen[lang[did]] += 1
                out.append((qid, did, lang[did], round(-negs, 9),
                            len(out) + 1))
            if len(out) == 5:
                break
        want.extend(out)
    assert got == want
    assert got  # corpus-vocab queries must actually hit
    for d in held:
        d.unpersist()


def test_bm25f_single_field_and_boost(spark, corpus_df, qterms_small):
    qterms = qterms_small
    corpus = corpus_df
    """With one field, BM25F is classic Robertson BM25; a second field with
    weight 0 must not change anything; boosting a field reorders."""
    import math

    from bertopic_spark.operators.bm25 import bm25f_topk

    held1, held2 = [], []
    one = bm25f_topk(corpus, qterms, {"content": 1.0}, k=5,
                     _persisted_out=held1)
    # brute-force Robertson BM25 on the collected corpus
    rows = [(r.doc_id, r.content or "") for r in corpus.collect()]
    from bertopic_spark.tokenizer import tokenize_one
    toks = {d: tokenize_one(t, "ascii_code") for d, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {}
    for v in toks.values():
        for t in set(v):
            dfs[t] = dfs.get(t, 0) + 1
    qts = {}
    for r in qterms.collect():
        qts.setdefault(r.query_id, set()).add(r.term)
    got = {(r.query_id, r["rank"]): (r.doc_id, round(r.score, 9))
           for r in one.collect()}
    assert got  # corpus-vocab queries must actually hit
    for qid, ts in qts.items():
        scored = []
        for d, v in toks.items():
            s = 0.0
            for t in ts & set(v):
                tf = v.count(t)
                idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
            if s > 0:
                scored.append((-s, d))
        for i, (negs, d) in enumerate(sorted(scored)[:5]):
            assert got[(qid, i + 1)] == (d, round(-negs, 9))
    zero = bm25f_topk(corpus, qterms, {"content": 1.0, "path": 0.0}, k=5,
                      _persisted_out=held2)
    a = [(r.query_id, r.doc_id, round(r.score, 9), r["rank"])
         for r in one.orderBy("query_id", "rank").collect()]
    bz = [(r.query_id, r.doc_id, round(r.score, 9), r["rank"])
          for r in zero.orderBy("query_id", "rank").collect()]
    assert a == bz
    for d in held1 + held2:
        d.unpersist()


def test_prf_expand_matches_manual_composition(spark, corpus_df):
    corpus = corpus_df
    from bertopic_spark.operators.bm25 import (bm25_topk, doc_scores,
                                               prf_expand_topk, queries_df,
                                               query_terms)

    qdf = queries_df(spark, {0: fixture_queries(12)[10],
                             1: fixture_queries(12)[11]})
    held = []
    got = [(r.query_id, r.doc_id, round(r.score, 9), r["rank"])
           for r in prf_expand_topk(corpus, qdf, r=3, m=2, k=5,
                                    _persisted_out=held)
           .orderBy("query_id", "rank").collect()]
    # manual two-round composition with driver-side expansion selection
    scores = doc_scores(corpus, persist_counts=False)
    qt = query_terms(qdf)
    base = {(r.query_id, r.doc_id) for r in bm25_topk(scores, qt, k=3).collect()}
    qsets = {}
    for r in qt.collect():
        qsets.setdefault(r.query_id, set()).add(r.term)
    fb = {}
    for r in scores.collect():
        for qid in qsets:
            if (qid, r.doc_id) in base and r.term not in qsets[qid]:
                fb[(qid, r.term)] = fb.get((qid, r.term), 0.0) + r.score
    weights = {}
    for qid, ts in qsets.items():
        for t in ts:
            weights[(qid, t)] = 1.0
        cand = sorted(((-w, t) for (q, t), w in fb.items() if q == qid))[:2]
        for _, t in cand:
            weights[(qid, t)] = 0.5
    hits = {}
    for r in scores.collect():
        for qid in qsets:
            w = weights.get((qid, r.term))
            if w:
                hits[(qid, r.doc_id)] = hits.get((qid, r.doc_id), 0.0) + w * r.score
    want = []
    for qid in sorted(qsets):
        top = sorted(((-s, d) for (q, d), s in hits.items() if q == qid))[:5]
        want.extend((qid, d, round(-negs, 9), i + 1)
                    for i, (negs, d) in enumerate(top))
    assert got == want
    for d in held:
        d.unpersist()


def test_passage_topk_brute(spark, corpus_df, qterms_small):
    import math

    from bertopic_spark.operators.bm25 import passage_topk
    from bertopic_spark.tokenizer import tokenize_one

    W, S, K1, B = 16, 8, 1.2, 0.75
    got = [(r.query_id, r.doc_id, r.start_pos, r.plen,
            round(r.score, 9), r["rank"])
           for r in passage_topk(corpus_df, qterms_small, window=W, stride=S,
                                 k=5).orderBy("query_id", "rank").collect()]
    rows = [(r.doc_id, tokenize_one(r.content or "", "ascii_code"))
            for r in corpus_df.select("doc_id", "content").collect()]
    n = len(rows)
    dfs = {}
    for _, ts in rows:
        for t in set(ts):
            dfs[t] = dfs.get(t, 0) + 1
    tot_pl = tot_nw = 0
    for _, ts in rows:
        for s in range(0, len(ts), S):
            tot_pl += min(W, len(ts) - s)
            tot_nw += 1
    avgpl = tot_pl / tot_nw
    qsets = {}
    for r in qterms_small.collect():
        qsets.setdefault(r.query_id, set()).add(r.term)
    want = []
    for qid in sorted(qsets):
        best = {}
        for d, ts in rows:
            for s in range(0, len(ts), S):
                win = ts[s:s + W]
                sc = 0.0
                for t in qsets[qid] & set(win):
                    tf = win.count(t)
                    idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                    sc += idf * tf * (K1 + 1) / (
                        tf + K1 * (1 - B + B * len(win) / avgpl))
                if sc > 0 and (d not in best or (-sc, s) < best[d][:2]):
                    best[d] = (-sc, s, len(win))
        top = sorted((negs, d, s, pl) for d, (negs, s, pl) in best.items())[:5]
        want.extend((qid, d, s, pl, round(-negs, 9), i + 1)
                    for i, (negs, d, s, pl) in enumerate(top))
    assert got == want
    with pytest.raises(ValueError):
        passage_topk(corpus_df, qterms_small, window=8, stride=9)


def test_stratified_independent_of_other_strata(spark, corpus_df, qterms_small):
    """Adding a foreign stratum must not move any existing ranking — the
    statistics are partition-local by construction."""
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import bm25_topk_stratified

    base = bm25_topk_stratified(corpus_df, qterms_small, "lang", k=5)
    rows = [(r.query_id, r.lang, r.doc_id, round(r.score, 9), r["rank"])
            for r in base.collect()]
    alien = (corpus_df
             .withColumn("lang", F.lit("zz_alien"))
             .withColumn("doc_id", F.col("doc_id") + 10**9))
    both = bm25_topk_stratified(corpus_df.unionByName(alien), qterms_small,
                                "lang", k=5)
    kept = [(r.query_id, r.lang, r.doc_id, round(r.score, 9), r["rank"])
            for r in both.filter(F.col("lang") != "zz_alien").collect()]
    assert sorted(rows) == sorted(kept)
    assert both.filter(F.col("lang") == "zz_alien").count() > 0


def test_prune_index_single_term_identity_and_shrink(spark, corpus_df):
    """Carmel uniform top-k pruning: single-term queries with k <= min_keep
    are rank-identical to the full index, and the relation shrinks."""
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import prune_index

    scores = doc_scores(corpus_df, mode=MODE).cache()
    pruned = prune_index(scores, keep_frac=0.05, min_keep=7).cache()
    assert pruned.count() < scores.count()
    # per-term cap actually enforced
    over = (pruned.groupBy("term").count()
            .join(scores.groupBy("term").agg(F.count(F.lit(1)).alias("dft")),
                  "term")
            .filter(F.col("count")
                    > F.greatest(F.lit(7), F.ceil(0.05 * F.col("dft")))))
    assert over.count() == 0
    # single-term queries from the corpus vocabulary (never hand-typed),
    # spanning frequent and rare terms
    terms = [r.term for r in (scores.groupBy("term")
                              .agg(F.count(F.lit(1)).alias("dft"))
                              .orderBy(F.desc("dft"), F.asc("term"))
                              .limit(200).collect())][::40]
    qt = spark.createDataFrame(list(enumerate(terms)),
                               "query_id long, term string")
    full = sorted((r.query_id, r["rank"], r.doc_id, round(r.score, 9))
                  for r in bm25_topk(scores, qt, k=7).collect())
    got = sorted((r.query_id, r["rank"], r.doc_id, round(r.score, 9))
                 for r in bm25_topk(pruned, qt, k=7).collect())
    assert got == full and got
    scores.unpersist(); pruned.unpersist()


def test_decay_topk_reorders_by_freshness(spark):
    """A stale high-relevance doc must lose to a fresh lower-relevance one
    once the gauss multiplier is applied, and the multiplier must be exactly
    0.5 at age == scale."""
    from bertopic_spark.operators.bm25 import decay_topk

    scores = spark.createDataFrame(
        [(1, "q", 1, 1.0), (2, "q", 1, 0.6)],
        "doc_id long, term string, tf long, score double")
    q = spark.createDataFrame([(0, "q")], "query_id long, term string")
    times = spark.createDataFrame(
        [(1, "2025-12-01"), (2, "2026-02-28")],  # ages 90 and 1 days
        "doc_id long, mtime string")
    out = {r["doc_id"]: r for r in decay_topk(
        scores, q, times, now="2026-03-01", scale_days=30, k=10).collect()}
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2
    assert out[1]["score"] == 1.0  # raw relevance is preserved alongside
    assert out[1]["decayed"] == 1.0 * 0.5 ** 9  # (90/30)^2 = 9, exact
    # age == scale → exactly half
    t30 = spark.createDataFrame([(1, "2026-01-30")],
                                "doc_id long, mtime string")
    one = decay_topk(scores, q, t30, now="2026-03-01",
                     scale_days=30, k=10).collect()
    assert one[0]["decayed"] == 0.5


def test_lm_jm_topk_hand_value(spark):
    """Exact Jelinek-Mercer score on a 2-doc corpus, plus candidate pruning
    (zero-match docs absent) and OOV-term dropout."""
    import math

    from bertopic_spark.operators.bm25 import lm_jm_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "aa"), (0, "zz")],
                              "query_id long, term string")
    out = lm_jm_topk(docs, q, k=10, lam=0.1).collect()
    # only doc 1 matches; zz is OOV and contributes nothing
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in out] == [(0, 1, 1)]
    lam, tf, dl, cf, total = 0.1, 2, 3, 2, 6
    want = math.log(1.0 + ((1 - lam) / lam) * (tf / dl) / (cf / total))
    assert abs(out[0]["score"] - want) < 1e-12
    with pytest.raises(ValueError):
        lm_jm_topk(docs, q, lam=1.0)


def test_dfr_pl2_hand_value(spark):
    """Exact PL2 score on a tiny corpus (natural-log formulation) plus
    OOV dropout and zero-match pruning."""
    import math

    from bertopic_spark.operators.bm25 import dfr_pl2_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "aa"), (0, "zz")],
                              "query_id long, term string")
    out = dfr_pl2_topk(docs, q, k=10, c=1.0).collect()
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in out] == [(0, 1, 1)]
    tf, dl, cf, n, avg = 2, 3, 2, 2, 3.0
    tfn = tf * math.log(1.0 + avg / dl)
    lam = cf / n
    want = (tfn * math.log(tfn / lam) + (lam - tfn)
            + 0.5 * math.log(2.0 * math.pi * tfn)) / (tfn + 1)
    assert abs(out[0]["score"] - want) < 1e-12
    with pytest.raises(ValueError):
        dfr_pl2_topk(docs, q, c=0.0)


def test_dfi_self_pruning_and_hand_value(spark):
    """DFI scores only tf above the independence expectation dl*cf/T —
    a term spread evenly over all docs contributes nothing anywhere."""
    import math

    from bertopic_spark.operators.bm25 import dfi_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    # 'bb' appears once in each doc: e = dl*cf/T = 3*2/6 = 1 = tf → 0
    q_bb = spark.createDataFrame([(0, "bb")], "query_id long, term string")
    assert dfi_topk(docs, q_bb, k=10).count() == 0
    q_aa = spark.createDataFrame([(0, "aa")], "query_id long, term string")
    out = dfi_topk(docs, q_aa, k=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(1, 1)]
    tf, e = 2, 3 * 2 / 6
    want = math.log(1.0 + (tf - e) / math.sqrt(e))
    assert abs(out[0]["score"] - want) < 1e-12


def test_ib_hand_values_and_spl_guard(spark):
    """Exact LL and SPL information-based scores; SPL guard: a term in
    every doc (λ=1) scores 0 instead of dividing by zero."""
    import math

    from bertopic_spark.operators.bm25 import ib_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "aa")], "query_id long, term string")
    tf, dl, df, n, avg = 2, 3, 1, 2, 3.0
    tfn = tf * math.log(1.0 + avg / dl)
    lam = (df + 1) / (n + 1)
    out = ib_topk(docs, q, k=10, distribution="ll").collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(1, 1)]
    assert abs(out[0]["score"] - math.log(1.0 + tfn / lam)) < 1e-12
    out = ib_topk(docs, q, k=10, distribution="spl").collect()
    want = -math.log((lam ** (tfn / (tfn + 1)) - lam) / (1.0 - lam))
    assert abs(out[0]["score"] - want) < 1e-12
    # 'bb' is in both docs → λ = (2+1)/(2+1) = 1 → SPL guard yields 0
    q_bb = spark.createDataFrame([(0, "bb")], "query_id long, term string")
    rows = ib_topk(docs, q_bb, k=10, distribution="spl").collect()
    assert all(r["score"] == 0.0 for r in rows)
    with pytest.raises(ValueError):
        ib_topk(docs, q, distribution="pareto")


def test_axiomatic_hand_values_and_variants(spark):
    """Exact F2EXP score; F2LOG differs only in the idf factor."""
    import math

    from bertopic_spark.operators.bm25 import axiomatic_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "aa")], "query_id long, term string")
    tf, dl, df, n, avg, s = 2, 3, 1, 2, 3.0, 0.5
    tfpart = tf / (tf + s + s * dl / avg)
    out = axiomatic_topk(docs, q, k=10, variant="f2exp").collect()
    assert abs(out[0]["score"] - ((n + 1) / df) ** 0.35 * tfpart) < 1e-12
    out = axiomatic_topk(docs, q, k=10, variant="f2log").collect()
    assert abs(out[0]["score"] - math.log((n + 1) / df) * tfpart) < 1e-12
    with pytest.raises(ValueError):
        axiomatic_topk(docs, q, variant="f3exp")


def test_classic_tfidf_hand_value(spark):
    """Exact Lucene-ClassicSimilarity score on a tiny corpus: sqrt(tf) ·
    (1+ln((N+1)/(df+1)))² / sqrt(dl); OOV dropout and zero-match pruning."""
    import math

    from bertopic_spark.operators.bm25 import classic_tfidf_topk

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc dd")],
        "doc_id long, content string")
    q = spark.createDataFrame([(0, "aa"), (0, "zz")],
                              "query_id long, term string")
    out = classic_tfidf_topk(docs, q, k=10).collect()
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in out] == [(0, 1, 1)]
    tf, dl, df, n = 2, 3, 1, 2
    idf = 1.0 + math.log((n + 1) / (df + 1))
    want = math.sqrt(tf) * idf * idf / math.sqrt(dl)
    assert abs(out[0]["score"] - want) < 1e-12
    # multi-term: contributions sum per doc
    q2 = spark.createDataFrame([(0, "aa"), (0, "bb")],
                               "query_id long, term string")
    out2 = {r["doc_id"]: r["score"]
            for r in classic_tfidf_topk(docs, q2, k=10).collect()}
    idf_bb = 1.0 + math.log((n + 1) / (2 + 1))
    want1 = want + math.sqrt(1) * idf_bb * idf_bb / math.sqrt(3)
    assert abs(out2[1] - want1) < 1e-12
    assert abs(out2[2] - idf_bb * idf_bb / math.sqrt(3)) < 1e-12


def test_common_terms_candidates_and_fallback(spark):
    from bertopic_spark.operators.bm25 import bm25_topk, common_terms_topk

    # "stop" is in 4/5 docs (common at max_df=0.5); "rare" in one.
    docs = spark.createDataFrame(
        [(1, "stop rare x"), (2, "stop y"), (3, "stop z"),
         (4, "stop w"), (5, "other v")],
        "doc_id long, content string")
    scores = doc_scores(docs)
    q = spark.createDataFrame([(0, "stop"), (0, "rare")],
                              "query_id long, term string")
    out = common_terms_topk(scores, q, k=10, max_df=0.5).collect()
    # only doc 1 admitted (via "rare"); its score still includes "stop"
    assert [r["doc_id"] for r in out] == [1]
    both = {r["doc_id"]: r["score"]
            for r in bm25_topk(scores, q, 10).collect()}
    assert abs(out[0]["score"] - both[1]) < 1e-12
    # all-common query falls back to the plain disjunction
    q2 = spark.createDataFrame([(1, "stop")], "query_id long, term string")
    fb = common_terms_topk(scores, q2, k=10, max_df=0.5)
    plain = bm25_topk(scores, q2, 10)
    assert sorted((r["doc_id"], r["rank"]) for r in fb.collect()) == \
        sorted((r["doc_id"], r["rank"]) for r in plain.collect())
    # the n_docs shortcut (caller-supplied N, no count_distinct job)
    # resolves the same fractional cutoff: identical output both ways
    fast = common_terms_topk(scores, q, k=10, max_df=0.5, n_docs=5).collect()
    assert [(r["doc_id"], r["rank"], r["score"]) for r in fast] == \
        [(r["doc_id"], r["rank"], r["score"]) for r in out]


def test_rank_eval_hand_values(spark):
    from pyspark.sql import functions as F
    from bertopic_spark.operators.bm25 import rank_eval

    # q0: ranked [10, 11, 12]; 10 and 12 relevant (grades 2, 1), one judged
    # relevant doc (13, grade 3) missed entirely. q1: nothing relevant.
    hits = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),
         (1, 20, 1), (1, 21, 2)],
        "query_id long, doc_id long, rank int")
    judg = spark.createDataFrame(
        [(0, 10, 2.0), (0, 12, 1.0), (0, 13, 3.0)],
        "query_id long, doc_id long, grade double")
    out = {r["query_id"]: r for r in rank_eval(hits, judg, k=3).collect()}
    import math
    r0 = out[0]
    assert abs(r0["p_at_k"] - 2 / 3) < 1e-12
    assert abs(r0["recall_at_k"] - 2 / 3) < 1e-12
    assert abs(r0["mrr"] - 1.0) < 1e-12
    dcg = (2**2 - 1) / math.log2(2) + 0.0 + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert abs(r0["dcg_at_k"] - dcg) < 1e-12
    assert abs(r0["ndcg_at_k"] - dcg / idcg) < 1e-12
    r1 = out[1]
    assert r1["p_at_k"] == 0.0 and r1["recall_at_k"] == 0.0
    assert r1["mrr"] == 0.0 and r1["ndcg_at_k"] == 0.0
    # perfect ranking of the full judged set scores NDCG = 1
    ph = spark.createDataFrame(
        [(0, 13, 1), (0, 10, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank int")
    perfect = rank_eval(ph, judg, k=3).collect()[0]
    assert abs(perfect["ndcg_at_k"] - 1.0) < 1e-12
    assert abs(perfect["recall_at_k"] - 1.0) < 1e-12


def test_explain_score_invariants(spark, corpus_df, queries):
    """ES _explain analog: per-term rows of each ranked hit sum exactly to
    the hit's doc_score; contributions sum to 1; the explained hit set is
    exactly bm25_topk's."""
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import explain_score
    from bertopic_spark.operators.ctfidf import ctfidf, term_stats
    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(corpus_df, "content", ["doc_id"], MODE,
                        with_len=True).withColumnRenamed(
        "doc_len", "class_len").cache()
    stats = term_stats(x, ["doc_id"], bm25_weighting=True)
    scores = ctfidf(x, ["doc_id"], bm25_weighting=True, stats=stats).cache()
    qt = query_terms(queries_df(spark, queries), MODE)

    exp = explain_score(scores, stats, qt, k=5).cache()
    agg = (exp.groupBy("query_id", "doc_id", "rn", "doc_score")
           .agg(F.sum("term_score").alias("s"),
                F.sum("contribution").alias("c")).collect())
    assert agg, "explain returned nothing"
    for r in agg:
        assert abs(r.s - r.doc_score) < 1e-9
        assert abs(r.c - 1.0) < 1e-9

    want = {(r.query_id, r.doc_id, r.rank) for r in
            bm25_topk(scores, qt, k=5).collect()}
    got = {(r.query_id, r.doc_id, r.rn) for r in
           exp.select("query_id", "doc_id", "rn").distinct().collect()}
    assert got == want
    for h in (exp, scores, x):
        h.unpersist()


def test_linear_fuse(spark):
    from bertopic_spark.operators.bm25 import linear_fuse
    a = spark.createDataFrame([(0, 1, 10.0), (0, 2, 5.0), (0, 3, 0.0)],
                              "query_id long, doc_id long, score double")
    b = spark.createDataFrame([(0, 2, 0.9), (0, 4, 0.4)],
                              "query_id long, doc_id long, score double")
    got = {r["doc_id"]: r["score"] for r in
           linear_fuse([a, b], weights=[0.7, 0.3], k=10).collect()}
    # a normalizes to 1/0.5/0; b to 1.0/0.0
    assert got[1] == pytest.approx(0.7)
    assert got[2] == pytest.approx(0.7 * 0.5 + 0.3 * 1.0)
    assert got[3] == pytest.approx(0.0)
    assert got[4] == pytest.approx(0.0)
    # single-result leg normalizes to 1.0
    c = spark.createDataFrame([(0, 9, 42.0)],
                              "query_id long, doc_id long, score double")
    one = {r["doc_id"]: r["score"] for r in linear_fuse([c], k=5).collect()}
    assert one == {9: 1.0}
    import pytest as _pt
    with _pt.raises(ValueError, match="weights"):
        linear_fuse([a, b], weights=[1.0])


def test_bm25plus_floor_and_okapi_delta0(spark):
    from bertopic_spark.operators.bm25 import (bm25plus_topk, okapi_bm25_topk,
                                               queries_df, query_terms)
    rows = [(0, "join " + "filler " * 200), (1, "join"), (2, "nothing")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    qt = query_terms(queries_df(spark, {0: "join"}), "ascii_code")
    # delta=0 reduces exactly to Okapi
    p0 = {r["doc_id"]: r["score"] for r in
          bm25plus_topk(d, qt, k=10, delta=0.0, text_col="text").collect()}
    ok = {r["doc_id"]: r["score"] for r in
          okapi_bm25_topk(d, qt, k=10, text_col="text").collect()}
    assert p0 == pytest.approx(ok)
    # delta floor: every match gains exactly delta * idf
    import math
    p1 = {r["doc_id"]: r["score"] for r in
          bm25plus_topk(d, qt, k=10, delta=1.0, text_col="text").collect()}
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    for did in (0, 1):
        assert p1[did] == pytest.approx(ok[did] + idf, rel=1e-12)
    import pytest as _pt
    with _pt.raises(ValueError, match="delta"):
        bm25plus_topk(d, qt, delta=-1.0)


def test_terms_set_per_doc_threshold(spark):
    from bertopic_spark.operators.bm25 import terms_set_match
    from pyspark.sql import functions as F
    rows = [(0, "hash join"), (1, "hash join merge"), (2, "hash"),
            (3, "none of them")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # per-doc msm: doc0 needs 3 (fails with 2), doc1 needs 2 (passes w/ 3)
    msm = F.when(F.col("doc_id") == 0, 3).otherwise(2)
    got = {r["doc_id"]: (r["n_matched"], r["msm_required"]) for r in
           terms_set_match(d, ["hash", "join", "merge"], msm,
                           text_col="text").collect()}
    assert got == {1: (3, 2)}
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        terms_set_match(d, [], msm, text_col="text")


def test_function_score_modes(spark):
    from pyspark.sql import functions as F
    from bertopic_spark.operators.bm25 import (field_value_factor_topk,
                                               function_score_topk,
                                               queries_df, query_terms)
    rows = [(0, "join alpha", 10.0), (1, "join beta", 100.0)]
    d = spark.createDataFrame(rows, "doc_id long, text string, pop double")
    qt = query_terms(queries_df(spark, {0: "join"}), "ascii_code")
    # single ln1p function == field_value_factor
    one = {r["doc_id"]: r["score"] for r in
           function_score_topk(d, qt, [F.log1p(F.col("pop"))],
                               text_col="text").collect()}
    fvf = {r["doc_id"]: r["score"] for r in
           field_value_factor_topk(d, qt, "pop", factor=1.0,
                                   modifier="ln1p", text_col="text").collect()}
    assert one == pytest.approx(fvf)
    # score_mode=max picks the larger weighted function; boost_mode=replace
    rep = {r["doc_id"]: r["score"] for r in
           function_score_topk(d, qt, [F.col("pop"), F.lit(50.0)],
                               score_mode="max", boost_mode="replace",
                               text_col="text").collect()}
    assert rep == {0: 50.0, 1: 100.0}
    import pytest as _pt
    with _pt.raises(ValueError, match="score_mode"):
        function_score_topk(d, qt, [F.col("pop")], score_mode="median")


def test_bq_hamming(spark):
    from bertopic_spark.operators.similarity import bq_hamming_topk
    import numpy as np
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(64).tolist()) for i in range(30)]
    # vec 20 = exact copy of query 0 -> hamming 0, cos 1.0, rank 1
    rows[20] = (20, rows[0][1])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = bq_hamming_topk(emb, [0], k=5, rerank=10).collect()
    top = got[0]
    assert (top["vec_id"], top["hamming"], top["cos"]) == (20, 0, 1.0)
    import pytest as _pt
    with _pt.raises(ValueError, match="rerank"):
        bq_hamming_topk(emb, [0], k=10, rerank=5)


def test_weighted_rrf_degrades_to_plain(spark):
    from bertopic_spark.operators.bm25 import rrf_fuse, weighted_rrf_fuse

    l1 = spark.createDataFrame([(0, 1, 1), (0, 2, 2)],
                               "query_id long, doc_id long, rank long")
    l2 = spark.createDataFrame([(0, 2, 1), (0, 3, 2)],
                               "query_id long, doc_id long, rank long")
    plain = sorted(map(tuple, rrf_fuse([l1, l2], k0=60, k=5).collect()))
    unit = sorted(map(tuple, weighted_rrf_fuse([l1, l2], [1.0, 1.0],
                                               k0=60, k=5).collect()))
    assert plain == unit
    # a heavy second leg promotes its exclusive doc above the shared one?
    heavy = {r["doc_id"]: r["rank"] for r in weighted_rrf_fuse(
        [l1, l2], [0.1, 10.0], k0=60, k=5).collect()}
    assert heavy[3] < heavy[1]  # leg-2's doc 3 now outranks leg-1's doc 1
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_rrf_fuse([l1, l2], [1.0])
    with _pt.raises(ValueError):
        weighted_rrf_fuse([l1], [-1.0])

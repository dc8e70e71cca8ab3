"""RM3 pseudo-relevance feedback (operators/bm25.rm3_topk): a full local
replay of the two-round pipeline on a tiny corpus, plus the λ=1 collapse
property (pure query likelihood, rank-identical to lm_topk)."""

import math

import pytest

from bertopic_spark.operators.bm25 import lm_topk, queries_df, query_terms, rm3_topk

MU = 50.0


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark index spark query merge"),
        (1, "index build merge merge"),
        (2, "query plan query plan query"),
        (3, "unrelated words entirely different"),
        (4, "spark merge plan build"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def _local_rm3(corpus_rows, qtext, r, m, lam, mu, k):
    docs = {i: t.split() for i, t in corpus_rows}
    cf = {}
    for ts in docs.values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    total = sum(cf.values())

    def ql(weights):  # weights: term -> w over in-vocab terms
        ws = sum(weights.values())
        out = {}
        for d, ts in docs.items():
            matched = {t: ts.count(t) for t in weights if t in ts}
            if not matched:
                continue
            s = sum(w * math.log(1 + matched[t] * total / (mu * cf[t]))
                    for t, w in weights.items() if t in matched)
            out[d] = s + ws * math.log(mu / (len(ts) + mu))
        return out

    qv = sorted({t for t in qtext.split() if t in cf})
    r1 = {d: round(s, 6) for d, s in ql({t: 1.0 for t in qv}).items()}
    fb = sorted(r1, key=lambda d: (-r1[d], d))[:r]
    mx = max(r1[d] for d in fb)
    es = {d: math.exp(r1[d] - mx) for d in fb}
    z = sum(es.values())
    post = {d: round(es[d] / z, 9) for d in fb}
    rm1 = {}
    for d in fb:
        ts = docs[d]
        for t in set(ts):
            rm1[t] = rm1.get(t, 0.0) + post[d] * ts.count(t) / len(ts)
    rm1 = {t: round(w, 9) for t, w in rm1.items()}
    kept = sorted(rm1, key=lambda t: (-rm1[t], t))[:m]
    zz = sum(rm1[t] for t in kept)
    wgt = {t: lam / len(qv) for t in qv}
    for t in kept:
        wgt[t] = wgt.get(t, 0.0) + (1 - lam) * rm1[t] / zz
    wgt = {t: round(w, 9) for t, w in wgt.items() if round(w, 9) > 0}
    s2 = ql(wgt)
    ranked = sorted(s2, key=lambda d: (-s2[d], d))[:k]
    return [(d, round(s2[d], 6)) for d in ranked]


def test_rm3_matches_local_replay(spark, corpus):
    qdf = queries_df(spark, {0: "spark query"})
    got = (rm3_topk(corpus, qdf, r=2, m=3, lam=0.5, k=5, mu=MU)
           .orderBy("rank").collect())
    want = _local_rm3(
        [(r["doc_id"], r["content"]) for r in corpus.collect()],
        "spark query", r=2, m=3, lam=0.5, mu=MU, k=5)
    assert [(r["doc_id"], round(r["score"], 6)) for r in got] == want


def test_rm3_lambda_one_is_pure_ql(spark, corpus):
    """λ=1 keeps only the uniform original-query model — scores scale by
    1/|q∩V| but ranks are identical to lm_topk."""
    qdf = queries_df(spark, {0: "spark query", 1: "merge build"})
    qt = query_terms(qdf)
    base = {(r["query_id"], r["rank"]): r["doc_id"]
            for r in lm_topk(corpus, qt, k=4, mu=MU).collect()}
    got = {(r["query_id"], r["rank"]): r["doc_id"]
           for r in rm3_topk(corpus, qdf, r=2, m=3, lam=1.0, k=4,
                             mu=MU).collect()}
    assert got == base


def test_rm3_expansion_recalls_unmatched_doc(spark, corpus):
    """'plan'-only query: doc 1 shares no original term but shares 'merge'
    with feedback docs — RM3 expansion must give it a score."""
    qdf = queries_df(spark, {0: "plan"})
    got = rm3_topk(corpus, qdf, r=2, m=4, lam=0.3, k=5, mu=MU).collect()
    assert 1 in {r["doc_id"] for r in got}


def test_rm3_validates_params(spark, corpus):
    qdf = queries_df(spark, {0: "spark"})
    with pytest.raises(ValueError):
        rm3_topk(corpus, qdf, r=0)
    with pytest.raises(ValueError):
        rm3_topk(corpus, qdf, lam=1.5)
    with pytest.raises(ValueError):
        rm3_topk(corpus, qdf, mu=0.0)

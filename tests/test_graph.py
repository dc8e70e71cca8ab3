"""Link-analysis operators (operators/graph.py): weighted PageRank against
a local numpy reference (directed graph with a dangling node — the
stochastic fix-up case), probability-mass invariants, vocabulary-pruned
co-occurrence edges, TextRank keyword extraction."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.graph import (cooccurrence_edges, pagerank,
                                            textrank_keywords, top_vocab)

DAMP, ITERS = 0.85, 20
EDGES = [(1, 2, 1.0), (1, 3, 2.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0)]
NODES = [1, 2, 3, 4]  # node 4 is dangling (no out-edges)


def _numpy_pagerank():
    wdeg = {u: sum(w for (a, _, w) in EDGES if a == u) for u in NODES}
    r = {u: 1.0 / len(NODES) for u in NODES}
    for _ in range(ITERS):
        dang = sum(r[u] for u in NODES if wdeg.get(u, 0) == 0)
        nxt = {}
        for v in NODES:
            mass = sum(r[a] * w / wdeg[a] for (a, b, w) in EDGES if b == v)
            nxt[v] = (1 - DAMP) / len(NODES) + DAMP * (dang / len(NODES) + mass)
        r = nxt
    return r


def test_pagerank_matches_numpy_directed_dangling(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long, w double")
    got = {r["node"]: r["score"]
           for r in pagerank(e, DAMP, ITERS, undirected=False).collect()}
    want = _numpy_pagerank()
    assert set(got) == set(want)
    for u in NODES:
        assert got[u] == pytest.approx(want[u], abs=1e-12)
    # stochastic fix-up: total probability mass is preserved exactly
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_undirected_mass_and_symmetry(spark):
    # path graph a-b-c with equal weights: a and c are symmetric
    e = spark.createDataFrame([("a", "b", 1.0), ("b", "c", 1.0)],
                              "src string, dst string, w double")
    got = {r["node"]: r["score"] for r in pagerank(e, iters=30).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["a"] == pytest.approx(got["c"], abs=1e-12)
    assert got["b"] > got["a"]


def test_pagerank_checkpoint_storage_bounded(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long, w double")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    pagerank(e, iters=12, checkpoint_every=3, undirected=False).collect()
    # the trans relation and all but the live rank generation are released
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after - before <= 1


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"alpha beta {'gamma' if i % 2 else 'delta'} tok{i % 7}")
            for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_vocab_rank_deterministic(docs):
    v = top_vocab(docs, "text", "doc_id", v=4).collect()
    got = [(r["term"], r["df"], r["vrank"]) for r in
           sorted(v, key=lambda r: r["vrank"])]
    # alpha/beta df=40 (tie → term asc), then gamma 20 before delta 20
    assert got == [("alpha", 40, 1), ("beta", 40, 2),
                   ("delta", 20, 3), ("gamma", 20, 4)]


def test_cooccurrence_edges_pruned_and_counted(docs):
    e = {(r["src"], r["dst"]): r["w"] for r in
         cooccurrence_edges(docs, "text", "doc_id", v=4).collect()}
    # only top-4 vocab participates: no tok* vertices
    assert all(not s.startswith("tok") and not d.startswith("tok")
               for s, d in e)
    assert e[("alpha", "beta")] == 40
    assert e[("alpha", "delta")] == 20 and e[("beta", "gamma")] == 20
    assert ("delta", "gamma") not in e  # never co-occur
    assert all(s < d for s, d in e)


def test_textrank_keywords_shape(docs):
    out = textrank_keywords(docs, "text", "doc_id", k=4, v=4, iters=5)
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    assert rows[0]["term"] in ("alpha", "beta")  # hub terms rank first
    # deterministic across invocations
    again = textrank_keywords(docs, "text", "doc_id", k=4, v=4, iters=5)
    assert [tuple(r) for r in rows] == [tuple(r) for r in again.orderBy("rank").collect()]


def test_pagerank_empty_graph(spark):
    e = spark.createDataFrame([], "src long, dst long, w double")
    assert pagerank(e, iters=2).count() == 0


def test_grouped_pagerank_matches_per_group_scalar(spark):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.graph import (cooccurrence_edges_grouped,
                                                pagerank_grouped)

    docs = spark.createDataFrame(
        [(1, "a", "alpha beta gamma"), (2, "a", "alpha beta"),
         (3, "b", "delta epsilon"), (4, "b", "delta epsilon zeta"),
         (5, "b", "zeta delta")],
        "doc_id long, lang string, text string")
    ge = cooccurrence_edges_grouped(docs, "text", "doc_id", ["lang"], v=10)
    got = {(r["lang"], r["node"]): r["score"] for r in
           pagerank_grouped(ge, ["lang"], iters=8).collect()}
    for lang in ("a", "b"):
        sub = docs.filter(F.col("lang") == lang)
        e = cooccurrence_edges(sub, "text", "doc_id", v=10)
        ref = {r["node"]: r["score"] for r in pagerank(e, iters=8).collect()}
        assert set(ref) == {n for (g, n) in got if g == lang}
        for n, s in ref.items():
            assert got[(lang, n)] == pytest.approx(s, abs=1e-12)
        assert sum(v for (g, _), v in got.items()
                   if g == lang) == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError, match="group_cols"):
        pagerank_grouped(ge, [], iters=2)


def _numpy_hits(iters=4):
    import math
    h = {u: 1.0 for u in NODES}
    a = {u: 0.0 for u in NODES}
    for _ in range(iters):
        a = {v: sum(h[s] * w for (s, d, w) in EDGES if d == v) for v in NODES}
        nrm = math.sqrt(sum(x * x for x in a.values()))
        a = {v: (x / nrm if nrm > 0 else 0.0) for v, x in a.items()}
        h = {u: sum(a[d] * w for (s, d, w) in EDGES if s == u) for u in NODES}
        nrm = math.sqrt(sum(x * x for x in h.values()))
        h = {u: (x / nrm if nrm > 0 else 0.0) for u, x in h.items()}
    return a, h


def test_hits_matches_numpy_weighted(spark):
    from bertopic_spark.operators.graph import hits

    e = spark.createDataFrame(EDGES, "src long, dst long, w double")
    rows = hits(e, iters=4).collect()
    got_a = {r["node"]: r["authority"] for r in rows}
    got_h = {r["node"]: r["hub"] for r in rows}
    want_a, want_h = _numpy_hits(4)
    assert set(got_a) == set(NODES)
    for u in NODES:
        assert got_a[u] == pytest.approx(want_a[u], abs=1e-12)
        assert got_h[u] == pytest.approx(want_h[u], abs=1e-12)
    # structural zero: node 4 has no out-edges, so hub exactly 0
    assert got_h[4] == 0.0
    # each vector is exactly unit L2 after its final half-step
    assert sum(v * v for v in got_a.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(v * v for v in got_h.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_storage_bounded_and_validates(spark):
    from bertopic_spark.operators.graph import hits

    e = spark.createDataFrame(EDGES, "src long, dst long, w double")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    hits(e, iters=6).collect()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after - before <= 2  # live authority+hub generation only
    with pytest.raises(ValueError, match="iters"):
        hits(e, iters=0)


def test_bigram_edges_directed_counts(spark):
    from bertopic_spark.operators.graph import bigram_edges

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, "beta alpha beta"),
         (3, "alpha alpha rare1 rare2")],
        "doc_id long, text string")
    e = {(r["src"], r["dst"]): r["w"] for r in
         bigram_edges(docs, "text", "doc_id", v=2, min_w=1).collect()}
    # direction preserved: alpha->beta 3 (doc1 x2, doc2 x1)... doc1 has
    # [alpha beta alpha beta] -> ab, ba, ab; doc2 [beta alpha beta] -> ba, ab
    assert e[("alpha", "beta")] == 3
    assert e[("beta", "alpha")] == 2
    # self-loop kept (doc3 alpha alpha); rare terms pruned by vocab
    assert e[("alpha", "alpha")] == 1
    assert all("rare" not in s and "rare" not in d for s, d in e)

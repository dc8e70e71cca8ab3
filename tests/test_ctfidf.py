"""c-TF-IDF: Spark implementation vs local oracle, term-for-term.

Mirrors the reference's own unit-test assertions
(tests/test_vectorizers/test_ctfidf.py:23-54): row count == #classes,
vocab width, nonnegativity (default variant), plus the stronger gate the
north rule demands — top-30 keywords per class equal to the oracle
term-for-term, scores at 1e-9.
"""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark import oracle
from bertopic_spark.operators.ctfidf import avg_nr_samples, ctfidf, term_stats, top_k_terms
from bertopic_spark.operators.postings import class_term_counts, doc_term_counts

MODE = "code_aware"
CONFIGS = [(False, False), (False, True), (True, False), (True, True)]


@pytest.fixture(scope="module")
def spark_x(corpus_df):
    dt = doc_term_counts(corpus_df, "content", ["lang", "repo", "doc_id"], MODE)
    return class_term_counts(dt, ["lang", "repo"]).cache()


@pytest.fixture(scope="module")
def oracle_x(corpus_rows):
    docs = [r["content"] for r in corpus_rows]
    classes = [(r["lang"], r["repo"]) for r in corpus_rows]
    return oracle.bow_per_class(docs, classes, MODE)


def test_bow_matches_oracle(spark_x, oracle_x):
    got = {((r["lang"], r["repo"]), r["term"]): r["tf"] for r in spark_x.collect()}
    want = {(c, t): tf for c, cnt in oracle_x.items() for t, tf in cnt.items()}
    assert got == want


def test_shapes_match_reference_invariants(spark_x, oracle_x):
    n_classes = spark_x.select("lang", "repo").distinct().count()
    assert n_classes == len(oracle_x)
    vocab = spark_x.select("term").distinct().count()
    # reference test_ctfidf.py:42 invariant (vocab > 1000) holds for the
    # unsplit analyzer; code_aware splitting collapses identifiers to stems.
    assert vocab > 500


def test_unsplit_vocab_scale_invariant(corpus_rows):
    from bertopic_spark.tokenizer import tokenize_many

    vocab = set()
    for toks in tokenize_many([r["content"] for r in corpus_rows], "ascii_code"):
        vocab.update(toks)
    assert len(vocab) > 1000  # reference test_ctfidf.py:42 scale invariant



def test_avg_nr_samples_int_truncation(spark_x, oracle_x):
    got = avg_nr_samples(spark_x, ["lang", "repo"]).collect()[0][0]
    sizes = [sum(c.values()) for c in oracle_x.values()]
    assert got == int(sum(sizes) / len(sizes))


@pytest.mark.parametrize("bm25,reduce_freq", CONFIGS)
def test_scores_and_topk_match_oracle(spark_x, oracle_x, bm25, reduce_freq):
    want = oracle.ctfidf_scores(oracle_x, bm25, reduce_freq, clamp=1e-10)
    scores = ctfidf(spark_x, ["lang", "repo"], bm25, reduce_freq)
    got = {}
    for r in scores.collect():
        got[((r["lang"], r["repo"]), r["term"])] = r["score"]
    assert len(got) == sum(len(v) for v in want.values())
    for c, row in want.items():
        for t, v in row.items():
            assert got[(c, t)] == pytest.approx(v, abs=1e-9), (c, t)
    if not bm25:
        assert all(v >= 0 for v in got.values())
    # top-30 keywords term-for-term (north-star gate)
    want_top = oracle.top_k_terms(want, 30)
    topk = top_k_terms(scores, ["lang", "repo"], 30).collect()
    got_top = {}
    for r in topk:
        got_top.setdefault((r["lang"], r["repo"]), []).append((r["rank"], r["term"], r["score"]))
    for c, pairs in want_top.items():
        g = [t for _, t, _ in sorted(got_top[c])]
        assert g == [t for t, _ in pairs], c


def test_idf_formulas_tiny():
    # hand-computable: classes A, B
    x = {"A": {"t1": 2, "t2": 1}, "B": {"t1": 1, "t3": 3}}
    # sizes: 3, 4 → avg = int(3.5) = 3
    stats = oracle.idf_vector(x, bm25_weighting=False)
    assert stats["t1"] == pytest.approx(math.log(3 / 3 + 1))
    assert stats["t3"] == pytest.approx(math.log(3 / 3 + 1))
    assert stats["t2"] == pytest.approx(math.log(3 / 1 + 1))
    b = oracle.idf_vector(x, bm25_weighting=True)
    assert b["t2"] == pytest.approx(math.log(1 + (3 - 1 + 0.5) / 1.5))


def test_bm25_clamp_matches_between_engines(spark):
    # a term so frequent the bm25 log-arg goes negative → clamp path
    rows = [(0, "A", "the " * 50 + "rare"), (1, "B", "the " * 50 + "other")]
    df = spark.createDataFrame(rows, "doc_id long, cls string, content string")
    dt = doc_term_counts(df, "content", ["cls", "doc_id"], "ascii_code")
    x = class_term_counts(dt, ["cls"])
    got = {r["term"]: r["idf"] for r in
           term_stats(x, ["cls"], bm25_weighting=True).collect()}
    # df(the)=100, avg=51 → arg = 1 + (51-100+.5)/100.5 < 1 but > 0
    assert got["the"] == pytest.approx(math.log(1 + (51 - 100 + 0.5) / 100.5))
    docs = {r["term"]: r["df"] for r in
            term_stats(x, ["cls"], bm25_weighting=True).collect()}
    assert docs["the"] == 100

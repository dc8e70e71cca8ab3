"""DSIR importance resampling: hand-checked log-weight arithmetic,
target-affinity ordering, Gumbel top-n determinism."""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.pipeline import (dsir_logweights, dsir_sample,
                                               hashed_ngram_buckets)
from bertopic_spark.tokenizer import tokenize_one

MODE = "ascii_code"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_buckets_match_python(spark):
    rows = [(0, "alpha beta gamma"), (1, "beta beta"), (2, "")]
    got = {(r.doc_id, r.bucket): r.cnt
           for r in hashed_ngram_buckets(
               _docs(spark, rows), n_buckets=32, mode=MODE,
               seed=13).collect()}
    import hashlib
    want = {}
    for did, text in rows:
        toks = tokenize_one(text, MODE)
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for gmm in grams:
            h = int(hashlib.md5(f"13_{gmm}".encode()).hexdigest()[:15], 16)
            key = (did, h % 32)
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_logweights_hand_math(spark):
    raw = _docs(spark, [(0, "aa aa"), (1, "zz zz")])
    tgt = _docs(spark, [(10, "aa aa")])
    B, alpha = 64, 1.0
    w = {r.doc_id: r for r in dsir_logweights(
        raw, tgt, n_buckets=B, alpha=alpha, mode=MODE, seed=13).collect()}
    import hashlib

    def bucket(g):
        return int(hashlib.md5(f"13_{g}".encode()).hexdigest()[:15],
                   16) % B
    # raw model: buckets of aa(x2), aa aa, zz(x2), zz zz → counts
    qc, pc = {}, {}
    for g, c in [("aa", 2), ("aa aa", 1), ("zz", 2), ("zz zz", 1)]:
        qc[bucket(g)] = qc.get(bucket(g), 0) + c
    for g, c in [("aa", 2), ("aa aa", 1)]:
        pc[bucket(g)] = pc.get(bucket(g), 0) + c
    qt, pt = sum(qc.values()), sum(pc.values())

    def lr(b):
        return (math.log((pc.get(b, 0) + alpha) / (pt + alpha * B))
                - math.log((qc.get(b, 0) + alpha) / (qt + alpha * B)))
    want0 = 2 * lr(bucket("aa")) + 1 * lr(bucket("aa aa"))
    want1 = 2 * lr(bucket("zz")) + 1 * lr(bucket("zz zz"))
    assert w[0].logw == pytest.approx(want0, abs=1e-9)
    assert w[1].logw == pytest.approx(want1, abs=1e-9)
    assert w[0].logw > w[1].logw  # target-like doc upweighted
    assert w[0].n_grams == 3 and w[1].n_grams == 3


def test_empty_doc_gets_zero_weight(spark):
    raw = _docs(spark, [(0, "aa bb"), (1, "")])
    tgt = _docs(spark, [(10, "aa")])
    w = {r.doc_id: r for r in dsir_logweights(raw, tgt, n_buckets=16,
                                              mode=MODE).collect()}
    assert w[1].logw == 0.0 and w[1].n_grams == 0
    assert set(w) == {0, 1}


def test_gumbel_sample_deterministic_and_biased(spark):
    # 100 docs: 50 target-like ("aa"), 50 junk ("zz") — the resample
    # must overwhelmingly pick target-like docs, identically across
    # partitionings.
    rows = [(i, "aa bb cc" if i < 50 else "zz yy xx") for i in range(100)]
    raw = _docs(spark, rows)
    tgt = _docs(spark, [(900, "aa bb cc aa bb")])
    w = dsir_logweights(raw, tgt, n_buckets=128, mode=MODE)
    s1 = dsir_sample(w, 20).collect()
    s2 = dsir_sample(w.repartition(17), 20).collect()
    assert [(r.doc_id, r.rank) for r in sorted(s1, key=lambda r: r.rank)] \
        == [(r.doc_id, r.rank) for r in sorted(s2, key=lambda r: r.rank)]
    assert len(s1) == 20
    n_target = sum(1 for r in s1 if r.doc_id < 50)
    assert n_target >= 18
    for r in s1:
        assert r.key == pytest.approx(
            r.logw - math.log(-math.log(_u(r.doc_id))), abs=1e-9)


def _u(doc_id, seed=29):
    import hashlib
    h = int(hashlib.md5(f"{seed}_{doc_id}".encode()).hexdigest()[:15], 16)
    return (h + 0.5) / 16 ** 15


def test_frequent_item_pairs_hand_case(spark):
    """Baskets {a,b,c}, {a,b}, {b,c}, giant basket dropped by the cap."""
    from bertopic_spark.operators.pipeline import frequent_item_pairs

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "b"), (3, "c"), (3, "c")]  # dup item collapses
    rows += [(9, f"x{i}") for i in range(10)]  # over max_basket=5 -> dropped
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {(r["item_a"], r["item_b"]): r["support"]
           for r in frequent_item_pairs(df, "basket", "item",
                                        min_support=2,
                                        max_basket=5).collect()}
    assert got == {("a", "b"): 2, ("b", "c"): 2}
    # support 1 pairs appear when min_support=1; x-pairs stay dropped
    all_p = frequent_item_pairs(df, "basket", "item", min_support=1,
                                max_basket=5)
    assert all_p.count() == 3

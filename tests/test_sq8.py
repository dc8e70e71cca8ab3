"""Scalar quantization (SQ8): codes, certified bounds, serving.

FAISS IndexScalarQuantizer (QT_8bit) shape — per-dimension uniform 8-bit
quantization with BIGINT micro-unit level arithmetic
(operators/similarity.py sq8_*).
"""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.similarity import (cosine_topk, sq8_bounds,
                                                 sq8_encode, sq8_topk)


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .cache())


def _vecs(emb):
    return {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}


def test_codes_in_range_and_bounds_shape(spark, emb):
    b = sq8_bounds(emb)
    d = len(emb.select("embedding").first()["embedding"])
    rows = b.collect()
    assert sorted(r["dim"] for r in rows) == list(range(d))
    assert all(r["min_u"] <= r["max_u"] for r in rows)
    codes = sq8_encode(emb, b).collect()
    for r in codes:
        assert len(r["codes"]) == d
        assert all(0 <= c <= 255 for c in r["codes"])
    # the extreme values of every dimension hit the edge levels
    mx = {r["dim"]: r["max_u"] for r in rows}
    got255 = [False] * d
    for r in codes:
        for i, c in enumerate(r["codes"]):
            if c == 255:
                got255[i] = True
    assert all(got255), "every dim's max value must code 255"
    assert mx  # bounds non-empty


def test_degenerate_dim_and_frozen_bounds_clamp(spark):
    t = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.0, 3.0]), (2, [0.0, 2.0])],
        "vec_id long, embedding array<double>")
    b = sq8_bounds(t)
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(t, b).collect()}
    assert all(c[0] == 0 for c in codes.values())       # degenerate dim
    assert codes[0][1] == 0 and codes[1][1] == 255      # range edges
    # frozen bounds: out-of-range components clamp to the edge levels
    t2 = spark.createDataFrame([(9, [5.0, -10.0]), (10, [-5.0, 99.0])],
                               "vec_id long, embedding array<double>")
    c2 = {r["vec_id"]: r["codes"] for r in sq8_encode(t2, b).collect()}
    assert c2[9] == [0, 0] and c2[10] == [0, 255]


def test_certified_bound_holds_everywhere(spark, emb):
    """|approx − exact IP| ≤ err_bound for EVERY (query, candidate) pair
    reached by the top-k (bound is per-row, so checking the returned rows
    checks the certificate)."""
    out = sq8_topk(emb, [0, 1, 2], k=50).collect()
    vs = _vecs(emb)
    for r in out:
        exact = sum(a * b for a, b in zip(vs[r["query_vec_id"]],
                                          vs[r["vec_id"]]))
        # scores round to 6dp on the way out: allow that quantum on top
        assert abs(r["score"] - exact) <= r["err_bound"] + 1e-6, r


def test_refine_degenerates_to_brute_force(spark, emb):
    n = emb.count()
    k = 5
    exact = cosine_topk(emb, [0, 1], k=k)
    ref = sq8_topk(emb, [0, 1], k=k, normalize=True, refine=(n // k) + 1)
    a = [(r["query_vec_id"], r["vec_id"], r["rn"], round(r["cos"], 6))
         for r in exact.orderBy("query_vec_id", "rn").collect()]
    b = [(r["query_vec_id"], r["vec_id"], r["rn"], r["score"])
         for r in ref.orderBy("query_vec_id", "rn").collect()]
    assert a == b


def test_partitioning_invariance(spark, emb):
    one = sq8_topk(emb.repartition(1), [0, 1], k=10)
    many = sq8_topk(emb.repartition(13), [0, 1], k=10)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(one) == key(many)


def test_sq8_recall_reasonable(spark, emb):
    """Normalized SQ8 at 8 bits should agree with brute cosine on most of
    the top-10 — scalar quantization is the high-recall end of the
    compression curve (unlike 8-bit PQ)."""
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=10).collect()
    approx = sq8_topk(emb, qids, k=10, normalize=True).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["query_vec_id"], set()).add(r["vec_id"])
    got = {}
    for r in approx:
        got.setdefault(r["query_vec_id"], set()).add(r["vec_id"])
    recall = sum(len(truth[q] & got[q]) for q in truth) / (10.0 * len(truth))
    assert recall >= 0.9, recall


def test_bounds_validation(spark):
    t = spark.createDataFrame([(0, [1.0, 2.0])],
                              "vec_id long, embedding array<double>")
    bad = spark.createDataFrame([(1, -5, 5)], "dim int, min_u long, max_u long")
    with pytest.raises(ValueError):
        sq8_encode(t, bad)  # dims must cover 0..d-1
    empty = spark.createDataFrame([], "dim int, min_u long, max_u long")
    with pytest.raises(ValueError):
        sq8_encode(t, empty)
    assert math.isfinite(1.0)  # keep math import honest


def test_matryoshka_full_prefix_equals_brute(spark):
    """prefix_dims = full dim and candidates = corpus: identical to
    cosine_topk; small prefix still recovers exact top-k on separable
    fixtures (recall property, not an accident of params)."""
    import numpy as np

    from bertopic_spark.operators.similarity import (cosine_topk,
                                                     matryoshka_topk)

    rng = np.random.RandomState(7)
    base = rng.randn(5, 32)
    rows = []
    for i in range(60):
        c = i % 5
        v = base[c] + 0.05 * rng.randn(32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    brute = cosine_topk(emb, [0, 1], k=5).collect()
    full = matryoshka_topk(emb, [0, 1], k=5, prefix_dims=32,
                           n_candidates=60).collect()
    assert sorted(map(tuple, brute)) == sorted(map(tuple, full))
    short = matryoshka_topk(emb, [0, 1], k=5, prefix_dims=8,
                            n_candidates=20).collect()
    # cluster structure survives an 8-dim prefix: same ids recovered
    assert ({(r["query_vec_id"], r["vec_id"]) for r in short} ==
            {(r["query_vec_id"], r["vec_id"]) for r in brute})
    import pytest as _pt
    with _pt.raises(ValueError):
        matryoshka_topk(emb, [0], k=10, prefix_dims=8, n_candidates=5)


def test_mmr_diversify_prefers_spread(spark):
    """Two near-duplicate top candidates: MMR keeps one and pulls the
    next cluster in; lambda=0 degrades to pure relevance order."""
    from bertopic_spark.operators.similarity import mmr_diversify

    rows = [
        (100, [1.0, 0.0, 0.0, 0.0]),            # query
        (1, [0.99, 0.14, 0.0, 0.0]),            # near-dup pair, top rel
        (2, [0.99, 0.141, 0.0, 0.0]),
        (3, [0.7, 0.71, 0.0, 0.0]),             # different direction
        (4, [0.6, 0.0, 0.8, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    from bertopic_spark.operators.similarity import cosine_topk
    cands = cosine_topk(emb, [100], k=4).drop("rn")
    pure = mmr_diversify(emb, cands, k=3, diversity=0.0).collect()
    assert [r["vec_id"] for r in sorted(pure, key=lambda r: r["mmr_rank"])][:2] == [1, 2]
    div = mmr_diversify(emb, cands, k=3, diversity=0.6).collect()
    order = [r["vec_id"] for r in sorted(div, key=lambda r: r["mmr_rank"])]
    assert order[0] == 1          # best relevance first
    assert order[1] != 2          # the near-duplicate is deferred
    import pytest as _pt
    with _pt.raises(ValueError):
        mmr_diversify(emb, cands, k=0)

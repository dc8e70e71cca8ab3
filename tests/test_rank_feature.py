"""rank_feature / distance_feature query semantics (ES rank-feature docs).

Hand-fixture pins: exact function math (saturation / log / sigmoid /
linear), the additive bool-should contract (non-matching docs never
rank), the geometric-mean default pivot, and distance_feature's
symmetric microsecond decay.
"""

import math

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.bm25 import (distance_feature_topk,
                                           rank_feature_topk)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma", 10),
        (1, "alpha alpha delta", 100),
        (2, "epsilon zeta", 1000),
        (3, "beta beta beta", 0),  # non-positive feature -> fn contributes 0
    ]
    return spark.createDataFrame(rows, "doc_id long, content string, feat long")


@pytest.fixture(scope="module")
def qt(spark):
    return spark.createDataFrame([(0, "alpha")], "query_id long, term string")


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_additive_should_only_ranks_matches(docs, qt):
    out = rank_feature_topk(docs, qt, "feat", pivot=50.0, k=10).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {0, 1}  # docs 2 and 3 match no query term


@pytest.mark.parametrize("function,kw,fn", [
    ("saturation", {"pivot": 50.0}, lambda s: s / (s + 50.0)),
    ("log", {"scaling_factor": 2.0}, lambda s: math.log(2.0 + s)),
    ("sigmoid", {"pivot": 50.0, "exponent": 0.6},
     lambda s: s ** 0.6 / (s ** 0.6 + 50.0 ** 0.6)),
    ("linear", {}, lambda s: float(s)),
])
def test_function_math_exact(docs, qt, function, kw, fn):
    base = {r["doc_id"]: r["score"]
            for r in rank_feature_topk(docs, qt, "feat", function="linear",
                                       boost=0.0, k=10).collect()}
    out = _scores(rank_feature_topk(docs, qt, "feat", function=function,
                                    boost=3.0, k=10, **kw))
    feats = {0: 10, 1: 100}
    for d, sc in out.items():
        assert sc == pytest.approx(base[d] + 3.0 * fn(feats[d]), abs=1e-9)


def test_nonpositive_feature_contributes_zero(spark, qt):
    rows = [(0, "alpha", 0), (1, "alpha", 100)]
    docs = spark.createDataFrame(rows, "doc_id long, content string, feat long")
    base = _scores(rank_feature_topk(docs, qt, "feat", function="linear",
                                     boost=0.0, k=10))
    out = _scores(rank_feature_topk(docs, qt, "feat", function="saturation",
                                    pivot=50.0, boost=5.0, k=10))
    assert out[0] == pytest.approx(base[0], abs=1e-12)  # S=0 -> fn = 0
    assert out[1] > base[1]


def test_default_pivot_is_geometric_mean(docs, qt):
    # positive feats: 10, 100, 1000 -> geomean = 100
    explicit = _scores(rank_feature_topk(docs, qt, "feat", pivot=100.0, k=10))
    default = _scores(rank_feature_topk(docs, qt, "feat", pivot=None, k=10))
    assert default == pytest.approx(explicit, abs=1e-9)


def test_distance_feature_decay(spark):
    rows = [(0, "2024-01-15 00:00:00"), (1, "2024-01-15 00:00:10"),
            (2, "2024-01-14 23:59:50"), (3, "2024-01-16 00:00:00")]
    ev = spark.createDataFrame(rows, "event_id long, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"))
    piv = 86400.0e6
    out = {r["event_id"]: r["score"]
           for r in distance_feature_topk(ev, "ts", "2024-01-15 00:00:00",
                                          piv, boost=2.0, k=10).collect()}
    assert out[0] == pytest.approx(2.0, abs=1e-12)  # zero distance
    assert out[1] == pytest.approx(out[2], abs=1e-12)  # symmetric
    assert out[3] == pytest.approx(2.0 * piv / (piv + 86400.0e6), abs=1e-9)
    ranks = {r["event_id"]: r["rank"]
             for r in distance_feature_topk(ev, "ts", "2024-01-15 00:00:00",
                                            piv, k=2).collect()}
    assert set(ranks) == {0, 1} and ranks[0] == 1  # ties broken by id; k cap


def test_decay_contract_points(spark):
    """ES contract: score 1 within offset; exactly `decay` at
    origin +/- (offset + scale); monotone beyond."""
    from bertopic_spark.operators.bm25 import decay_score_expr

    rows = [(0, 300.0), (1, 320.0), (2, 425.0), (3, 175.0), (4, 600.0)]
    d = spark.createDataFrame(rows, "doc_id long, x double")
    for kind in ("gauss", "exp", "linear"):
        out = {r["doc_id"]: r["s"] for r in d.select(
            "doc_id", decay_score_expr("x", 300.0, 100.0, 25.0, 0.5,
                                       kind).alias("s")).collect()}
        assert out[0] == pytest.approx(1.0, abs=1e-12)   # at origin
        assert out[1] == pytest.approx(1.0, abs=1e-12)   # inside offset
        assert out[2] == pytest.approx(0.5, abs=1e-9)    # origin+offset+scale
        assert out[3] == pytest.approx(0.5, abs=1e-9)    # symmetric
        assert out[4] < 0.5                              # beyond decays
    with pytest.raises(ValueError):
        decay_score_expr("x", 0, -1.0)
    with pytest.raises(ValueError):
        decay_score_expr("x", 0, 1.0, decay=1.5)

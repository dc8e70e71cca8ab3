"""Visualization data relations (operators/viz.py): term-rank decline and
the classical-MDS 2-D topic map (reference ``plotting/_term_rank.py`` and
``visualize_topics``, `_bertopic.py:2541-2594`)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.viz import _classical_mds, term_rank_curve, topic_map_2d


def _scores_df(spark, rows):
    return spark.createDataFrame(rows, "lang string, term string, score double")


def test_term_rank_curve_is_topk_projection(spark):
    rows = [("en", t, s) for t, s in
            [("a", 5.0), ("b", 4.0), ("c", 3.0), ("d", 2.0), ("e", 1.0)]]
    out = term_rank_curve(_scores_df(spark, rows), ["lang"], k=3).collect()
    got = sorted((r["rank"], r["term"], r["score"]) for r in out)
    assert got == [(1, "a", 5.0), (2, "b", 4.0), (3, "c", 3.0)]


def test_term_rank_curve_log_floor(spark):
    """Non-positive scores floor to the global min positive score before
    log10 (reference _term_rank.py:92-94)."""
    rows = [("en", "a", 100.0), ("en", "b", 0.01), ("en", "z", 0.0),
            ("fr", "c", 10.0), ("fr", "w", -1.0)]
    out = term_rank_curve(_scores_df(spark, rows), ["lang"], k=5,
                          log_scale=True).collect()
    got = {(r["lang"], r["term"]): r["score"] for r in out}
    assert abs(got[("en", "a")] - 2.0) < 1e-12
    assert abs(got[("en", "b")] + 2.0) < 1e-12
    # z (0.0) and w (-1.0) floor to min positive = 0.01 → log10 = -2
    assert abs(got[("en", "z")] + 2.0) < 1e-12
    assert abs(got[("fr", "w")] + 2.0) < 1e-12


def test_classical_mds_recovers_planar_config():
    """Points that ARE 2-D: MDS must reproduce all pairwise distances."""
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [3.0, 1.0], [2.0, 2.0]])
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    coords = _classical_mds(d, 2)
    d2 = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    assert np.allclose(d, d2, atol=1e-9)


def test_classical_mds_deterministic_sign():
    d = np.array([[0.0, 1.0, 2.0], [1.0, 0.0, 1.5], [2.0, 1.5, 0.0]])
    a, b = _classical_mds(d, 2), _classical_mds(d.copy(), 2)
    assert np.array_equal(a, b)


def test_power_mds_matches_eigh():
    """The fixed-iteration power solve (the SQL-replayable default)
    converges to the SAME top-2 eigenpairs as LAPACK eigh whenever the
    eigengap is nonzero — planar config, well-separated spectrum."""
    from bertopic_spark.operators.viz import _power_mds

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [3.0, 1.0], [2.0, 2.0]])
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    assert np.allclose(_power_mds(d, 2), _classical_mds(d, 2), atol=1e-9)
    # and it reproduces the planar distances exactly, like eigh
    coords = _power_mds(d, 2)
    d2 = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1))
    assert np.allclose(d, d2, atol=1e-9)


def test_power_mds_degenerate_zero_matrix():
    """All-equal points: B = 0, power iterations stay zero, coordinates
    all land at the origin instead of NaN (the SQL oracle's CASE guards
    mirror this exactly)."""
    from bertopic_spark.operators.viz import _power_mds

    coords = _power_mds(np.zeros((4, 4)), 2)
    assert np.array_equal(coords, np.zeros((4, 2)))


def test_topic_map_2d_geometry_and_determinism(spark):
    """The 2-D map's pairwise distances must approximate the class
    cosine distances (exact when k classes fit in 2 MDS dims is not
    guaranteed; we check the stress is small and repeat runs identical),
    and classes sharing no term sit at distance ~1 from everything."""
    rows = [
        ("en", "alpha", 2.0), ("en", "beta", 1.0),
        ("fr", "alpha", 1.0), ("fr", "beta", 2.0),
        ("de", "gamma", 3.0),  # no shared term → dist 1 to en and fr
    ]
    s = _scores_df(spark, rows)
    out1 = {r["lang"]: (r["x"], r["y"]) for r in topic_map_2d(s, "lang").collect()}
    out2 = {r["lang"]: (r["x"], r["y"]) for r in
            topic_map_2d(s.repartition(5), "lang").collect()}
    assert out1 == out2  # deterministic across partitionings
    assert set(out1) == {"en", "fr", "de"}

    def dist(a, b):
        return math.hypot(out1[a][0] - out1[b][0], out1[a][1] - out1[b][1])

    # cosine(en, fr) = (2*1 + 1*2) / (sqrt(5)*sqrt(5)) = 0.8 → dist 0.2
    assert abs(dist("en", "fr") - 0.2) < 0.05
    assert abs(dist("en", "de") - 1.0) < 0.1
    assert abs(dist("fr", "de") - 1.0) < 0.1


def test_document_map_2d_linear_and_deterministic(spark):
    """Seeded random projection: coordinates equal the local dot product
    of the embedding with the md5-derived axis coefficients, identical
    across partitionings, and linear (map(a+b) = map(a)+map(b))."""
    import hashlib

    from bertopic_spark.operators.viz import document_map_2d

    def coeff(seed, axis, dim):
        h = int(hashlib.md5(f"{seed}_{axis}_{dim}".encode()).hexdigest()[:8], 16)
        return (h % 1000) / 1000.0 - 0.5

    vecs = {0: [1.0, 0.0, 2.0, -1.0], 1: [0.5, 0.5, 0.5, 0.5],
            2: [0.0, 0.0, 0.0, 0.0], 3: [1.5, 0.5, 2.5, -0.5]}
    df = spark.createDataFrame([(i, v) for i, v in vecs.items()],
                               "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["x"], r["y"])
           for r in document_map_2d(df).collect()}
    for i, v in vecs.items():
        for axis, got in enumerate(out[i]):
            want = sum(val * coeff(2026, axis, d) for d, val in enumerate(v))
            assert got == pytest.approx(want, abs=1e-6), (i, axis)
    # zero vector lands at the origin; linearity: vec3 = vec0 + vec1
    assert out[2] == (0.0, 0.0)
    assert out[3][0] == pytest.approx(out[0][0] + out[1][0], abs=2e-6)
    assert out[3][1] == pytest.approx(out[0][1] + out[1][1], abs=2e-6)
    out2 = {r["vec_id"]: (r["x"], r["y"])
            for r in document_map_2d(df.repartition(7)).collect()}
    assert out == out2

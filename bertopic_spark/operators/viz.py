"""Visualization DATA relations (reference ``bertopic/plotting/``; the
plotly layer itself is presentation code and out of scope — SURVEY §0).

* ``term_rank_curve`` — the score-by-rank decline behind
  ``visualize_term_rank`` (reference ``plotting/_term_rank.py:70-95``,
  driven from ``_bertopic.py:2925-2986``): per topic, the c-TF-IDF score at
  each rank 1..k, optionally log10 with zeros floored to the global minimum
  positive score (the reference's ``y[y == 0] = min(values[values > 0])``).

* ``topic_map_2d`` — deterministic 2-D coordinates behind
  ``visualize_topics`` (reference ``_bertopic.py:2541-2594`` uses UMAP over
  topic embeddings; UMAP is non-deterministic and needs a native lib, so
  this engine substitutes CLASSICAL MDS — Torgerson double-centering +
  eigendecomposition — over the same topic-similarity relation the heatmap
  uses). The pair-distance relation is computed distributed
  (``class_pair_distances``: one term join, never a dense class×term
  matrix); only the k×k distance list is collected, and k = number of
  topics, driver-scale by definition at any corpus size.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.operators.ctfidf import top_k_terms


def term_rank_curve(scores: DataFrame, class_cols: Sequence[str],
                    k: int = 10, log_scale: bool = False) -> DataFrame:
    """(class..., rank, term, score) — score decline per rank 1..k.

    log_scale=True maps score → log10(score) after flooring non-positive
    scores to the global minimum positive score, matching the reference's
    zero handling (``plotting/_term_rank.py:92-94``). The floor is a 1-row
    aggregate broadcast into the expression — no second pass."""
    topk = top_k_terms(scores, class_cols, k)
    if not log_scale:
        return topk.select(*class_cols, "rank", "term", "score")
    floor = topk.filter(F.col("score") > 0).agg(
        F.min("score").alias("_floor"))
    return (
        topk.crossJoin(F.broadcast(floor))
        .select(
            *class_cols, "rank", "term",
            F.log10(
                F.when(F.col("score") > 0, F.col("score"))
                .otherwise(F.col("_floor"))
            ).alias("score"))
    )


def _classical_mds(dist: np.ndarray, n_components: int = 2) -> np.ndarray:
    """Torgerson classical MDS: B = −½ J D² J, top eigenpairs, coords =
    V·diag(√λ). Deterministic given the matrix; eigenvector signs are
    canonicalized (largest-|component| entry made positive) so repeated
    runs and different partitionings return identical output."""
    n = dist.shape[0]
    j = np.eye(n) - np.full((n, n), 1.0 / n)
    b = -0.5 * j @ (dist ** 2) @ j
    w, v = np.linalg.eigh((b + b.T) / 2.0)
    order = np.argsort(w)[::-1][:n_components]
    coords = np.zeros((n, n_components))
    for c, i in enumerate(order):
        lam = max(w[i], 0.0)
        vec = v[:, i]
        anchor = int(np.argmax(np.abs(vec)))
        if vec[anchor] < 0:
            vec = -vec
        coords[:, c] = vec * np.sqrt(lam)
    return coords


def topic_map_2d(scores: DataFrame, class_col: str,
                 round_to: int = 6, max_classes: int = 2000) -> DataFrame:
    """(class, x, y) — deterministic 2-D intertopic map from the c-TF-IDF
    cosine-distance relation. Pairs sharing no term get distance 1 (cos 0),
    the diagonal 0. Coordinates round to ``round_to`` dp.

    ``max_classes`` caps the k×k driver matrix (same 2,000 bound as
    ``hierarchical_topics`` / ``reduce_topics_agglomerative``)."""
    from bertopic_spark.operators.topics import class_pair_distances

    n_classes = scores.select(class_col).distinct().count()
    if n_classes > max_classes:
        raise ValueError(
            f"{n_classes} classes exceeds max_classes={max_classes}: the "
            "k×k distance matrix no longer fits a driver; reduce topics "
            "first or map per partition")
    pairs = class_pair_distances(scores, class_col, round_to=12).collect()
    classes = sorted({r["_ca"] for r in pairs} | {r["_cb"] for r in pairs}
                     | {r[0] for r in
                        scores.select(class_col).distinct().collect()})
    idx = {c: i for i, c in enumerate(classes)}
    n = len(classes)
    d = np.ones((n, n))
    np.fill_diagonal(d, 0.0)
    for r in pairs:
        i, j = idx[r["_ca"]], idx[r["_cb"]]
        d[i, j] = d[j, i] = r["dist"]
    coords = _classical_mds(d, 2)
    spark = scores.sparkSession
    rows = [(c, round(float(coords[i, 0]), round_to),
             round(float(coords[i, 1]), round_to))
            for c, i in idx.items()]
    # class column keeps its ORIGINAL type; coords are double
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([scores.select(class_col).schema.fields[0],
                         StructField("x", DoubleType(), False),
                         StructField("y", DoubleType(), False)])
    return spark.createDataFrame(rows, schema)


def document_map_2d(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", seed: int = 2026,
                    round_to: int = 6) -> DataFrame:
    """(id, x, y) — deterministic 2-D DOCUMENT map: seeded random
    projection (Johnson–Lindenstrauss) of the embedding column onto two
    md5-derived axes.

    The reference's ``visualize_documents`` (`_bertopic.py:2596-2745`)
    UMAPs every document embedding — non-deterministic, native-lib,
    single-node. At 100 TB the scale-correct analog is a linear projection:
    one narrow shuffle on the doc id, coefficients derived from
    ``md5(seed_axis_dim)`` exactly like ``random_hyperplane_buckets``
    (similarity.py), so a SQL engine reproduces the coordinates
    bit-for-bit — this relation is oracle-gated, unlike the MDS topic map
    (eigendecomposition is not SQL-expressible).

    Pair it with ``topic_map_2d`` for the intertopic view; per-doc hover
    metadata joins on ``id_col`` downstream.
    """
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"))
    spark = emb.sparkSession
    axes = (
        ex.select("dim").distinct()
        .crossJoin(spark.range(2).select(F.col("id").cast("int").alias("axis")))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.lit(seed), F.col("axis"), F.col("dim"))), 1, 8),
        16, 10,
    ).cast("long")
    coeff = axes.withColumn("c", (h % 1000) / F.lit(1000.0) - 0.5)
    proj = ex.join(F.broadcast(coeff), "dim")
    return proj.groupBy(id_col).agg(
        F.round(F.sum(F.when(F.col("axis") == 0, F.col("val") * F.col("c"))),
                round_to).alias("x"),
        F.round(F.sum(F.when(F.col("axis") == 1, F.col("val") * F.col("c"))),
                round_to).alias("y"),
    )

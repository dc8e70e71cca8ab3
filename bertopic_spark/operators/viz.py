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
  a fixed-iteration power-method eigensolve (`_power_mds`) whose every
  step is SQL-replayable, so the gate query has a full DuckDB oracle —
  over the same topic-similarity relation the heatmap
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


def _power_mds(dist: np.ndarray, n_components: int = 2,
               iters: int = 80) -> np.ndarray:
    """Fixed-iteration power-method classical MDS — ARITHMETIC-PORTABLE:
    every step (double-centering, matvec, max-abs rescale, final L2
    normalize, first-argmax sign anchor, Rayleigh quotient, rank-1
    deflation) is plain arithmetic over the (i, j, val) matrix relation,
    so a SQL engine can replay the SAME fixed iteration count and the
    6dp-rounded coordinates agree cross-engine (the DuckDB oracle for the
    ``topic_map_2d`` gate does exactly that). ``eigh`` (`_classical_mds`)
    is backend-specific LAPACK and not replayable. With a nonzero eigengap
    the power variant converges to the same top eigenpairs (tested vs
    eigh on a planar configuration).

    The per-iteration rescale divides by max(|w|) — a comparison, not a
    sum, so it is exact across engines and keeps values in double range
    at any class count (unnormalized products overflow past ~λ^iters)."""
    n = dist.shape[0]
    d2 = dist.astype(float) ** 2
    rm = d2.mean(axis=1)
    gm = float(d2.mean())
    b = -0.5 * (d2 - rm[None, :] - rm[:, None] + gm)
    coords = np.zeros((n, n_components))
    for c in range(n_components):
        v = np.arange(1.0, n + 1.0)  # deterministic, generically non-orthogonal
        for _ in range(iters):
            w = b @ v
            m = float(np.max(np.abs(w)))
            v = w if m == 0.0 else w / m
        nrm = float(np.sqrt(v @ v))
        if nrm == 0.0:
            continue  # zero vector: column stays 0, b undeflated (λ = 0)
        e = v / nrm
        anchor = int(np.argmax(np.abs(e)))
        if e[anchor] < 0:
            e = -e
        lam = float(e @ (b @ e))
        coords[:, c] = e * np.sqrt(max(lam, 0.0))
        b = b - lam * np.outer(e, e)
    return coords


def topic_map_2d(scores: DataFrame, class_col: str,
                 round_to: int = 6, max_classes: int = 2000,
                 method: str = "power", iters: int = 80) -> DataFrame:
    """(class, x, y) — deterministic 2-D intertopic map from the c-TF-IDF
    cosine-distance relation. Pairs sharing no term get distance 1 (cos 0),
    the diagonal 0. Coordinates round to ``round_to`` dp.

    ``method="power"`` (default) uses the fixed-iteration power solve so
    the relation is fully DuckDB-oracle-checkable; ``method="eigh"`` keeps
    the LAPACK eigendecomposition (identical up to convergence).
    ``max_classes`` caps the k×k driver matrix (same 2,000 bound as
    ``hierarchical_topics`` / ``reduce_topics_agglomerative``)."""
    from bertopic_spark.operators.topics import class_pair_distances

    n_classes = scores.select(class_col).distinct().count()
    if n_classes > max_classes:
        raise ValueError(
            f"{n_classes} classes exceeds max_classes={max_classes}: the "
            "k×k distance matrix no longer fits a driver; reduce topics "
            "first or map per partition")
    # distances round at round_to so the SQL oracle sees bit-identical input
    pairs = class_pair_distances(scores, class_col, round_to=round_to).collect()
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
    coords = (_power_mds(d, 2, iters) if method == "power"
              else _classical_mds(d, 2))
    spark = scores.sparkSession
    rows = [(c, float(coords[i, 0]), float(coords[i, 1]))
            for c, i in idx.items()]
    # class column keeps its ORIGINAL type; coords are double. Rounding
    # goes through F.round (HALF_UP exact-decimal, same as every other
    # oracle-gated relation) — Python round() is HALF_EVEN and disagrees
    # with the SQL oracle on exact half-ulp boundaries.
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([scores.select(class_col).schema.fields[0],
                         StructField("x", DoubleType(), False),
                         StructField("y", DoubleType(), False)])
    return spark.createDataFrame(rows, schema).select(
        class_col, F.round("x", round_to).alias("x"),
        F.round("y", round_to).alias("y"))


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
    bit-for-bit — oracle-gated, like the power-method MDS topic map.

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

def hierarchy_level_assignments(hier: DataFrame, n_leaves: int,
                                levels: Sequence[int]) -> DataFrame:
    """(level, leaf, topic_at_level) — which merged cluster each leaf topic
    belongs to after the first ``level`` merges of a linkage tree (the
    per-level topic sets behind the reference's
    ``visualize_hierarchical_documents``,
    ``plotting/_hierarchical_documents.py:107-143`` driven from
    ``_bertopic.py:3080-3240``; the reference walks the scipy linkage at
    ``nr_levels`` distance cuts — a cut after m merges is the same set).

    The cluster label is the MINIMUM leaf id of the containing cluster
    (deterministic; the reference relabels per level from the tree the
    same way in ``_create_hierarchical_documents``). Pure DataFrame ops
    over the (parent_id, topics) linkage relation: explode the member
    csv, keep merges applied at the level (parents are numbered
    ``n_leaves .. n_leaves+m-1`` in merge order, scipy convention), take
    each leaf's LATEST applied parent (containment is nested, so the max
    parent_id is the current cluster), label it with the parent's min
    member. Leaves never merged at that level map to themselves.
    Everything is k-scale (k = topic count): broadcast-tiny at any corpus
    size.
    """
    spark = hier.sparkSession
    # 1 partition each: these are k-scale relations, and a plain crossJoin
    # of two 32-partition sides would schedule a 1024-task CartesianProduct
    # (measured 13s of pure task launch at the gate); broadcasting the
    # levels side keeps every join a BroadcastNestedLoopJoin over the
    # other side's partitioning
    lv = spark.createDataFrame(
        [(int(m),) for m in levels], "level int").coalesce(1)
    mem = hier.select(
        "parent_id",
        F.explode(F.split("topics", ",").cast("array<long>")).alias("leaf"),
        # member csv is sorted ascending (single_linkage_merge) — element 1
        # is the min leaf, the cluster's deterministic label
        F.element_at(F.split("topics", ",").cast("array<long>"), 1)
        .alias("rep"))
    assigned = (
        mem.crossJoin(F.broadcast(lv))
        .filter(F.col("parent_id") < F.lit(int(n_leaves)) + F.col("level"))
        .groupBy("level", "leaf")
        .agg(F.max_by("rep", "parent_id").alias("topic_at_level")))
    leaves = spark.range(int(n_leaves)).coalesce(1).select(
        F.col("id").alias("leaf"))
    return (
        leaves.crossJoin(F.broadcast(lv))
        .join(F.broadcast(assigned), ["level", "leaf"], "left")
        .select("level", "leaf",
                F.coalesce("topic_at_level", F.col("leaf"))
                .alias("topic_at_level")))

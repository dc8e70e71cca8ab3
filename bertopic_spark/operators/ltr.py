"""Learning-to-rank training: pointwise logistic regression by
distributed batch gradient descent.

The missing half of ``ltr_features`` (operators/bm25.py): given the
per-(query, candidate) feature relation and binary relevance labels,
learn a weight vector and re-rank with it. The model is feature-width-
sized (a handful of doubles), so it lives on the driver between
iterations — each iteration is ONE map-side-combined aggregation over
the feature relation (the classic distributed-GD shape: at 100 TB every
pass is a full scan and nothing else; no per-row Python, no shuffle
beyond the final partial-agg tree).

Cross-engine determinism: feature means/stds and the per-iteration
updated weights are rounded to ``round_dp`` decimals, so float-sum
ordering and libm exp() differences (≈1e-15 per step) can never
compound across iterations — the SQL oracle replays the identical
trajectory as an unrolled CTE chain (power-MDS / PageRank precedent).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS_STD = 1e-12


def feature_stats(feats: DataFrame, feature_cols: Sequence[str],
                  round_dp: int = 9) -> dict:
    """{col: (mean, std)} — one aggregation, population std, rounded."""
    aggs = []
    for c in feature_cols:
        aggs += [F.round(F.avg(F.col(c)), round_dp).alias(f"m_{c}"),
                 F.round(F.stddev_pop(F.col(c)), round_dp).alias(f"s_{c}")]
    row = feats.agg(*aggs).collect()[0]
    return {c: (row[f"m_{c}"], row[f"s_{c}"]) for c in feature_cols}


def _z(col: str, mean: float, std: float):
    if std is None or std <= EPS_STD:
        return F.lit(0.0)
    return (F.col(col) - F.lit(float(mean))) / F.lit(float(std))


def logreg_train(feats: DataFrame, label_col: str,
                 feature_cols: Sequence[str], iters: int = 12,
                 lr: float = 1.0, l2: float = 0.01,
                 round_dp: int = 9,
                 stats: dict | None = None) -> list[float]:
    """Weights [bias, w_1..w_d] after ``iters`` full-batch GD steps on
    standardized features, started from zero:

        p   = sigmoid(b + Σ w_j z_j)
        g_j = avg((p − y)·z_j) + l2·w_j    (no l2 on the bias)
        w_j = round(w_j − lr·g_j, round_dp)

    One aggregation job per iteration; the collect is d+1 doubles."""
    st = stats if stats is not None else feature_stats(feats, feature_cols,
                                                       round_dp)
    f = feats
    w = [0.0] * (len(feature_cols) + 1)
    y = F.col(label_col).cast("double")
    for _ in range(int(iters)):
        margin = F.lit(w[0])
        for j, c in enumerate(feature_cols):
            margin = margin + F.lit(w[j + 1]) * _z(c, *st[c])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        aggs = [F.avg(p - y).alias("g0")]
        for j, c in enumerate(feature_cols):
            aggs.append(F.avg((p - y) * _z(c, *st[c])).alias(f"g{j + 1}"))
        g = f.agg(*aggs).collect()[0]
        w = [round(w[0] - lr * g["g0"], round_dp)] + [
            round(w[j + 1] - lr * (g[f"g{j + 1}"] + l2 * w[j + 1]),
                  round_dp)
            for j in range(len(feature_cols))]
    return w


def logreg_loss(feats: DataFrame, label_col: str,
                feature_cols: Sequence[str], w: Sequence[float],
                stats: dict) -> float:
    """Mean log-loss of weights ``w`` — the convergence probe."""
    margin = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        margin = margin + F.lit(float(w[j + 1])) * _z(c, *stats[c])
    y = F.col(label_col).cast("double")
    ll = y * F.log(F.lit(1.0) + F.exp(-margin)) + \
        (F.lit(1.0) - y) * F.log(F.lit(1.0) + F.exp(margin))
    return feats.agg(F.avg(ll)).collect()[0][0]


def logreg_rerank(feats: DataFrame, feature_cols: Sequence[str],
                  w: Sequence[float], stats: dict, k: int = 10,
                  id_col: str = "doc_id") -> DataFrame:
    """(query_id, doc_id, prob, rank): candidates re-ranked by the
    learned model — one projection + the per-query top-k window."""
    margin = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        margin = margin + F.lit(float(w[j + 1])) * _z(c, *stats[c])
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    win = Window.partitionBy("query_id").orderBy(F.desc("prob"),
                                                 F.asc(id_col))
    return (feats.select("query_id", id_col, prob.alias("prob"))
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= int(k)))


def pairwise_diffs(feats: DataFrame, label_col: str,
                   feature_cols: Sequence[str], stats: dict,
                   max_pairs_per_query: int = 200, seed: int = 11,
                   id_col: str = "doc_id",
                   max_side_per_query: int = 64) -> DataFrame:
    """The (relevant, non-relevant) pair-difference relation behind
    pairwise LTR: per query, z-feature differences d_j = z_j⁺ − z_j⁻ for
    (label=1, label=0) doc pairs, capped at ``max_pairs_per_query`` by
    the md5 order. Columns: query_id, id_pos, id_neg, d1..dk.

    Blowup control happens BEFORE the join: each side is first capped at
    ``max_side_per_query`` docs per query by a per-doc md5 order, so the
    pre-cap pair relation is at most side² rows per query regardless of
    candidate count — a 10⁶-candidate query contributes ≤ 64² = 4,096
    join rows, never 10¹². The per-side pass is a row_number over the
    candidate list (linear in |candidates|, the same scale as the feature
    relation itself); the pair-level md5 cap then trims to
    ``max_pairs_per_query``. Both orders are deterministic and
    partition-invariant, so the relation is cacheable and SQL-replayable.
    """
    zcols = [(_z(c, *stats[c])).alias(f"z{j + 1}")
             for j, c in enumerate(feature_cols)]
    z = feats.select("query_id", F.col(id_col).alias("_id"),
                     F.col(label_col).cast("int").alias("_y"), *zcols)
    side_key = F.md5(F.concat_ws(
        "_", F.lit(int(seed)), F.lit("side"),
        F.col("query_id").cast("string"), F.col("_id").cast("string")))
    sw = Window.partitionBy("query_id", "_y").orderBy(side_key, "_id")
    z = (z.withColumn("_srn", F.row_number().over(sw))
         .filter(F.col("_srn") <= int(max_side_per_query))
         .drop("_srn"))
    pos = z.filter(F.col("_y") == 1).select(
        "query_id", F.col("_id").alias("id_pos"),
        *[F.col(f"z{j + 1}").alias(f"a{j + 1}")
          for j in range(len(feature_cols))])
    neg = z.filter(F.col("_y") == 0).select(
        "query_id", F.col("_id").alias("id_neg"),
        *[F.col(f"z{j + 1}").alias(f"b{j + 1}")
          for j in range(len(feature_cols))])
    pairs = pos.join(neg, "query_id")
    key = F.md5(F.concat_ws("_", F.lit(int(seed)),
                            F.col("query_id").cast("string"),
                            F.col("id_pos").cast("string"),
                            F.col("id_neg").cast("string")))
    w = Window.partitionBy("query_id").orderBy(key, "id_pos", "id_neg")
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(max_pairs_per_query))
            .select("query_id", "id_pos", "id_neg",
                    *[(F.col(f"a{j + 1}") - F.col(f"b{j + 1}"))
                      .alias(f"d{j + 1}")
                      for j in range(len(feature_cols))]))


def ranknet_train(diffs: DataFrame, n_features: int, iters: int = 10,
                  lr: float = 1.0, l2: float = 0.01,
                  round_dp: int = 9) -> list[float]:
    """Pairwise logistic (RankNet with one linear unit, Burges et al.
    2005): minimize avg log(1+exp(−w·d)) over pair differences — no
    bias (a constant cancels in s⁺ − s⁻). Same distributed-GD shape and
    per-step rounding as ``logreg_train``: one aggregation per iteration,
    SQL-replayable trajectory."""
    w = [0.0] * int(n_features)
    for _ in range(int(iters)):
        margin = F.lit(0.0)
        for j in range(n_features):
            margin = margin + F.lit(w[j]) * F.col(f"d{j + 1}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        aggs = [F.avg((p - F.lit(1.0)) * F.col(f"d{j + 1}"))
                .alias(f"g{j + 1}") for j in range(n_features)]
        g = diffs.agg(*aggs).collect()[0]
        w = [round(w[j] - lr * (g[f"g{j + 1}"] + l2 * w[j]), round_dp)
             for j in range(n_features)]
    return w


def ranknet_rerank(feats: DataFrame, feature_cols: Sequence[str],
                   w: Sequence[float], stats: dict, k: int = 10,
                   id_col: str = "doc_id") -> DataFrame:
    """(query_id, doc_id, score, rank): candidates ordered by the learned
    pairwise model's linear score w·z."""
    s = F.lit(0.0)
    for j, c in enumerate(feature_cols):
        s = s + F.lit(float(w[j])) * _z(c, *stats[c])
    win = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                 F.asc(id_col))
    return (feats.select("query_id", id_col, s.alias("score"))
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= int(k)))

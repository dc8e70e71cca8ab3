"""Outlier re-assignment — the reference's ``reduce_outliers``
(`_bertopic.py:2380-2540`; test analog `tests/test_bertopic.py:142-149`).

Re-assigns documents labeled ``outlier_label`` (−1) to their best
non-outlier topic, keeping every other assignment frozen. Strategies:

* ``ctfidf``        — L1-normalized doc term weights dotted with the class
                      c-TF-IDF vectors via the inverted index (reference
                      "c-tf-idf" strategy, `_bertopic.py:2480-2495`); never
                      a dense doc×class matrix.
* ``distributions`` — ``approximate_distribution`` over the outlier slice,
                      argmax window mass (reference "distributions",
                      `_bertopic.py:2430-2460`).
* ``embeddings``    — cosine to class centroids over a dense embedding
                      column (reference "embeddings", `_bertopic.py:2516-2540`).

Docs whose best (6dp-rounded) score falls below ``threshold`` stay at the
outlier label — the P5 min-similarity predicate. Scores are rounded before
the threshold/argmax so the result is reproducible across engines and
partitionings (sums of doubles differ in the last ulp).

All strategies are one term-join (or dim-join) + one (doc, class) agg +
one per-doc argmax window — shuffle keys are (term) then (doc_id), both
well-distributed; nothing here collects or densifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.postings import doc_term_counts


def _argmax_assign(sims: DataFrame, id_col: str, topic_col: str,
                   threshold: float) -> DataFrame:
    """Per-doc argmax over (6dp sim desc, topic asc), thresholded."""
    sims = sims.withColumn("sim", F.round("sim", 6))
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc(topic_col))
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("sim") >= threshold))
        .select(id_col, topic_col)
    )


def reduce_outliers(
    doc_table: DataFrame,
    scores: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    topic_col: str = "topic",
    strategy: str = "ctfidf",
    threshold: float = 0.0,
    mode: str = "ascii_code",
    outlier_label: int = -1,
    window: int = 4,
    stride: int = 1,
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, topic_col) for EVERY doc: non-outliers unchanged, outliers
    re-assigned per ``strategy`` (or kept at ``outlier_label`` when their
    best score < ``threshold``).

    ``scores`` is the frozen class c-TF-IDF relation (topic_col, term,
    score) — the reference likewise scores outliers against the fitted
    model, not a refit. ``embeddings`` (id_col, vec_col) is required for
    the ``embeddings`` strategy only.
    """
    out_docs = doc_table.filter(F.col(topic_col) == outlier_label)
    keep = doc_table.filter(F.col(topic_col) != outlier_label).select(id_col, topic_col)

    if strategy == "ctfidf":
        dt = doc_term_counts(out_docs.drop(topic_col), text_col, [id_col],
                             mode, with_len=True)
        doc_w = dt.select(id_col, "term",
                          (F.col("tf") / F.col("doc_len")).alias("w"))
        sims = (
            doc_w.join(scores.select(topic_col, "term", "score"), "term")
            .groupBy(id_col, topic_col)
            .agg(F.sum(F.col("w") * F.col("score")).alias("sim"))
        )
    elif strategy == "distributions":
        from bertopic_spark.operators.distribution import approximate_distribution

        sims = approximate_distribution(
            out_docs.drop(topic_col), scores, [topic_col], text_col, id_col,
            window, stride, mode,
        ).withColumnRenamed("weight", "sim")
    elif strategy == "embeddings":
        if embeddings is None:
            raise ValueError("strategy='embeddings' needs an embeddings DataFrame")
        from bertopic_spark.operators.similarity import class_centroids

        keep_emb = doc_table.filter(F.col(topic_col) != outlier_label) \
            .select(id_col, topic_col).join(embeddings, id_col)
        cents = class_centroids(keep_emb, topic_col, vec_col, id_col)
        cnorm = cents.groupBy(topic_col).agg(
            F.sqrt(F.sum(F.col("mean_val") * F.col("mean_val"))).alias("cnorm"))
        ex = out_docs.select(id_col).join(embeddings, id_col).select(
            id_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"))
        dnorm = ex.groupBy(id_col).agg(
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("dnorm"))
        dots = (
            ex.join(cents.select(topic_col, "dim", "mean_val"), "dim")
            .groupBy(id_col, topic_col)
            .agg(F.sum(F.col("val") * F.col("mean_val")).alias("dot"))
        )
        sims = (
            dots.join(dnorm, id_col).join(F.broadcast(cnorm), topic_col)
            .select(id_col, topic_col,
                    (F.col("dot") / (F.col("dnorm") * F.col("cnorm"))).alias("sim"))
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    assigned = _argmax_assign(sims, id_col, topic_col, threshold)
    reassigned = (
        out_docs.select(id_col)
        .join(assigned.withColumnRenamed(topic_col, "_new"), id_col, "left")
        .select(id_col, F.coalesce("_new", F.lit(outlier_label)).cast("long").alias(topic_col))
    )
    return keep.select(id_col, F.col(topic_col).cast("long")).unionByName(reassigned)

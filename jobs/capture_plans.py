#!/usr/bin/env python
"""Append round-2 operator plans to BENCH/PLANS.md.

Captures `.explain("formatted")` for the new operators' headline paths so
the plan-quality evidence stays current: hierarchy pair distances (term
join, never dense), reduce_outliers ctfidf strategy (broadcast dims +
per-doc argmax window), and random-hyperplane bucketing (broadcast coeff
join + two narrow-keyed aggs).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from pyspark.sql import functions as F

    from bertopic_spark.operators.ctfidf import ctfidf, top_k_terms
    from bertopic_spark.operators.postings import class_term_counts, doc_term_counts
    from bertopic_spark.operators.topics import class_pair_distances
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dt = doc_term_counts(docs, "text", ["lang", "doc_id"], "ascii_code")
    x = class_term_counts(dt, ["lang"])
    scores = ctfidf(x, ["lang"])

    sections = []

    sections.append((
        "class_pair_distances (hierarchical_topics) — term join, no dense matrix",
        "The pair-distance relation behind the linkage tree: L2-normalize via a\n"
        "class window, self-join on `term` (inverted index), two-phase agg on the\n"
        "(class_a, class_b) pair key. Nothing materializes a class×term matrix.",
        plan_of(class_pair_distances(scores, "lang")),
    ))

    from bertopic_spark.operators.outliers import reduce_outliers

    d = docs.withColumn(
        "topic", F.when(F.col("doc_id") % 7 == 0, F.lit(-1))
        .otherwise(F.col("doc_id") % 5).cast("long"))
    keep = d.filter(F.col("topic") != -1)
    s2 = ctfidf(class_term_counts(
        doc_term_counts(keep, "text", ["topic", "doc_id"], "ascii_code"), ["topic"]),
        ["topic"])
    sections.append((
        "reduce_outliers (ctfidf strategy) — outlier slice only, argmax window",
        "Outlier docs tokenize once; the class-score join keys on `term`; the\n"
        "argmax is a per-doc window (partition key = doc_id, well distributed).",
        plan_of(reduce_outliers(d, s2, "text", "doc_id", "topic", "ctfidf")),
    ))

    from bertopic_spark.operators.similarity import random_hyperplane_buckets

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sections.append((
        "random_hyperplane_buckets — broadcast coefficient join, narrow aggs",
        "posexplode dims → BroadcastHashJoin with the (plane, dim) coefficient\n"
        "table (n_planes×dim rows) → (id, plane) agg → (id) agg. Shuffle keys\n"
        "are vector ids — uniform by construction.",
        plan_of(random_hyperplane_buckets(emb)),
    ))

    from bertopic_spark.operators.representation import keybert_rerank

    topk = top_k_terms(scores, ["lang"], 10).withColumn("score", F.round("score", 6))
    sections.append((
        "keybert_rerank — candidate-only joins (top_n × classes rows)",
        "Every relation after the candidate window is bounded by top_n ×\n"
        "n_classes; the hash-vector build and cosine agg never touch the corpus.",
        plan_of(keybert_rerank(topk, ["lang"])),
    ))

    out = ["", "# Round-2 operator plans", ""]
    for title, blurb, plan in sections:
        out += [f"## {title}", "", blurb, "", "```", plan, "```", ""]
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n".join(out))
    print(f"appended {len(sections)} plans")


if __name__ == "__main__":
    main()

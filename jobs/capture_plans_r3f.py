#!/usr/bin/env python
"""Append serving-surface plans to BENCH/PLANS.md.

What to check: okapi keeps the query-term semi-join below all scoring and
broadcasts df/idf; percolate is map-side (broadcast registry) plus ONE
bounded (doc, query) agg; search_after's keyset filter sits below the
ranking window (page N never re-ranks pages 1..N-1); grouped pagerank's
loop body is one join + one groupBy keyed by (class, node) — no per-class
plan, one plan for all classes.
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

    from bertopic_spark.operators.bm25 import (bm25_topk, doc_scores,
                                               okapi_bm25_topk, queries_df,
                                               query_terms, search_after)
    from bertopic_spark.operators.fulltext import percolate
    from bertopic_spark.operators.graph import (cooccurrence_edges_grouped,
                                                pagerank_grouped)
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3f", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qt = query_terms(queries_df(
        spark, {0: "table scan", 1: "hash join order"}), "ascii_code")
    scores = doc_scores(docs, text_col="text", id_col="doc_id",
                        mode="ascii_code", persist_counts=False)
    page1 = bm25_topk(scores, qt, k=10)
    cursors = (page1.filter(F.col("rank") == 10)
               .select("query_id", F.col("score").alias("after_score"),
                       F.col("doc_id").alias("after_doc"),
                       F.col("rank").alias("after_rank")))
    ge = cooccurrence_edges_grouped(docs, "text", "doc_id", ["lang"], v=20)
    sections = [
        ("okapi_bm25_topk — query-term semi-join below all scoring, "
         "df/idf broadcast, one (query, doc) exchange",
         okapi_bm25_topk(docs, qt, k=10, text_col="text",
                         persist_counts=False)),
        ("percolate — broadcast standing-query registry, map-side match, "
         "one bounded (doc, query) agg",
         percolate(docs, qt, text_col="text", min_should_match=0.5)),
        ("search_after — keyset filter BELOW the ranking window: page N "
         "prunes before ranking, never re-ranks prior pages",
         search_after(scores, qt, cursors, k=10)),
        ("pagerank_grouped (1 iteration) — one join + one groupBy keyed "
         "by (class, node); a thousand class graphs share this plan",
         pagerank_grouped(ge, ["lang"], iters=1, checkpoint_every=10,
                          checkpoint_last=False)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

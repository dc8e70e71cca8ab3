#!/usr/bin/env python
"""Append the round-3j operator plans to BENCH/PLANS.md.

What to check: the codestruct extractors (comment_term_counts,
symbol_stats, import_edges) are each ONE narrow projection chain
(regexp_extract_all + Generate) into a two-phase HashAggregate — no
join, no extra Exchange beyond the final agg, filters/projection pushed
to the parquet scan; multi_match_topk runs one tokenize+agg leg per
field (inherent: per-field df/avgdl stats), every query-sized relation
enters via BroadcastHashJoin, and the two legs meet in a single
union + (query, doc) hash agg followed by WindowGroupLimit.
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

    from bertopic_spark.operators.bm25 import (multi_match_topk, queries_df,
                                               query_terms)
    from bertopic_spark.operators.codestruct import (comment_term_counts,
                                                     import_edges,
                                                     symbol_stats)
    from bertopic_spark.session import get_spark
    from bertopic_spark.tokenizer import tokens_expr

    spark = get_spark("capture-plans-r3j", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fielded = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(tokens_expr(F.col("text"), "ascii_code"),
                                 1, 5)).alias("title"),
        F.col("text").alias("body"))
    qt = query_terms(queries_df(spark, {0: "customer order", 1: "data table"}))

    src = docs.select("doc_id", "lang", F.col("text").alias("content"))
    sections = [
        ("comment_term_counts — narrow regexp_extract_all + Generate into "
         "a two-phase HashAggregate; no join",
         comment_term_counts(src, ["lang"])),
        ("symbol_stats — same narrow extract shape, one agg with "
         "count + countDistinct",
         symbol_stats(src)),
        ("import_edges — same narrow extract shape keyed by src",
         import_edges(src, "lang")),
        ("multi_match_topk — one tokenize+agg leg per field (field-local "
         "stats), broadcast query joins, single union + (query, doc) agg, "
         "WindowGroupLimit",
         multi_match_topk(fielded, qt, {"title": 2.0, "body": 1.0},
                          k=10, tie_breaker=0.3)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()
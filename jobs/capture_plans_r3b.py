#!/usr/bin/env python
"""Append the round-3 retrieval-surface plans to BENCH/PLANS.md.

Plan-quality checks for the new operators: passage retrieval must show the
query-term broadcast semi-join BELOW the window expansion (passages never
materialize), proximity must be a single scan with zero Exchange, BM25F's
idf/length relations must broadcast, and pack_shards must show no
partitionBy-less window (the prefix sum is partition-local)."""

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
    from bertopic_spark.operators.bm25 import (bm25f_topk, passage_topk,
                                               queries_df, query_terms)
    from bertopic_spark.operators.fulltext import proximity_match
    from bertopic_spark.operators.textstats import pack_shards
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3b", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qt = query_terms(queries_df(spark, {0: "customer order", 1: "table scan"}),
                     "ascii_code")

    sections = [
        ("proximity_match (scan path) — one pass, zero Exchange, "
         "plane sweep inside WholeStageCodegen",
         proximity_match(docs, ["customer", "order"], 12, "text")),
        ("passage_topk — broadcast term semi-join BEFORE window expansion; "
         "passages never materialized",
         passage_topk(docs, qt, window=32, stride=16, k=10,
                      text_col="text")),
        ("bm25f_topk — blended-field postings, broadcast idf/stats, "
         "pushed query-term prune",
         bm25f_topk(docs, qt, {"text": 1.0, "source": 3.0}, k=10,
                    persist_counts=False)),
        ("pack_shards — distributed prefix sum: window is partitioned "
         "by _pid, never a single global partition",
         pack_shards(docs, 5000, text_col="text")),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

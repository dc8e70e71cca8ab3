#!/usr/bin/env python
"""Append the round-3l operator plans to BENCH/PLANS.md.

What to check: function_score_topk evaluates EVERY function in one
narrow projection over the corpus row (a single Project under the join —
functions never cost a pass each) and blends before the rank window;
bq_hamming_topk's Hamming pass is a map-only BroadcastNestedLoopJoin
over the 2x8-byte code relation (no shuffle until the k-bounded rank),
and only the rerank candidates join back to the full vectors;
bm25plus_topk is plan-identical to okapi_bm25_topk (the delta rides the
same agg expression); terms_set_match is one scan with the per-doc
threshold evaluated in the same projection — no join at all.
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

    from bertopic_spark.operators.bm25 import (bm25plus_topk,
                                               function_score_topk,
                                               queries_df, query_terms,
                                               terms_set_match)
    from bertopic_spark.operators.similarity import bq_hamming_topk
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3l", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qt = query_terms(queries_df(spark, {0: "customer order"}))

    sections = [
        ("function_score_multi — one Project evaluates all functions; "
         "blend before the rank window",
         function_score_topk(docs, qt,
                             [F.log1p(F.col("n_chars")), F.lit(0.5)],
                             score_mode="sum", text_col="text")),
        ("ann_bq_topk — map-only Hamming probe over 8-byte codes; only "
         "rerank candidates touch full vectors",
         bq_hamming_topk(emb, [0, 1], k=5, rerank=20)),
        ("terms_set_match — one scan, per-doc threshold in the same "
         "projection, no join",
         terms_set_match(docs, ["hash", "join", "merge"],
                         F.lit(2), text_col="text")),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    # bm25plus materializes eagerly (localCheckpoint) so capture its
    # pre-checkpoint shape via the okapi note instead of a Scan ExistingRDD
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

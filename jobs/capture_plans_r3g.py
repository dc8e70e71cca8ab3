#!/usr/bin/env python
"""Append the round-3g operator plans to BENCH/PLANS.md.

What to check: common_terms keeps BOTH probe joins broadcast (the candidate
set reaches the common postings as a BroadcastHashJoin — stop-term postings
prune map-side, no extra shuffle before the one scoring exchange);
phrase_boost shares ONE positional scan across all query branches (the
union re-uses the persisted sliver, InMemoryTableScan per branch);
synonym folding's map join is broadcast on the big counts side; JM-LM and
minshould reuse the bm25_topk exchange shape (probe semi-join below all
arithmetic); significant_terms is one hash agg + TakeOrderedAndProject
(no single-partition window); decay joins doc times to the AGGREGATED
hits, not the corpus.
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

    from bertopic_spark.operators.bm25 import (common_terms_topk, decay_topk,
                                               doc_scores, lm_jm_topk,
                                               bm25_topk_minshould,
                                               queries_df, query_terms)
    from bertopic_spark.operators.fulltext import (bm25_topk_synonyms,
                                                   phrase_boost_topk,
                                                   significant_terms)
    from bertopic_spark.session import get_spark
    from bertopic_spark.tokenizer import with_tokens

    spark = get_spark("capture-plans-r3g", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qmap = {0: "table scan", 1: "hash join order"}
    qt = query_terms(queries_df(spark, qmap), "ascii_code")
    scores = doc_scores(docs, text_col="text", id_col="doc_id",
                        mode="ascii_code", persist_counts=False)
    times = docs.select(
        "doc_id",
        F.expr("date_sub(date'2026-01-01', cast(doc_id % 365 as int))")
        .alias("mtime"))
    toks = with_tokens(docs, "text", "ascii_code")
    dt = toks.select(
        "doc_id", (F.col("lang") == "en").alias("fg"),
        F.explode(F.array_distinct("tokens")).alias("term"))
    sections = [
        ("common_terms_topk — candidate set BROADCAST onto common "
         "postings (map-side stop-term pruning), one scoring exchange",
         common_terms_topk(scores, qt, k=10, max_df=0.78)),
        ("phrase_boost_topk — one pruned positional scan shared by all "
         "query adjacency branches; boost joins aggregated hits",
         phrase_boost_topk(docs, qmap, k=10, boost=0.01, text_col="text")),
        ("bm25_topk_synonyms — synonym map broadcast on the counts side, "
         "folded re-agg collapses map-side",
         bm25_topk_synonyms(docs, qt, k=10, text_col="text")),
        ("bm25_topk_minshould — matched-count rides the scoring shuffle; "
         "threshold filter BELOW the top-k window",
         bm25_topk_minshould(scores, qt, k=10, min_should=0.6)),
        ("lm_jm_topk — pure matched-term sum, probe semi-join below all "
         "arithmetic, one (query, doc) exchange",
         lm_jm_topk(docs, qt, k=10, text_col="text", persist_counts=False)),
        ("significant_terms — one conditional hash agg over (doc, term), "
         "global top-k via TakeOrderedAndProject (no 1-partition window)",
         significant_terms(dt, k=15)),
        ("decay_topk — gauss multiplier applied to AGGREGATED hits "
         "(doc metadata never joins the corpus), window on decayed score",
         decay_topk(scores, qt, times, now="2026-03-01", scale_days=30)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

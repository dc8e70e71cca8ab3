#!/usr/bin/env python
"""Append the round-3k operator plans to BENCH/PLANS.md.

What to check: match_bool_prefix shares ONE persisted counts relation
(InMemoryTableScan) across the scored leg, the dictionary expansion and
the prefix flag, and joins the legs with a single full-outer on doc_id;
significant_results_terms feeds retrieval and fg/bg stats from the same
cached relation, the k-row foreground set enters via BroadcastHashJoin,
and the vocabulary-wide work is ONE conditional hash agg;
pinned_topk is broadcast-pins + anti-join + one per-query window over
<= k+p rows; semdedup's pair stage is a per-list co-partitioned join
(list_id on both sides of the SortMergeJoin/ShuffledHashJoin key), never
a global cross join; wildcard_terms_indexed's candidate stage is a
gram-IN filter into one hash agg over the pruned gram rows.
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


def _sig_inner(docs, qt):
    """The significant_results_terms pipeline WITHOUT the final eager
    localCheckpoint (which would reduce the captured plan to a Scan
    ExistingRDD) — same operators, same persisted counts handle."""
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import _okapi_query_hits
    from bertopic_spark.operators.fulltext import significant_terms
    from bertopic_spark.operators.postings import doc_term_counts

    x = doc_term_counts(docs, "text", ["doc_id"], "ascii_code",
                        with_len=True).persist()
    hits = _okapi_query_hits(docs, qt, 1.2, 0.75, "text", "doc_id",
                             "ascii_code", counts=x)
    top = (hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
           .select("doc_id"))
    dt = (x.select("doc_id", "term")
          .join(F.broadcast(top.withColumn("_fg", F.lit(True))),
                "doc_id", "left")
          .select("doc_id", "term",
                  F.coalesce("_fg", F.lit(False)).alias("fg")))
    return significant_terms(dt, "fg", 5)


def main() -> None:
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import okapi_bm25_topk, queries_df, query_terms
    from bertopic_spark.operators.dedup import semdedup
    from bertopic_spark.operators.fulltext import (pinned_topk,
                                                   significant_results_terms,
                                                   term_trigrams)
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3k", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qt = query_terms(queries_df(spark, {0: "customer order"}))
    organic = okapi_bm25_topk(docs, qt, k=10, text_col="text")
    dic = (docs.select(F.explode(F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9_]{2,}', 0)")).alias("term"))
        .groupBy("term").count())

    sections = [
        ("significant_results_terms — one cached counts relation feeds "
         "retrieval AND fg/bg stats; k-row fg set broadcasts; one "
         "conditional hash agg over the vocabulary (inner chain shown "
         "pre-localCheckpoint: the operator checkpoints its k_terms-row "
         "output so the shared counts cache can be released)",
         _sig_inner(docs, qt)),
        ("pinned_topk — broadcast pins, anti-join dedup, one per-query "
         "window over <= k+p rows",
         pinned_topk(organic, [42, 7], k=10)),
        ("semdedup pair stage + canonical — per-list co-partitioned pair "
         "join (never global), pointer-jump components, agg-riding argmax",
         semdedup(emb, nlist=4, tau=0.3)),
        ("term_trigrams — narrow generate over the dictionary (no corpus "
         "access)",
         term_trigrams(dic)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()
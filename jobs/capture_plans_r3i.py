#!/usr/bin/env python
"""Append the round-3i operator plans to BENCH/PLANS.md.

What to check: rm3_topk reuses ONE persisted doc_term_counts relation for
both retrieval rounds (InMemoryTableScan on both probe sides, two
(query, doc) hash-agg exchanges total) and every query-sized relation
enters via BroadcastHashJoin/BroadcastNestedLoopJoin — the corpus is
never on the build side; impact_topk is plan-identical to bm25_topk
(broadcast probe, one hash agg, WindowGroupLimit) with the quantized
payload; umass_coherence semi-joins the incidence down to the broadcast
top-k vocabulary BEFORE the doc-id pair self-join, so the only wide
exchange carries the evaluated terms' postings; top_snippets is a single
narrow projection chain (HOF algebra + one posexplode Generate) with NO
Exchange at all.
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
    from bertopic_spark.operators.bm25 import (doc_scores, impact_topk,
                                               quantize_impacts, queries_df,
                                               query_terms, rm3_topk)
    from bertopic_spark.operators.ctfidf import ctfidf, top_k_terms
    from bertopic_spark.operators.evaluation import umass_coherence
    from bertopic_spark.operators.fulltext import top_snippets
    from bertopic_spark.operators.postings import (class_term_counts,
                                                   doc_term_counts)
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3i", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qdf = queries_df(spark, {0: "customer order", 1: "data table"})
    qt = query_terms(qdf)

    dt = doc_term_counts(docs, "text", ["lang", "doc_id"])
    topk = top_k_terms(ctfidf(class_term_counts(dt, ["lang"]), ["lang"]),
                       ["lang"], 10)

    held: list = []
    sections = [
        ("rm3_topk — one persisted counts relation feeds both rounds; all "
         "query-sized relations broadcast; two (query, doc) exchanges",
         rm3_topk(docs, qdf, r=2, m=3, k=10, mu=2000.0, text_col="text",
                  _persisted_out=held)),
        ("impact_quantized_topk — broadcast probe over integer impacts, "
         "one hash agg, WindowGroupLimit (bm25_topk plan shape)",
         None),
        ("umass_coherence — incidence LeftSemi-joined to the broadcast "
         "top-k vocab BEFORE the doc-id pair self-join",
         umass_coherence(topk, dt.select("doc_id", "term"), ["lang"])),
        ("top_snippets — zero-Exchange narrow plan: HOF algebra + one "
         "Generate (posexplode)",
         top_snippets(docs, ["customer", "order"], 3, 8, "text")),
    ]
    imp, meta = quantize_impacts(doc_scores(docs, "text", "doc_id",
                                            _persisted_out=held))
    sections[1] = (sections[1][0], impact_topk(imp, meta, qt, k=10))

    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    for h in held:
        h.unpersist()
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

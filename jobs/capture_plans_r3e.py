#!/usr/bin/env python
"""Append ranking-family plans to BENCH/PLANS.md.

What to check: textrank's co-occurrence self-join is pruned by a BROADCAST
semi-join on the top-V vocabulary BEFORE pairing (fan-out capped at C(V,2));
each PageRank step is one broadcast hash join + one groupBy exchange on the
edge relation (no per-iteration corpus scan once trans is checkpointed);
lm_topk and ltr_features semi-join the postings to the query's terms before
any scoring, with all per-term/per-query stats broadcast and exactly one
(query, doc) exchange; tiered serving's certificate is one agg over the
champion candidates (WindowGroupLimit on query-pruned champions, never the
full index).
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
    from bertopic_spark.operators.bm25 import (champion_lists, doc_scores,
                                               lm_topk, ltr_features,
                                               queries_df, query_terms,
                                               tiered_bm25_topk)
    from bertopic_spark.operators.graph import cooccurrence_edges, pagerank
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3e", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qt = query_terms(queries_df(
        spark, {0: "table scan", 1: "hash join order"}), "ascii_code")
    edges = cooccurrence_edges(docs, "text", "doc_id", v=30)
    scores = doc_scores(docs, text_col="text", id_col="doc_id",
                        mode="ascii_code", persist_counts=False)
    sections = [
        ("cooccurrence_edges — BroadcastHashJoin prunes the doc-term "
         "relation to the top-V vocabulary BEFORE the doc_id self-join; "
         "the pair groupBy is the only wide exchange",
         edges),
        ("pagerank (1 iteration shown) — transition relation checkpointed "
         "once; each step = broadcast join of the bounded rank vector + "
         "one groupBy(dst) exchange",
         pagerank(edges, iters=1, checkpoint_every=10, checkpoint_last=False)),
        ("lm_topk — postings semi-joined to query terms before scoring "
         "(BroadcastHashJoin on term), collection stats one partial agg, "
         "single (query, doc) exchange, WindowGroupLimit top-k",
         lm_topk(docs, qt, k=10, text_col="text", persist_counts=False)),
        ("ltr_features — same pruned single pass emitting the full "
         "feature vector; every per-term/per-query statistic broadcast",
         ltr_features(docs, qt, text_col="text", persist_counts=False)),
        ("tiered_bm25_topk (tier-1 candidates + certificate inputs) — "
         "champion lists are query-pruned by broadcast; the rank window "
         "runs on m·|q| rows per query, never the full index",
         tiered_bm25_topk(scores, qt, k=10, m=32)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Append the round-3m operator plans to BENCH/PLANS.md.

What to check: rank_feature_topk's feature is ONE narrow Project over
the corpus (never a second pass) joined to the Okapi hits;
distance_feature_topk is filter → scoring Project → a single k-bounded
rank exchange (no join); intervals_match / span_within_match run their
whole rule tree inside WholeStageCodegen over the token array (one scan,
no shuffle before the result projection); moving_percentiles never
shuffles raw rows — the exchanges all carry (keys, bucket, bin) grid
rows; search_query_range's n_chars range lands in the parquet scan's
PushedFilters; matryoshka stage 1 slices the vector in the same Project
as the coarse cosine (no extra scan for the prefix).
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


def _range_gate(docs):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.querylang import _range_pred, parse_query
    from bertopic_spark.tokenizer import with_tokens

    spec = parse_query("+table scan n_chars:[150 TO 300}")
    cand = with_tokens(docs, "text", "ascii_code")
    for col, lo, hi, li, hi_ in spec["ranges"]:
        cand = cand.filter(_range_pred(col, lo, hi, li, hi_))
    return cand.filter(F.array_contains("tokens", "table")).select("doc_id")


def main() -> None:
    from pyspark.sql import functions as F

    from bertopic_spark.operators.bm25 import (distance_feature_topk,
                                               queries_df, query_terms,
                                               rank_feature_topk)
    from bertopic_spark.operators.fulltext import (intervals_match,
                                                   span_within_match)
    from bertopic_spark.operators.querylang import search_query
    from bertopic_spark.operators.rollup import moving_percentiles
    from bertopic_spark.operators.similarity import matryoshka_topk
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3m", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qt = query_terms(queries_df(spark, {0: "customer order"}))

    sections = [
        ("rank_feature_topk — feature in ONE narrow corpus Project, "
         "joined to the Okapi hits, never a second pass",
         rank_feature_topk(docs, qt, "n_chars", pivot=200.0,
                           text_col="text")),
        ("distance_feature_topk — filter, scoring Project, one k-bounded "
         "rank exchange; no join",
         distance_feature_topk(ev, "ts", "2024-01-15 00:00:00", 3 * 86400e6,
                               filter_cond=F.col("event_type") == "click")),
        ("intervals_match — whole rule tree in WholeStageCodegen over the "
         "token array; one scan, no shuffle",
         intervals_match(docs, {"all_of": [{"match": ["table", "scan"]},
                                           {"any_of": [{"match": ["merge"]},
                                                       {"match": ["join"]}]}],
                                "ordered": True, "max_gaps": 6},
                         text_col="text")),
        ("span_within_match — nested exists-HOF containment, one scan",
         span_within_match(docs, "scan", ("hash", "join"), slop=6,
                           text_col="text")),
        ("moving_percentiles — every exchange carries grid rows "
         "(keys, bucket, bin), never raw events",
         moving_percentiles(ev, "ts", "value", "day", 7, (0.5, 0.9),
                            0.0, 400.0, 32, keys=("event_type",))),
        # search_query itself localCheckpoints (its plan collapses to a
        # Scan ExistingRDD) — capture the gating relation it builds, where
        # the range must reach the parquet scan
        ("search_query_range gating side — n_chars range in the scan's "
         "PushedFilters (integral bounds stay cast-free)",
         _range_gate(docs)),
        ("ann_matryoshka_topk — prefix slice + coarse cosine in one "
         "Project; only candidates re-rank full vectors",
         matryoshka_topk(emb, [0, 1], k=5, prefix_dims=16,
                         n_candidates=20)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

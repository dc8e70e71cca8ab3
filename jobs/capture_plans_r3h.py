#!/usr/bin/env python
"""Append the round-3h operator plans to BENCH/PLANS.md.

What to check: composite_agg's after-key lands in the parquet scan as
PushedFilters on the RAW rows (the keyset predicate runs below the
aggregation — deep pages never aggregate already-served buckets) and the
final sort is a TakeOrderedAndProject over one page of bucket rows;
term_vectors pushes the requested-id In(...) filter to the scan on the
per-doc half and BroadcastHashJoins the term-set prune on the statistics
half (the corpus-wide agg shuffles only the requested terms).
phrase_suggest materializes a lattice-sized local result (its return plan
is a LocalTableScan by design), so its internals are asserted by pytest
rather than captured here.
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
    from datetime import datetime

    from pyspark.sql import functions as F

    from bertopic_spark.operators.fulltext import term_vectors
    from bertopic_spark.operators.rollup import composite_agg
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3h", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    sections = [
        ("composite_agg page 2 — after-key keyset predicate PUSHED BELOW "
         "the agg to the raw scan; one-page TakeOrderedAndProject",
         composite_agg(
             ev,
             [("event_type", F.col("event_type")),
              ("day", F.date_trunc("day", F.col("ts")))],
             [("n_events", F.count(F.lit(1)).cast("long")),
              ("sum_value", F.round(F.sum("value"), 6))],
             size=10, after=("click", datetime(2024, 1, 25)))),
        ("term_vectors — In(doc_id) pushed to the per-doc scan; term-set "
         "broadcast prune before the corpus-stats agg",
         term_vectors(docs, [1, 2, 3, 5, 8], "text", "doc_id",
                      "ascii_code")),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

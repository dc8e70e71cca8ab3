#!/usr/bin/env python
"""Append the round-3n (analytics wave) operator plans to BENCH/PLANS.md.

What to check: funnel_conversion is ONE shuffle on the user key (the
chain is array HOFs over per-step timestamp arrays — no join per step);
rolling/cumulative cardinality exchanges carry only (bucket, idx)
register rows; ewma's triangular join is over the bucket relation with
a rank window, never raw events; bloom_semi_join's bit probes are
BroadcastHashJoins (map-side) with the single exact semi-join shuffle
last; cohort_retention shuffles on the user key then the
(cohort, offset) pair.
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

    from bertopic_spark.operators.rollup import (cohort_retention,
                                                 ewma_smooth,
                                                 seasonal_anomalies)
    from bertopic_spark.operators.sketch import (bloom_semi_join,
                                                 rolling_cardinality)
    from bertopic_spark.operators.temporal import funnel_conversion
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3n", cpus=8, shuffle_partitions=8)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    b = (ev.groupBy("event_type", F.date_trunc("day", F.col("ts"))
                    .alias("d"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    keys = (orders.filter(F.col("o_totalprice") > 150000.0)
            .select(F.col("o_orderkey").alias("l_orderkey")))

    sections = [
        ("funnel_conversion — one user-key shuffle, array-HOF chain",
         funnel_conversion(ev, ("view", "click", "purchase"),
                           window_us=7 * 86400 * 10**6)),
        ("rolling_cardinality — exchanges carry (bucket, idx) register "
         "rows only",
         rolling_cardinality(
             ev.select("ts", F.col("user_id").cast("string").alias("u")),
             "ts", "u", "day", window=7, p=8)),
        ("ewma_smooth — triangular join over the BUCKET relation",
         ewma_smooth(b, "d", "n", alpha=0.3, keys=("event_type",))),
        ("seasonal_anomalies — two bucket-relation aggs + broadcast "
         "moments join",
         seasonal_anomalies(ev, "ts", keys=("event_type",))),
        ("bloom_semi_join — broadcast bit probes, one exact semi-join "
         "shuffle last",
         bloom_semi_join(li, keys, "l_orderkey")),
        ("cohort_retention — user-key shuffle then (cohort, offset) agg",
         cohort_retention(ev, "ts", "user_id")),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

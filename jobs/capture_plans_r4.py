#!/usr/bin/env python
"""Append the round-4 operator plans to BENCH/PLANS.md.

What to check: the guarded containment self-join anti-joins a BROADCAST
heavy-shingle relation before the equi-join (no m² path for boilerplate
keys); histogram_quantile / change_point / ks_test windows run over
BUCKET/DISTINCT-VALUE relations after a distributed groupBy, never over
raw rows; terms_lookup's query terms are a broadcast side onto the
postings probe (the lookup row never travels as a driver literal).
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
    import __spark_entry__ as e
    from bertopic_spark.session import get_spark

    spark = get_spark("plans-r4", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    sections = []
    for name, note in [
        ("dedup_containment", "auto heavy-shingle guard: broadcast "
         "anti-join (left_anti, BuildRight) precedes the shingle "
         "self-join — the m² boilerplate path is cut before the shuffle"),
        ("dedup_containment_boiler", "pathological 1000-doc boiler "
         "cluster through the same guarded plan"),
        ("prom_histogram_quantile", "bucket build = one distributed "
         "groupBy over events; the quantile window runs over "
         "|series|x|le| rows only"),
        ("change_point_hourly", "hourly agg shuffles once on "
         "(event_type, hour); cusum + argmax windows partition by "
         "event_type over the bucket relation"),
        ("ks_value_click_vs_purchase", "per-distinct-value counts via "
         "distributed groupBy; the single-partition ECDF window touches "
         "distinct values only (documented coordinator-sized scan)"),
        ("terms_lookup_topk", "lookup tokens -> broadcast term relation "
         "joined onto the okapi postings probe; self filtered at scan"),
    ]:
        sections.append(f"\n## r4: {name}\n\n_{note}_\n\n```\n"
                        f"{plan_of(qs[name](spark, SF))}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(sections))
    print(f"appended {len(sections)} r4 plans")


if __name__ == "__main__":
    main()

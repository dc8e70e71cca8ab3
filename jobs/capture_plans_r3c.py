#!/usr/bin/env python
"""Append sketch/sampler plans to BENCH/PLANS.md.

What to check: CMS/HLL aggregations exchange AT MOST the fixed grid
(depth×width / 2^p keys) regardless of vocabulary; the stratified sampler
is a pure Filter inside the scan (zero Exchange, zero Window)."""

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
    from bertopic_spark.operators.distribution import stratified_sample
    from bertopic_spark.operators.fulltext import doc_term_positions
    from bertopic_spark.operators.sketch import cms_build, hll_registers
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3c", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    terms = doc_term_positions(docs, "text", "doc_id").select("term")
    sections = [
        ("cms_build — the exchange carries the fixed depth×width grid, "
         "never the vocabulary (partial HashAggregate before it)",
         cms_build(docs, depth=4, width=64)),
        ("hll_registers — ≤ 2^p keys through the exchange at any "
         "cardinality",
         hll_registers(terms, "term", p=8)),
        ("stratified_sample — pure Filter inside the scan: zero Exchange, "
         "zero Window",
         stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1})),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

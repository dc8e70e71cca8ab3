#!/usr/bin/env python
"""Append quality-signal plans to BENCH/PLANS.md.

What to check: each operator tokenizes/explodes the corpus exactly ONCE —
the shared counts relation is persisted (InMemoryTableScan on every other
consumer) because the consumers' column pruning differs and ReuseExchange
cannot dedupe them; dup_spans ships md5 digests (never window strings)
through its single groupBy exchange and binds the token array as a HOF
lambda var so CollapseProject cannot inline the tokenizer per window.
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
    from bertopic_spark.operators.dedup import duplicate_spans
    from bertopic_spark.operators.textstats import langid_ngram, lm_perplexity
    from bertopic_spark.session import get_spark

    spark = get_spark("capture-plans-r3d", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sections = [
        ("lm_perplexity — one tokenize pass: the (id, term, tf) counts "
         "relation is persisted and feeds both the LM agg and the scoring "
         "join as InMemoryTableScan; LM is a shuffle join (vocabulary-"
         "sized), scalars broadcast",
         lm_perplexity(docs)),
        ("langid_ngram — one gram-explode pass: persisted (id, label, "
         "gram, tf) base feeds profile agg + scoring join + doc lengths; "
         "label stats broadcast, no dense doc×label matrix",
         langid_ngram(docs)),
        ("dup_spans — single Generate (token array HOF-bound), md5 "
         "digests through one two-phase groupBy exchange",
         duplicate_spans(docs)),
    ]
    out = []
    for title, df in sections:
        out.append(f"\n## {title}\n\n```\n{plan_of(df)}\n```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "a") as f:
        f.write("\n" + "\n".join(out))
    print("appended", len(sections), "plans")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Price the registry/expansion guard caps AT the boundary (VERDICT r4 #7).

The percolator's ``max_registry`` and the term-expansion ``max_expand``
caps are raised by unit tests but never exercised at bench scale — this
job runs both guards at their boundary on the sf documents table and
writes the measured cost to BENCH/CAPS.md:

* ``percolate_phrases`` with a registry of EXACTLY ``--registry`` phrases
  (cap == registry size, the worst legal case): prices the driver-side
  tokenize + the one-pass N-phrase adjacency-HOF projection — the plan
  whose codegen cost grows with the registry, i.e. the guard exists to
  bound THIS.
* ``wildcard_terms`` with ``max_expand`` set to exactly the match count:
  prices the dictionary scan + limit(cap+1) collect the guard performs.

Usage:  python jobs/cap_boundary_bench.py [--sf-dir /root/testdata/sf0.1]
        [--registry 512] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--registry", type=int, default=512)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from bertopic_spark import get_spark
    from bertopic_spark.operators.fulltext import (percolate_phrases,
                                                   term_dictionary,
                                                   wildcard_terms)

    spark = get_spark("cap-boundary", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_docs = docs.count()

    # -- percolator phrase registry at the cap -----------------------------
    # Real two-token phrases drawn from the corpus (adjacent token pairs),
    # so a fraction actually match and the match path is exercised too.
    pairs = (docs.select(F.split(F.lower("text"), r"\s+").alias("t"))
             .select(F.expr(
                 "transform(sequence(0, least(size(t) - 2, 3)), "
                 "i -> concat(t[i], ' ', t[i + 1]))").alias("ps"))
             .select(F.explode("ps").alias("phrase"))
             .filter(F.length("phrase") > 5)
             .distinct().limit(args.registry).collect())
    ph = spark.createDataFrame(
        [(i, r["phrase"]) for i, r in enumerate(pairs)],
        "query_id long, phrase string")
    n_reg = ph.count()
    qt = spark.createDataFrame(
        [(i, pairs[i]["phrase"].split()[0]) for i in range(len(pairs))],
        "query_id long, term string")
    t0 = time.perf_counter()
    n_matches = percolate_phrases(
        docs, qt, ph, text_col="text", min_should_match=1.0,
        max_registry=n_reg).count()
    t_perc = time.perf_counter() - t0

    # -- wildcard expansion at the cap --------------------------------------
    # On the synthetic code corpus — its identifier vocabulary is in the
    # thousands, so the expansion boundary is a real list, not a handful.
    from bertopic_spark.corpus import load_corpus

    code = load_corpus(spark, 2000)
    dictionary = term_dictionary(code, "content").persist()
    n_vocab = dictionary.count()
    pattern = "s*"
    n_match = dictionary.filter(F.col("term").rlike("^s.*$")).count()
    t0 = time.perf_counter()
    terms = wildcard_terms(dictionary, pattern, max_expand=n_match)
    t_wild = time.perf_counter() - t0
    assert len(terms) == n_match
    dictionary.unpersist()

    payload = {
        "sf_dir": args.sf_dir, "docs": n_docs,
        "percolate_phrases_registry": n_reg,
        "percolate_phrases_at_cap_sec": round(t_perc, 3),
        "percolate_matches": n_matches,
        "vocab": n_vocab, "wildcard_expansion": n_match,
        "wildcard_at_cap_sec": round(t_wild, 3),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    md = f"""# Guard caps priced at the boundary

`jobs/cap_boundary_bench.py` on `{args.sf_dir}` ({n_docs} docs,
local[{args.cpus}]) — the caps exercised AT their limit, not just raised
past it (VERDICT r4 #7):

| guard | boundary | measured |
|---|---|---|
| `percolate_phrases` `max_registry` | registry of exactly {n_reg} corpus phrases (cap == size) | **{t_perc:.2f}s** one positional join, {n_matches} (doc, query) matches |
| `wildcard_terms` `max_expand` | `{pattern}` expanding to exactly {n_match} of {n_vocab} vocab terms (cap == count) | **{t_wild:.2f}s** dictionary scan + limit(cap+1) collect |

Reading: the phrase leg is ONE broadcast (pid, idx, term) join against a
positional explode of the documents, so its cost is linear in matching
postings and flat in registry size (the r4 plan — N per-phrase HOF
expressions in a single projection — cost 46s for 128 phrases × 500 docs
and is what this measurement caught; rewritten round 5). The cap now
guards the driver-side registry tokenize + broadcast, not the document
pass. The wildcard guard's own cost is one dictionary scan — the cap
prevents the *downstream* broadcast of an unbounded literal list, not
this scan.

```json
{json.dumps(payload)}
```
"""
    with open(os.path.join(repo, "BENCH", "CAPS.md"), "w") as f:
        f.write(md)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

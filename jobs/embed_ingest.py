#!/usr/bin/env python
"""spark-submit example: wire an EXTERNAL embedding table through the
X1 embedding-backend seam, end to end.

The engine never runs an encoder (reference ``backend/_base.py:5`` threads
one through fit; no model weights live in this sandbox) — instead ANY
upstream system that produced an (id, vector) parquet plugs in here:

    embeddings.parquet (vec_id, embedding: array<float>)
        │
        ├── fit(embeddings=...)            — X1 seam on the facade
        │       └── visualize_documents()  — seeded 2-D map + topic labels
        └── semdedup(...)                  — embedding-cluster dedup plan

Usage (cluster-shaped; local[N] in the sandbox):

  spark-submit --py-files bertopic_spark.zip jobs/embed_ingest.py \
      --docs /root/testdata/sf0.01/documents.parquet \
      --embeddings /root/testdata/sf0.01/embeddings.parquet \
      --output /tmp/embed_ingest_out [--nlist 8] [--tau 0.95]

Writes two parquet relations under --output:
  docmap/   (doc_id, x, y, lang, label)   — visualize_documents data
  semdedup/ (component, keep_id, n_members) — duplicate groups + keepers
and prints one JSON line with row counts + timings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain-python fallback; under spark-submit --py-files the zip provides it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True,
                   help="documents parquet with (doc_id, text, lang)")
    p.add_argument("--embeddings", required=True,
                   help="external (vec_id, embedding array<float>) parquet — "
                        "vec_id rows pair with doc_id rows 1:1")
    p.add_argument("--output", required=True)
    p.add_argument("--nlist", type=int, default=8)
    p.add_argument("--tau", type=float, default=0.95)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from bertopic_spark import get_spark
    from bertopic_spark.model import BERTopicSpark
    from bertopic_spark.operators.dedup import semdedup

    spark = get_spark("embed-ingest", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    t0 = time.perf_counter()
    docs = spark.read.parquet(args.docs)
    emb = spark.read.parquet(args.embeddings).select(
        F.col("vec_id").alias("doc_id"), "embedding")

    # X1 seam: pre-computed vectors ride fit(); the engine stores them for
    # topic_embeddings / find_topics(vector) / visualize_documents.
    model = BERTopicSpark(class_cols=["lang"]).fit(
        docs, "text", "doc_id", embeddings=emb)
    docmap = model.visualize_documents()
    docmap.write.mode("overwrite").parquet(f"{args.output}/docmap")
    n_map = spark.read.parquet(f"{args.output}/docmap").count()
    t1 = time.perf_counter()

    dd = semdedup(spark.read.parquet(args.embeddings),
                  nlist=args.nlist, tau=args.tau)
    dd.write.mode("overwrite").parquet(f"{args.output}/semdedup")
    n_groups = spark.read.parquet(f"{args.output}/semdedup").count()
    t2 = time.perf_counter()

    print(json.dumps({
        "docmap_rows": n_map, "semdedup_groups": n_groups,
        "fit_docmap_sec": round(t1 - t0, 3),
        "semdedup_sec": round(t2 - t1, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""spark-submit example: import a reference-saved BERTopic model directory
and bring its count-reaggregation surfaces back online — the S5 story end
to end (VERDICT r4 #8).

The reference persists fitted models as safetensors CSR + vocab + sizes
(``bertopic/_save_utils.py:44-52``); that artifact carries scores and the
idf diagonal but never the class-term COUNTS, so after a bare import only
the score-driven surfaces work. Reattaching the fitted corpus
(``attach_corpus``) backfills tf/df from the documents themselves:

    model dir (ctfidf.safetensors + ctfidf_config.json + topics.json)
        │
        ├── BERTopicSpark.import_reference_model   — scores/stats/sizes
        │       └── get_topic_info()               — works immediately
        └── attach_corpus(docs)                    — backfills tf/df
                └── topics_over_time(ts)           — count path restored

Usage (cluster-shaped; local[N] in the sandbox):

  spark-submit --py-files bertopic_spark.zip jobs/import_reference.py \
      --model-dir /path/to/saved_model \
      --docs docs.parquet            # (doc_id, <class col>, text[, ts]) \
      --output /tmp/import_out [--class-col topic] [--ts-col ts]

Writes two parquet relations under --output:
  topic_info/  (topic, count, name)                — available pre-attach
  over_time/   (ts_bin, topic, term, score, rank)  — requires the corpus
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
    p.add_argument("--model-dir", required=True,
                   help="reference save dir: ctfidf.safetensors + "
                        "ctfidf_config.json + topics.json")
    p.add_argument("--docs", required=True,
                   help="fitted-corpus parquet with (doc_id, class col, "
                        "text[, ts]) — the doc→topic assignment rides the "
                        "table as a column")
    p.add_argument("--output", required=True)
    p.add_argument("--class-col", default="topic")
    p.add_argument("--ts-col", default="ts",
                   help="timestamp column for topics_over_time; skipped "
                        "when the docs table lacks it")
    p.add_argument("--text-col", default="text")
    p.add_argument("--nr-bins", type=int, default=8)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args(argv)

    from bertopic_spark import get_spark
    from bertopic_spark.model import BERTopicSpark

    spark = get_spark("import-reference", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    t0 = time.perf_counter()
    model = BERTopicSpark.import_reference_model(
        spark, args.model_dir, topic_col=args.class_col)
    info = model.get_topic_info()
    info.write.mode("overwrite").parquet(f"{args.output}/topic_info")
    n_topics = spark.read.parquet(f"{args.output}/topic_info").count()
    t1 = time.perf_counter()

    docs = spark.read.parquet(args.docs)
    model.attach_corpus(docs, args.text_col, "doc_id")
    payload = {"topics": n_topics, "import_sec": round(t1 - t0, 3)}
    if args.ts_col in docs.columns:
        ot = model.topics_over_time(args.ts_col, nr_bins=args.nr_bins)
        ot.write.mode("overwrite").parquet(f"{args.output}/over_time")
        payload["over_time_rows"] = \
            spark.read.parquet(f"{args.output}/over_time").count()
    payload["attach_sec"] = round(time.perf_counter() - t1, 3)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

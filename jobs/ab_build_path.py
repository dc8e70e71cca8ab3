#!/usr/bin/env python
"""A/B the checkpointed index-build docids strategies, same session.

VERDICT r2 flagged a possible ~1.5x real slowdown in the index-build path
and attributed it to the round-2 docids change (store only the
(repo, path, commit) -> doc_id key map; reattach content by a map join
against a fresh corpus scan) vs the round-1 behaviour (write an
id-carrying COPY of the corpus into the index root and stream the
postings stage from that copy).

This job builds the same corpus both ways, interleaved in one session
(A, B, A, B) so host-speed drift hits both variants equally, verifies the
postings stages are content-identical, and prints one JSON line with
per-trial stage timings. Storage written by each variant's docids stage
is also reported — the map-only path's entire point is not duplicating
corpus bytes into the index root (at 100 TB the copy doubles storage and
write IO).

Usage: python jobs/ab_build_path.py [n_files] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_style_build(spark, corpus, root: str, span: int = 4096) -> dict:
    """Round-1 shape: docids stage materializes the FULL id-carrying corpus
    (content duplicated into the index root); postings streams from it."""
    from pyspark.sql import functions as F

    from bertopic_spark.index.checkpoint import df_fingerprint, run_stage
    from bertopic_spark.index.segments import assign_doc_ids, build_block_index
    from bertopic_spark.operators.bm25 import doc_scores

    keys = ["repo", "path", "commit"]
    timings = {}
    t0 = time.perf_counter()
    fp = df_fingerprint(corpus)
    timings["invariant_fingerprint"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    with_ids = run_stage(
        spark, os.path.join(root, "docids"), "docids", fp + "_old",
        lambda: assign_doc_ids(corpus, keys),
    )
    timings["stage_docids"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    postings = run_stage(
        spark, os.path.join(root, "postings"), "postings", fp + "_old_p",
        lambda: doc_scores(with_ids, text_col="content", id_col="doc_id",
                           mode="ascii_code"),
    )
    timings["stage_postings"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    run_stage(
        spark, os.path.join(root, "blocks"), "blocks", fp + "_old_b",
        lambda: build_block_index(postings, span),
    )
    timings["stage_blocks"] = round(time.perf_counter() - t0, 3)
    return timings


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def main() -> None:
    from bertopic_spark.corpus import load_corpus
    from bertopic_spark.index.checkpoint import IndexBuild, df_fingerprint
    from bertopic_spark.session import get_spark

    spark = get_spark("ab_build", cpus=CPUS, shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_corpus(spark, N_FILES).persist()
    n_docs = corpus.count()

    out = {"n_files": N_FILES, "cpus": CPUS, "trials": []}
    fp_postings = {}
    for trial in range(TRIALS):
        for variant in ("new_map_join", "old_corpus_copy"):
            root = tempfile.mkdtemp(prefix=f"ab_{variant}_")
            t0 = time.perf_counter()
            if variant == "new_map_join":
                b = IndexBuild(spark, root)
                b.build(corpus)
                stages = dict(b.timings)
            else:
                stages = old_style_build(spark, corpus, root)
            total = round(time.perf_counter() - t0, 3)
            rec = {
                "variant": variant, "trial": trial, "total_sec": total,
                "docs_per_sec": round(n_docs / total, 1),
                "docids_stage_bytes": dir_bytes(os.path.join(root, "docids")),
                **{f"t_{k}": v for k, v in stages.items()},
            }
            out["trials"].append(rec)
            if trial == 0:
                fp_postings[variant] = df_fingerprint(
                    spark.read.parquet(os.path.join(root, "postings"))
                    .select("doc_id", "term", "tf"))
            shutil.rmtree(root, ignore_errors=True)
    out["postings_identical"] = len(set(fp_postings.values())) == 1
    out["postings_fingerprints"] = fp_postings
    for variant in ("new_map_join", "old_corpus_copy"):
        ts = [t["total_sec"] for t in out["trials"] if t["variant"] == variant]
        out[f"{variant}_best_sec"] = min(ts)
    out["new_vs_old_ratio"] = round(
        out["new_map_join_best_sec"] / out["old_corpus_copy_best_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

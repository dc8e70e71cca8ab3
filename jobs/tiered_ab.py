"""Tiered-serving A/B: certified champion-list serving vs exhaustive BM25.

Measures, on the synthetic code corpus with the fixture query batch:
* tier-1 certification rate per champion size m (how many queries the
  bound certificate can answer without touching the full index),
* wall time vs the exhaustive scorer (same session, interleaved),
* and verifies rank-identity (the operator's contract) on every run.

Run:  python jobs/tiered_ab.py [n_files] [n_queries]
Prints one JSON line; recorded in BENCH/TIERED.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bertopic_spark import get_spark  # noqa: E402
from bertopic_spark.corpus import fixture_queries, load_corpus  # noqa: E402
from bertopic_spark.operators.bm25 import (bm25_topk, champion_lists,  # noqa: E402
                                           doc_scores, okapi_doc_scores,
                                           queries_df, query_terms,
                                           tiered_bm25_topk)


def main(n_files: int = 20000, n_queries: int = 40) -> dict:
    spark = get_spark("tiered-ab", cpus=32)
    corpus = load_corpus(spark, n_files=n_files).persist()
    corpus.count()
    scores = doc_scores(corpus, text_col="content", id_col="doc_id").persist()
    scores.count()
    qt = query_terms(queries_df(spark, fixture_queries(n_queries)),
                     "ascii_code").persist()
    qt.count()
    oscores = okapi_doc_scores(corpus, text_col="content",
                               id_col="doc_id").persist()
    oscores.count()
    t0 = time.perf_counter()
    base = sorted(map(tuple, bm25_topk(scores, qt, k=10).collect()))
    t_exh = time.perf_counter() - t0
    t0 = time.perf_counter()
    obase = sorted(map(tuple, bm25_topk(oscores, qt, k=10).collect()))
    t_oexh = time.perf_counter() - t0
    out = {"n_files": n_files, "n_queries": n_queries,
           "exhaustive_s": round(t_exh, 3),
           "okapi_exhaustive_s": round(t_oexh, 3),
           "levels": [], "okapi_levels": []}
    for rel, truth, key in ((scores, base, "levels"),
                            (oscores, obase, "okapi_levels")):
        _sweep(out, rel, truth, key, qt)
    print(json.dumps(out))
    return out


def _sweep(out, scores, base, key, qt):
    for m in (32, 128, 512, 2048):
        # champions precomputed offline in a real deployment — measure
        # both the (one-off) build and the per-batch serve
        t0 = time.perf_counter()
        ch = champion_lists(scores, m=m)
        ch = (ch[0].persist(), ch[1].persist())
        ch[0].count(), ch[1].count()
        t_build = time.perf_counter() - t0
        rep: dict = {}
        handles: list = []
        t0 = time.perf_counter()
        got = sorted(map(tuple, tiered_bm25_topk(
            scores, qt, k=10, m=m, champions=ch, _report_out=rep,
            _persisted_out=handles).collect()))
        t_serve = time.perf_counter() - t0
        for h in handles:
            h.unpersist()
        ch[0].unpersist(), ch[1].unpersist()
        out[key].append({
            "m": m,
            "champion_build_s": round(t_build, 3),
            "serve_s": round(t_serve, 3),
            "tier1_queries": len(rep["served_tier1"]),
            "escalated_queries": len(rep["escalated"]),
            "rank_identical": got == base,
        })


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    main(n, q)

"""IVF-PQ ANN (operators/similarity.ivfpq_topk): candidate containment in
the IVF probe set, ADC agreement with full-corpus PQ on probed lists,
degenerate full-probe equivalence, and refine-stage exactness."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.similarity import (cosine_topk, ivf_assign,
                                                 ivf_centroids, ivfpq_topk,
                                                 pq_topk_adc)

QIDS = [0, 1, 2]
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_results_only_from_probed_lists(spark, emb):
    nlist, nprobe = 8, 2
    out = ivfpq_topk(emb, QIDS, k=10, nlist=nlist, nprobe=nprobe).collect()
    assert out
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = ivf_centroids(emb, nlist)
    lists = {r["vec_id"]: r["list_id"]
             for r in ivf_assign(base, cents).collect()}
    from bertopic_spark.operators.similarity import cosine_expr
    probes = {}
    q = base.filter(F.col("vec_id").isin(QIDS))
    sims = (q.crossJoin(F.broadcast(cents))
            .select(F.col("vec_id").alias("qid"), "list_id",
                    cosine_expr(F.col("v"), F.col("cv")).alias("s")).collect())
    for qid in QIDS:
        rows = sorted((r for r in sims if r["qid"] == qid),
                      key=lambda r: (-r["s"], r["list_id"]))
        probes[qid] = {r["list_id"] for r in rows[:nprobe]}
    for r in out:
        assert lists[r["vec_id"]] in probes[r["query_vec_id"]]


def test_full_probe_matches_pq_adc(spark, emb):
    """nprobe = nlist probes everything → identical to plain PQ-ADC."""
    a = sorted(map(tuple, ivfpq_topk(emb, QIDS, k=10, nlist=4, nprobe=4,
                                     m=8, ksub=16).collect()))
    b = sorted(map(tuple, pq_topk_adc(emb, QIDS, k=10, m=8,
                                      ksub=16).collect()))
    assert a == b


def test_refine_reranks_exactly(spark, emb):
    """With refine large enough, the refined scores are true cosines —
    every returned score equals the exact cosine for that pair."""
    exact = {(r["query_vec_id"], r["vec_id"]): r["cos"]
             for r in cosine_topk(emb, QIDS, k=1 << 30).collect()}
    out = ivfpq_topk(emb, QIDS, k=5, nlist=4, nprobe=4, refine=20).collect()
    for r in out:
        assert abs(r["score"] - exact[(r["query_vec_id"], r["vec_id"])]) < 1e-9

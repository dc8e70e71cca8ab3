"""Scale-path dedup/ANN variants: banded SimHash pairs (exact within the
pigeonhole guarantee) and seeded random-hyperplane LSH."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

SF_DIR_EMB = None  # resolved from conftest's documents fixture dir


def test_simhash_banded_pairs_exact_within_guarantee(documents_df):
    """For hamming ≤ max_hamming < bands, banding loses NOTHING: the banded
    candidate set must contain every qualifying pair (pigeonhole), and the
    XOR verification keeps precision exact — so result == brute force."""
    from bertopic_spark.operators.dedup import simhash, simhash_neardup_pairs

    bits, bands, maxham = 48, 4, 3
    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash(documents_df, "text", "doc_id", bits).collect()}
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= maxham
    }
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_neardup_pairs(documents_df, "text", "doc_id",
                                 bits, bands, maxham).collect()}
    assert got == brute
    assert len(got) > 0  # fixture corpus does contain near-dups


def test_simhash_banded_pairs_guards(documents_df):
    from bertopic_spark.operators.dedup import simhash_neardup_pairs

    with pytest.raises(ValueError):
        simhash_neardup_pairs(documents_df, "text", "doc_id", bits=50, bands=4)
    with pytest.raises(ValueError):
        simhash_neardup_pairs(documents_df, "text", "doc_id",
                              bits=48, bands=4, max_hamming=4)
    with pytest.raises(ValueError):
        simhash_neardup_pairs(documents_df, "text", "doc_id", bits=64, bands=4)


def test_rplsh_buckets_and_scores(spark):
    from bertopic_spark.operators.similarity import (cosine_expr,
                                                     random_hyperplane_buckets,
                                                     rplsh_cosine_topk)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = {r["vec_id"]: r["bucket"] for r in
          random_hyperplane_buckets(emb).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in
          random_hyperplane_buckets(emb).collect()}
    assert b1 == b2  # deterministic across plans
    assert len(set(b1.values())) > 1  # real hyperplanes spread the space
    out = rplsh_cosine_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    for r in out:
        assert b1[r["query_vec_id"]] == b1[r["vec_id"]]  # co-bucket only
    # scores are true cosines (approximation is recall-only, not value)
    if out:
        pair = out[0]
        va = emb.filter(F.col("vec_id") == pair["query_vec_id"]) \
            .select(F.col("embedding").cast("array<double>").alias("v"))
        vb = emb.filter(F.col("vec_id") == pair["vec_id"]) \
            .select(F.col("embedding").cast("array<double>").alias("v"))
        exact = va.crossJoin(vb.withColumnRenamed("v", "w")).select(
            F.round(cosine_expr(F.col("v"), F.col("w")), 6).alias("c")
        ).collect()[0]["c"]
        assert exact == pytest.approx(pair["cos"], abs=1e-6)

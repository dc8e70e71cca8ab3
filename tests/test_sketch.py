"""Count-min sketch: one-sided error, exactness at wide width, linearity
(merge == build-on-union), cross-partitioning determinism."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.sketch import cms_build, cms_estimate, cms_merge
from bertopic_spark.tokenizer import tokenize_one

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def true_counts(docs):
    true = {}
    for r in docs.select("text").collect():
        for t in tokenize_one(r.text or "", "ascii_code"):
            true[t] = true.get(t, 0) + 1
    return true


def test_cms_one_sided_and_collisions(spark, docs, true_counts):
    vocab = sorted(true_counts)
    sk = cms_build(docs, depth=2, width=16)  # tiny grid forces collisions
    est = {r.term: r.est
           for r in cms_estimate(sk, vocab, depth=2, width=16).collect()}
    assert all(est[t] >= true_counts[t] for t in vocab)
    assert any(est[t] > true_counts[t] for t in vocab)  # collisions happen
    # unseen term estimates are finite and >= 0 (collision noise only)
    oov = cms_estimate(sk, ["zzqx_never"], depth=2, width=16).collect()
    assert oov[0].est >= 0


def test_cms_exact_when_wide(spark, docs, true_counts):
    vocab = sorted(true_counts)
    sk = cms_build(docs, depth=4, width=1 << 16)
    est = {r.term: r.est
           for r in cms_estimate(sk, vocab, depth=4, width=1 << 16).collect()}
    assert est == true_counts


def test_cms_linear_merge_and_partitioning(spark, docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = {(r.row, r.bucket): r.cnt for r in cms_merge(
        cms_build(a, depth=3, width=64),
        cms_build(b, depth=3, width=64)).collect()}
    full = {(r.row, r.bucket): r.cnt
            for r in cms_build(docs, depth=3, width=64).collect()}
    assert merged == full
    repart = {(r.row, r.bucket): r.cnt
              for r in cms_build(docs.repartition(13), depth=3,
                                 width=64).collect()}
    assert repart == full
    with pytest.raises(ValueError):
        cms_merge()
    with pytest.raises(ValueError):
        cms_build(docs, depth=0)
    with pytest.raises(ValueError):
        cms_estimate(cms_build(docs), [])


def test_bloom_no_false_negatives_and_fp_rate(spark, docs, true_counts):
    from bertopic_spark.operators.sketch import bloom_build, bloom_contains

    vocab = sorted(true_counts)
    terms = spark.createDataFrame([(t,) for t in vocab], "term string")
    bloom = bloom_build(terms, "term", k_hashes=4, n_bits=1 << 12)
    # every member reports maybe=True (no false negatives)
    got = {r.value: r.maybe
           for r in bloom_contains(bloom, terms, "term",
                                   k_hashes=4, n_bits=1 << 12).collect()}
    assert all(got[t] for t in vocab)
    # non-members: tiny grid → some false positives possible, but with
    # 4 hashes over 4096 bits and ~30 members the rate is ~0; assert most
    # of 200 synthetic non-members are rejected
    import pytest as _pytest
    non = spark.createDataFrame([(f"zzqx_{i}",) for i in range(200)],
                                "term string")
    nm = {r.value: r.maybe
          for r in bloom_contains(bloom, non, "term",
                                  k_hashes=4, n_bits=1 << 12).collect()}
    assert sum(nm.values()) <= 5
    with _pytest.raises(ValueError):
        bloom_build(terms, "term", k_hashes=0)


def test_hll_accuracy_merge_and_determinism(spark):
    from bertopic_spark.operators.sketch import hll_estimate, hll_registers

    # high-cardinality synthetic set → exercises the raw estimator branch
    n = 20000
    vals = spark.range(n).select(
        F.concat(F.lit("v_"), F.col("id").cast("string")).alias("v"))
    reg = hll_registers(vals, "v", p=8)
    est = hll_estimate(reg, p=8).collect()[0].est
    assert abs(est - n) / n < 0.15  # ~1.04/sqrt(256) ≈ 6.5% expected
    # low cardinality → linear-counting branch, near-exact
    small = vals.limit(30)
    est_s = hll_estimate(hll_registers(small, "v", p=8), p=8).collect()[0].est
    assert abs(est_s - 30) < 3
    # registers merge by max == registers of the union
    a = vals.filter(F.col("v").substr(-1, 1).isin("0", "1", "2"))
    b = vals.subtract(a)
    ra, rb = hll_registers(a, "v", p=8), hll_registers(b, "v", p=8)
    merged = (ra.unionByName(rb).groupBy("idx")
              .agg(F.max("rho").alias("rho")))
    full = {(r.idx, r.rho) for r in reg.collect()}
    assert {(r.idx, r.rho) for r in merged.collect()} == full
    # partitioning-invariant
    rep = {(r.idx, r.rho)
           for r in hll_registers(vals.repartition(17), "v", p=8).collect()}
    assert rep == full
    with pytest.raises(ValueError):
        hll_registers(vals, "v", p=3)


def test_histogram_merge_equals_oneshot(spark):
    from bertopic_spark.operators.sketch import (
        histogram_merge, histogram_quantiles, histogram_sketch)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()
    half_a = ev.filter("event_id % 2 = 0")
    half_b = ev.filter("event_id % 2 = 1")
    one = histogram_sketch(ev, "value", 0.0, 250.0, 50, ["event_type"])
    merged = histogram_merge(
        histogram_sketch(half_a, "value", 0.0, 250.0, 50, ["event_type"]),
        histogram_sketch(half_b, "value", 0.0, 250.0, 50, ["event_type"]))
    key = lambda df: {(r["event_type"], r["bin"]): r["cnt"]
                      for r in df.collect()}
    assert key(one) == key(merged) and key(one)

    # quantile estimate is within one bin width of the exact quantile
    import math
    w = 250.0 / 50
    est = {(r["event_type"], r["q"]): r["est"] for r in histogram_quantiles(
        one, [0.5, 0.99], 0.0, 250.0, 50, ["event_type"]).collect()}
    rows = ev.select("event_type", "value").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        vals.sort()
        for q in (0.5, 0.99):
            exact = vals[min(len(vals) - 1, int(math.ceil(q * len(vals))) - 1)]
            assert abs(est[(et, q)] - min(max(exact, 0.0), 250.0)) <= w, (et, q)


def test_histogram_clamps_out_of_range(spark):
    from bertopic_spark.operators.sketch import histogram_sketch

    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 9.99), (4, 10.0), (5, 99.0), (6, None)],
        "id long, v double")
    got = {r["bin"]: r["cnt"]
           for r in histogram_sketch(df, "v", 0.0, 10.0, 10).collect()}
    # -5 clamps to bin 0; 10.0 and 99 clamp to bin 9; NULL dropped
    assert got == {0: 2, 9: 3}


def test_percentile_rank_inverts_quantiles(spark):
    from bertopic_spark.operators.sketch import (histogram_percentile_rank,
                                                 histogram_quantiles,
                                                 histogram_sketch)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sk = histogram_sketch(ev, "value", 0.0, 250.0, 50, ["event_type"]).cache()
    qs = histogram_quantiles(sk, [0.5, 0.95], 0.0, 250.0, 50,
                             ["event_type"]).collect()
    # pct(quantile(q)) == q under the shared within-bin-uniform model
    vals = sorted({round(r["est"], 9) for r in qs})
    pr = {(r["event_type"], round(r["v"], 9)): r["pct"]
          for r in histogram_percentile_rank(
              sk, vals, 0.0, 250.0, 50, ["event_type"]).collect()}
    for r in qs:
        got = pr[(r["event_type"], round(r["est"], 9))]
        assert got == pytest.approx(r["q"], abs=1e-9), r


def test_percentile_rank_out_of_range(spark):
    from bertopic_spark.operators.sketch import (histogram_percentile_rank,
                                                 histogram_sketch)

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               "id long, v double")
    sk = histogram_sketch(df, "v", 0.0, 10.0, 10)
    got = {r["v"]: r["pct"] for r in histogram_percentile_rank(
        sk, [-5.0, 1.5, 999.0], 0.0, 10.0, 10).collect()}
    assert got[-5.0] == 0.0          # below all mass → 0, row kept
    assert got[999.0] == 1.0         # above all mass → 1
    # v=1.5 sits halfway into bin 1 (one item) → 0.5/10 of the mass
    assert got[1.5] == pytest.approx(0.05, abs=1e-9)


# ---------------------------------------------------------------------------
# KMV / theta sketches
# ---------------------------------------------------------------------------

def _mk_sets(spark, sets):
    rows = [(k, v) for k, vs in sets.items() for v in vs]
    return spark.createDataFrame(rows, "key string, v long")


def test_kmv_exact_below_k(spark):
    from bertopic_spark.operators.sketch import kmv_estimate, kmv_sketch
    df = _mk_sets(spark, {"a": range(40), "b": range(500)})
    sk = kmv_sketch(df, "v", k=64, key_cols=["key"])
    est = {r.key: (r.n_hashes, r.est)
           for r in kmv_estimate(sk, k=64, key_cols=["key"]).collect()}
    assert est["a"] == (40, 40.0)          # not full → exact
    n_b, e_b = est["b"]
    assert n_b == 64
    assert abs(e_b - 500) / 500 < 0.35     # (k-1)/h_k estimator ballpark


def test_kmv_merge_equals_rebuild(spark):
    from bertopic_spark.operators.sketch import kmv_merge, kmv_sketch
    a = _mk_sets(spark, {"s": range(0, 300)})
    b = _mk_sets(spark, {"s": range(150, 450)})
    u = _mk_sets(spark, {"s": range(0, 450)})
    m = kmv_merge(kmv_sketch(a, "v", k=32, key_cols=["key"]),
                  kmv_sketch(b, "v", k=32, key_cols=["key"]),
                  k=32, key_cols=["key"])
    direct = kmv_sketch(u, "v", k=32, key_cols=["key"])
    got = sorted(r.h for r in m.collect())
    want = sorted(r.h for r in direct.collect())
    assert got == want


def test_kmv_partitioning_invariance(spark):
    from bertopic_spark.operators.sketch import kmv_sketch
    df = _mk_sets(spark, {"x": range(1000)})
    s1 = kmv_sketch(df.repartition(1), "v", k=16, key_cols=["key"])
    s2 = kmv_sketch(df.repartition(13), "v", k=16, key_cols=["key"],
                    n_salts=7)
    assert sorted(r.h for r in s1.collect()) == \
        sorted(r.h for r in s2.collect())


def test_theta_set_ops_known_overlap(spark):
    from bertopic_spark.operators.sketch import kmv_sketch, theta_set_ops
    # |A|=600, |B|=600, |A∩B|=200, |A∪B|=1000, |A\B|=400
    df = _mk_sets(spark, {"A": range(0, 600), "B": range(400, 1000)})
    sk = kmv_sketch(df, "v", k=128, key_cols=["key"])
    row = theta_set_ops(sk, [("A", "B")], k=128, key_col="key").collect()[0]
    assert abs(row.union_est - 1000) / 1000 < 0.3
    assert abs(row.inter_est - 200) / 200 < 0.5
    assert abs(row.diff_ab_est - 400) / 400 < 0.4
    assert abs(row.jaccard - 0.2) < 0.1
    assert row.inter_n + row.diff_n <= row.union_n


def test_theta_set_ops_exact_when_small(spark):
    from bertopic_spark.operators.sketch import kmv_sketch, theta_set_ops
    # both sets below k → theta = 1.0 and every op is EXACT
    df = _mk_sets(spark, {"A": range(0, 30), "B": range(20, 50)})
    sk = kmv_sketch(df, "v", k=64, key_cols=["key"])
    row = theta_set_ops(sk, [("A", "B")], k=64, key_col="key").collect()[0]
    assert row.theta == 1.0
    assert (row.union_n, row.inter_n, row.diff_n) == (50, 10, 20)
    assert (row.union_est, row.inter_est, row.diff_ab_est) == \
        (50.0, 10.0, 20.0)


def test_theta_disjoint_sets(spark):
    from bertopic_spark.operators.sketch import kmv_sketch, theta_set_ops
    df = _mk_sets(spark, {"A": range(0, 40), "B": range(100, 140)})
    sk = kmv_sketch(df, "v", k=64, key_cols=["key"])
    row = theta_set_ops(sk, [("A", "B")], k=64, key_col="key").collect()[0]
    assert row.inter_n == 0 and row.inter_est == 0.0 and row.jaccard == 0.0


def test_bq_sign_codes_match_numpy(spark):
    """_sign_code_expr == numpy bit packing for random vectors."""
    import numpy as np
    from pyspark.sql import functions as F
    from bertopic_spark.operators.similarity import _sign_code_expr
    rng = np.random.RandomState(11)
    vecs = [rng.randn(64).tolist() for _ in range(6)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "i long, v array<double>")
    got = {r["i"]: (r["lo"], r["hi"]) for r in df.select(
        "i", _sign_code_expr(F.col("v"), 0, 32).alias("lo"),
        _sign_code_expr(F.col("v"), 32, 32).alias("hi")).collect()}
    for i, v in enumerate(vecs):
        bits = [1 if x > 0 else 0 for x in v]
        lo = sum(b << j for j, b in enumerate(bits[:32]))
        hi = sum(b << j for j, b in enumerate(bits[32:]))
        assert got[i] == (lo, hi)


def test_cumulative_cardinality_monotone_and_final(spark):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.sketch import (cumulative_cardinality,
                                                 hll_estimate, hll_registers)
    rows = [("2024-01-01 01:00:00", "u1"), ("2024-01-01 02:00:00", "u2"),
            ("2024-01-03 01:00:00", "u2"), ("2024-01-03 02:00:00", "u3"),
            ("2024-01-04 01:00:00", "u4")]
    ev = spark.createDataFrame(rows, "ts string, uid string").select(
        F.col("ts").cast("timestamp").alias("ts"), "uid")
    out = {str(r["bucket"]): r["est"]
           for r in cumulative_cardinality(ev, "ts", "uid", "day",
                                           p=8).collect()}
    vals = [out[f"2024-01-0{d} 00:00:00"] for d in (1, 2, 3, 4)]
    assert vals == sorted(vals)          # running union never shrinks
    assert vals[0] == vals[1]            # empty day 2 carries forward
    # final bucket == one-shot estimate over everything
    ref = hll_estimate(hll_registers(ev, "uid", p=8), p=8).collect()[0]["est"]
    assert vals[3] == pytest.approx(ref, abs=1e-9)


def test_bloom_semi_join_exact_and_prefilter(spark):
    from pyspark.sql import functions as F

    from bertopic_spark.operators.sketch import bloom_contains, bloom_semi_join
    big = spark.createDataFrame([(i, i % 50) for i in range(2000)],
                                "row_id long, k long")
    keys = spark.createDataFrame([(3,), (17,), (42,)], "k long")
    got = bloom_semi_join(big, keys, "k").collect()
    want = big.join(keys, "k", "leftsemi").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the prefilter never loses a member (no false negatives)
    from bertopic_spark.operators.sketch import bloom_build

    verdicts = {r["value"]: r["maybe"]
                for r in bloom_contains(bloom_build(keys, "k"),
                                        big.select("k").distinct(),
                                        "k").collect()}
    assert verdicts[3] and verdicts[17] and verdicts[42]

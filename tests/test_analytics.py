"""Observability/analytics operators: seasonal anomalies, closed-form
EWMA, cohort retention."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.rollup import (cohort_retention, ewma_smooth,
                                             seasonal_anomalies)


def test_ewma_matches_sequential_recursion(spark):
    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("a", 4, 5.0),
            ("b", 1, 100.0)]
    b = spark.createDataFrame(rows, "k string, t int, y double")
    out = {(r["k"], r["t"]): r["ewma"]
           for r in ewma_smooth(b, "t", "y", alpha=0.3,
                                keys=("k",)).collect()}
    # sequential reference
    s = 10.0
    assert out[("a", 1)] == pytest.approx(s, abs=1e-9)
    for t, y in [(2, 20.0), (3, 5.0), (4, 5.0)]:
        s = 0.3 * y + 0.7 * s
        assert out[("a", t)] == pytest.approx(s, abs=1e-6)
    assert out[("b", 1)] == pytest.approx(100.0, abs=1e-9)
    with pytest.raises(ValueError):
        ewma_smooth(b, "t", "y", alpha=0.0)


def test_seasonal_anomaly_flags_the_spike(spark):
    rows = []
    for day in range(1, 11):
        for hod, n in ((3, 10), (12, 50)):
            cnt = 300 if (day == 9 and hod == 3) else n  # planted spike
            rows += [(f"2024-01-{day:02d} {hod:02d}:{i % 60:02d}:00",)
                     for i in range(cnt)]
    ev = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"))
    out = seasonal_anomalies(ev, "ts").collect()
    spike = [r for r in out if str(r["bucket"]).startswith("2024-01-09 03")]
    others_3am = [r["z"] for r in out if r["hod"] == 3
                  and not str(r["bucket"]).startswith("2024-01-09")]
    assert spike and spike[0]["z"] > 2.5
    assert all(abs(z) < 1.0 for z in others_3am)


def test_cohort_retention_counts(spark):
    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
        ("2024-01-02 09:00:00", 1),                 # u1 back on day+1
        ("2024-01-03 09:00:00", 1), ("2024-01-03 10:00:00", 2),
        ("2024-01-02 12:00:00", 3),                 # new cohort Jan 2
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id")
    out = {(str(r["cohort"]), r["bucket_offset"]): r["n_users"]
           for r in cohort_retention(ev, "ts", "user_id").collect()}
    jan1 = "2024-01-01 00:00:00"
    jan2 = "2024-01-02 00:00:00"
    assert out[(jan1, 0)] == 2
    assert out[(jan1, 1)] == 1          # only u1 returned next day
    assert out[(jan1, 2)] == 2          # both back on day+2
    assert out[(jan2, 0)] == 1          # u3's own cohort
    assert (jan2, 1) not in out


def test_funnel_greedy_window(spark):
    from bertopic_spark.operators.temporal import funnel_conversion
    day = 86400 * 1_000_000
    rows = [
        # u1 completes in order within window
        ("2024-01-01 00:00:00", 1, "view"),
        ("2024-01-02 00:00:00", 1, "click"),
        ("2024-01-03 00:00:00", 1, "buy"),
        # u2: click BEFORE view -> stalls at view
        ("2024-01-02 00:00:00", 2, "click"),
        ("2024-01-03 00:00:00", 2, "view"),
        # u3: completes but buy outside the 7-day window of first view
        ("2024-01-01 00:00:00", 3, "view"),
        ("2024-01-02 00:00:00", 3, "click"),
        ("2024-01-20 00:00:00", 3, "buy"),
        # u4 never views
        ("2024-01-01 00:00:00", 4, "buy"),
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long, event_type string") \
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id",
                "event_type")
    out = {r["step"]: r["n_users"] for r in funnel_conversion(
        ev, ("view", "click", "buy"), window_us=7 * day).collect()}
    assert out == {"view": 3, "click": 2, "buy": 1}
    nolimit = {r["step"]: r["n_users"] for r in funnel_conversion(
        ev, ("view", "click", "buy")).collect()}
    assert nolimit == {"view": 3, "click": 2, "buy": 2}  # u3 back in
    import pytest as _pt
    with _pt.raises(ValueError):
        funnel_conversion(ev, ("view",))


def test_rolling_cardinality_window_scopes(spark):
    from bertopic_spark.operators.sketch import (hll_estimate, hll_registers,
                                                 rolling_cardinality)
    rows = [("2024-01-01 01:00:00", "a"), ("2024-01-02 01:00:00", "b"),
            ("2024-01-05 01:00:00", "c")]
    ev = spark.createDataFrame(rows, "ts string, uid string").select(
        F.col("ts").cast("timestamp").alias("ts"), "uid")
    out = {str(r["bucket"]): r["est"]
           for r in rolling_cardinality(ev, "ts", "uid", "day", window=2,
                                        p=8).collect()}
    one = hll_estimate(hll_registers(
        ev.limit(0).unionByName(ev.filter("uid = 'a'")), "uid", p=8),
        p=8).collect()[0]["est"]
    # day 3: window [day2, day3] -> only b; day 4: empty window -> 0
    assert out["2024-01-04 00:00:00"] == pytest.approx(0.0, abs=1e-12)
    assert out["2024-01-01 00:00:00"] == pytest.approx(one, abs=1e-9)


def test_cuped_known_theta(spark):
    from bertopic_spark.operators.evaluation import (cuped_adjustment,
                                                     cuped_series)
    # Y = 2X + noise-free -> theta = 2, full variance elimination
    rows = [(i, float(i), 2.0 * i) for i in range(1, 11)]
    d = spark.createDataFrame(rows, "u long, pre double, post double")
    out = cuped_adjustment(d, "u", "pre", "post").collect()[0]
    assert out["theta"] == pytest.approx(2.0, abs=1e-9)
    assert out["reduction"] == pytest.approx(1.0, abs=1e-9)
    adj = {r["u"]: r["y_adj"] for r in
           cuped_series(d, "u", "pre", "post").collect()}
    assert len(set(adj.values())) == 1  # all residual variance removed
    # X uncorrelated with Y -> theta ~ 0, no reduction
    rows2 = [(1, 1.0, 5.0), (2, 2.0, 5.0), (3, 3.0, 5.0)]
    d2 = spark.createDataFrame(rows2, "u long, pre double, post double")
    out2 = cuped_adjustment(d2, "u", "pre", "post").collect()[0]
    assert out2["reduction"] == pytest.approx(0.0, abs=1e-9)


def test_path_hierarchy_prefixes(spark):
    from bertopic_spark.operators.codestruct import path_hierarchy_terms
    d = spark.createDataFrame([(0, "a/b/c.py"), (1, "a/x.py"), (2, None)],
                              "doc_id long, path string")
    out = {(r["doc_id"], r["prefix"], r["depth"])
           for r in path_hierarchy_terms(d, "path").collect()}
    assert out == {(0, "a", 1), (0, "a/b", 2), (0, "a/b/c.py", 3),
                   (1, "a", 1), (1, "a/x.py", 2)}


def test_counter_rate_resets(spark):
    from bertopic_spark.operators.temporal import counter_rate
    rows = [("a", 1, 100.0), ("a", 2, 300.0), ("a", 3, 50.0),
            ("a", 4, 50.0), ("b", 1, 10.0)]
    b = spark.createDataFrame(rows, "k string, t int, ctr double")
    out = {(r["k"], r["t"]): (r["increase"], r["rate"])
           for r in counter_rate(b, "t", "ctr", 100.0,
                                 keys=("k",)).collect()}
    assert out[("a", 1)] == (None, None)        # no predecessor
    assert out[("a", 2)] == (200.0, 2.0)
    assert out[("a", 3)] == (50.0, 0.5)         # reset: counts new value
    assert out[("a", 4)] == (0.0, 0.0)          # flat counter
    assert out[("b", 1)] == (None, None)


def test_interval_overlap_join_semantics(spark):
    from bertopic_spark.operators.temporal import interval_overlap_join
    def mk(rows, idc):
        return spark.createDataFrame(rows, f"{idc} long, start string, end string") \
            .select(idc, F.col("start").cast("timestamp").alias("start"),
                    F.col("end").cast("timestamp").alias("end"))
    a = mk([(1, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
            (2, "2024-01-05 00:00:00", "2024-01-05 01:00:00")], "a_id")
    b = mk([(10, "2024-01-01 01:00:00", "2024-01-01 03:00:00"),  # overlaps 1
            (11, "2024-01-01 02:00:00", "2024-01-01 04:00:00"),  # abuts 1
            (12, "2024-01-04 23:00:00", "2024-01-05 00:30:00")], "b_id")
    out = {(r["a_id"], r["b_id"]): r["overlap_us"]
           for r in interval_overlap_join(a, b, "a_id", "b_id",
                                          bucket_seconds=600).collect()}
    # half-open: touching endpoints do NOT overlap
    assert out == {(1, 10): 3600 * 1_000_000, (2, 12): 1800 * 1_000_000}
    # wide buckets spanning whole intervals give the same pairs
    wide = {(r["a_id"], r["b_id"]) for r in interval_overlap_join(
        a, b, "a_id", "b_id", bucket_seconds=86400 * 7).collect()}
    assert wide == set(out)

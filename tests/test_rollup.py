"""Continuous-aggregate rollups (operators/rollup.py): every coarser
level re-aggregated from the finer one must equal aggregating raw at that
grain — exactly for the algebraic integer/min/max measures, to float
association for sums."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.rollup import rollup_levels, with_avg


@pytest.fixture(scope="module")
def events(spark):
    import random

    rng = random.Random(21)
    rows = [(datetime(2026, 1, 1) + timedelta(minutes=rng.randrange(0, 60 * 24 * 20)),
             rng.choice(["a", "b", "c"]), rng.uniform(0, 100))
            for _ in range(3000)]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def _direct(events, grain):
    return {(r["bucket"], r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
            for r in events.groupBy(
                F.date_trunc(grain, "ts").alias("bucket"), "k")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("v").alias("sum_v"), F.min("v").alias("min_v"),
                 F.max("v").alias("max_v")).collect()}


def test_rollup_levels_equal_direct_aggregation(events):
    levels = rollup_levels(events, "ts", ["k"], "v",
                           levels=("hour", "day", "week"))
    for grain in ("hour", "day", "week"):
        got = {(r["bucket"], r["k"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
               for r in levels[grain].collect()}
        want = _direct(events, grain)
        assert set(got) == set(want), grain
        for key, (n, s, mn, mx) in want.items():
            gn, gs, gmn, gmx = got[key]
            assert gn == n and gmn == mn and gmx == mx, (grain, key)
            assert gs == pytest.approx(s, rel=1e-12)


def test_rollup_avg_and_validation(events):
    day = with_avg(rollup_levels(events, "ts", ["k"], "v",
                                 levels=("hour", "day"))["day"])
    r = day.limit(1).collect()[0]
    assert r["avg_v"] == pytest.approx(r["sum_v"] / r["n"], abs=1e-6)
    with pytest.raises(ValueError, match="fine-to-coarse"):
        rollup_levels(events, "ts", ["k"], "v", levels=("day", "hour"))
    with pytest.raises(ValueError):
        rollup_levels(events, "ts", ["k"], "v", levels=("fortnight",))


def test_week_only_terminal(events):
    # ISO weeks cross month boundaries: deriving month from week would
    # credit month-leading partial weeks to the prior month
    with pytest.raises(ValueError, match="week"):
        rollup_levels(events, "ts", ["k"], "v", levels=("hour", "week", "month"))
    # terminal week stays legal (covered by the equality test too)
    assert "week" in rollup_levels(events, "ts", ["k"], "v",
                                   levels=("day", "week"))
    # month derived from day is exact
    levels = rollup_levels(events, "ts", ["k"], "v", levels=("day", "month"))
    got = {(r["bucket"], r["k"]): r["n"] for r in levels["month"].collect()}
    want = {k: v[0] for k, v in _direct(events, "month").items()}
    assert got == want


# ---------------------------------------------------------------------------
# composite_agg: ES composite aggregation with after-key pagination
# ---------------------------------------------------------------------------


def test_composite_agg_pages_cover_all_buckets(spark):
    from bertopic_spark.operators.rollup import composite_agg
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    keys = [("event_type", F.col("event_type")),
            ("day", F.date_trunc("day", F.col("ts")))]
    ms = [("n", F.count(F.lit(1)).cast("long"))]
    # walk pages until exhausted; union must equal the one-shot groupBy
    pages, after = [], None
    while True:
        page = composite_agg(ev, keys, ms, size=37, after=after).collect()
        pages.extend(page)
        if len(page) < 37:
            break
        after = (page[-1].event_type, page[-1].day)
    whole = (ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("long").alias("n")).collect())
    assert sorted(map(tuple, pages)) == sorted(map(tuple, whole))
    # pages are disjoint (keyset, not offset: no bucket repeats)
    assert len({(r.event_type, r.day) for r in pages}) == len(pages)


def test_composite_agg_after_is_strict_and_validated(spark):
    from bertopic_spark.operators.rollup import composite_agg
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    keys = [("event_type", F.col("event_type")),
            ("day", F.date_trunc("day", F.col("ts")))]
    ms = [("n", F.count(F.lit(1)).cast("long"))]
    first = composite_agg(ev, keys, ms, size=5).collect()
    nxt = composite_agg(ev, keys, ms, size=5,
                        after=(first[-1].event_type, first[-1].day)).collect()
    # strictly after the cursor, ordering continuous across the boundary
    assert (nxt[0].event_type, nxt[0].day) > (first[-1].event_type,
                                              first[-1].day)
    with pytest.raises(ValueError):
        composite_agg(ev, keys, ms, size=5, after=("click",))
    with pytest.raises(ValueError):
        composite_agg(ev, [], ms)


def test_pipeline_aggs_hand_checked(spark):
    from bertopic_spark.operators.rollup import pipeline_aggs
    b = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 20), ("b", 1, 5)],
        "k string, t int, n long")
    out = {(r.k, r.t): (r.cum_n, r.deriv_n, r.mavg_n) for r in
           pipeline_aggs(b, "t", "n", keys=("k",), window=2).collect()}
    assert out == {
        ("a", 1): (10, None, 10.0),       # first bucket: no derivative
        ("a", 2): (40, 20, 20.0),         # mavg over trailing 2
        ("a", 3): (60, -10, 25.0),
        ("b", 1): (5, None, 5.0),         # series are independent
    }
    with pytest.raises(ValueError):
        pipeline_aggs(b, "t", "n", window=0)


def test_pipeline_aggs_matches_python_brute(spark):
    from bertopic_spark.operators.rollup import pipeline_aggs
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    b = (ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    got = {(r.event_type, r.d): (r.cum_n, r.deriv_n, r.mavg_n) for r in
           pipeline_aggs(b, "d", "n", keys=("event_type",),
                         window=3).collect()}
    assert len(got) > 0
    series = {}
    for r in sorted(b.collect(), key=lambda r: (r.event_type, r.d)):
        series.setdefault(r.event_type, []).append((r.d, r.n))
    for k, pts in series.items():
        cum = 0
        for i, (d, n) in enumerate(pts):
            cum += n
            deriv = None if i == 0 else n - pts[i - 1][1]
            win = [v for _, v in pts[max(0, i - 2):i + 1]]
            assert got[(k, d)] == (cum, deriv, round(sum(win) / len(win), 6))


def test_range_agg_semantics(spark):
    from bertopic_spark.operators.rollup import range_agg
    t = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, None), (5, 12.0)],
        "id long, v double")
    out = {r.range_key: (r.from_v, r.to_v, r.n_docs, r.sum_value) for r in
           range_agg(t, "v", [("lo", None, 10.0), ("mid", 10.0, 20.0),
                              ("all", None, None), ("band", 8.0, 26.0),
                              ("empty", 100.0, None)]).collect()}
    assert out["lo"] == (None, 10.0, 1, 5.0)          # half-open: 10 not in lo
    assert out["mid"] == (10.0, 20.0, 2, 22.0)
    assert out["all"] == (None, None, 4, 52.0)        # NULL value excluded
    assert out["band"] == (8.0, 26.0, 3, 47.0)        # overlaps double-count
    assert out["empty"] == (100.0, None, 0, 0.0)      # empty bucket returned
    with pytest.raises(ValueError):
        range_agg(t, "v", [("a", 0.0, 1.0), ("a", 1.0, 2.0)])  # dup keys
    with pytest.raises(ValueError):
        range_agg(t, "v", [])


def test_matrix_stats_hand_checked(spark):
    from bertopic_spark.operators.rollup import matrix_stats
    t = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 4.0, None), (3.0, 6.0, 1.0)],
        "x double, y double, z double")
    out = {(r.field_x, r.field_y): (r.n, r.corr)
           for r in matrix_stats(t, ["x", "y", "z"]).collect()}
    assert out[("x", "x")] == (3, 1.0)
    assert out[("x", "y")] == (3, 1.0)        # y = 2x exactly
    assert out[("x", "z")][0] == 2            # listwise: NULL z drops the row
    assert out[("x", "z")][1] == -1.0         # (1,5),(3,1) -> perfectly anti
    assert len(out) == 6                      # unordered pairs incl self
    with pytest.raises(ValueError):
        matrix_stats(t, ["x"])
    with pytest.raises(ValueError):
        matrix_stats(t, ["x", "x"])


def test_t_test_agg_welch(spark):
    """Welch t vs a direct python computation; one-sided-degenerate
    buckets return NULL t."""
    import math

    from bertopic_spark.operators.rollup import t_test_agg

    a = [3.0, 5.0, 7.0, 9.0]
    b = [2.0, 4.0, 4.5]
    rows = ([("g", True, v) for v in a] + [("g", False, v) for v in b]
            + [("solo", True, 1.0), ("solo", False, 2.0)])
    df = spark.createDataFrame(rows, "k string, side boolean, v double")
    got = {r.k: r for r in t_test_agg(df, "v", "side", ["k"]).collect()}

    def welch(xs, ys):
        nx, ny = len(xs), len(ys)
        mx, my = sum(xs) / nx, sum(ys) / ny
        vx = sum((x - mx) ** 2 for x in xs) / (nx - 1)
        vy = sum((y - my) ** 2 for y in ys) / (ny - 1)
        return (mx - my) / math.sqrt(vx / nx + vy / ny)

    g = got["g"]
    assert (g.n_a, g.n_b) == (4, 3)
    assert abs(g.t_stat - round(welch(a, b), 6)) < 1e-9
    assert abs(g.mean_a - 6.0) < 1e-9
    assert got["solo"].t_stat is None  # n < 2 on both sides


def test_median_absolute_deviation_exact(spark):
    import statistics

    from bertopic_spark.operators.rollup import median_absolute_deviation

    vals = [1.0, 1.0, 2.0, 2.0, 4.0, 6.0, 9.0]
    rows = [("g", v) for v in vals] + [("one", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r.k: r for r in
           median_absolute_deviation(df, "v", ["k"]).collect()}
    m = statistics.median(vals)
    mad = statistics.median(sorted(abs(v - m) for v in vals))
    assert got["g"].median == round(m, 6) and got["g"].mad == round(mad, 6)
    assert got["g"].n == len(vals)
    assert got["one"].mad == 0.0 and got["one"].median == 5.0


def test_string_stats_entropy(spark):
    import math

    from bertopic_spark.operators.rollup import string_stats

    # bucket g: chars a:3 b:1 over two docs; empty doc counts for n only
    df = spark.createDataFrame(
        [("g", "aab"), ("g", "a"), ("g", ""), ("u", "zzzz")],
        "k string, text string")
    got = {r.k: r for r in string_stats(df, "text", ["k"]).collect()}
    g = got["g"]
    assert (g.n, g.min_length, g.max_length) == (3, 0, 3)
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(g.entropy - round(want, 6)) < 1e-9
    assert got["u"].entropy == 0.0  # single-char distribution


def test_rare_terms_agg(spark):
    from bertopic_spark.operators.rollup import rare_terms_agg

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "a"), (2, "b"), (3, "c"),
         (3, "c")],  # duplicate (3, c) must count once
        "doc_id int, term string")
    got = {r.term: r.doc_count for r in
           rare_terms_agg(df, "term", "doc_id", max_doc_count=2).collect()}
    assert got == {"b": 2, "c": 1}  # 'a' is in 3 docs -> excluded


def test_rare_terms_gate_not_trivially_empty(spark):
    """The gate relation must have a real tail at fixture scale (a 0-row
    oracle match proves nothing)."""
    from bertopic_spark.entry_queries import q_rare_terms

    assert q_rare_terms(spark, "/root/testdata/sf0.001").limit(1).count() == 1


def test_boxplot_agg_quartiles(spark):
    import numpy as np

    from bertopic_spark.operators.rollup import boxplot_agg

    vals = [1.0, 2.0, 4.0, 7.0, 11.0, 16.0, 22.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    r = boxplot_agg(df, "v", ["k"]).collect()[0]
    q1, q2, q3 = (float(np.percentile(vals, p)) for p in (25, 50, 75))
    assert (r.q1, r.q2, r.q3) == (round(q1, 6), round(q2, 6), round(q3, 6))
    assert r.n == 8 and r.min == 1.0 and r.max == 100.0
    iqr = q3 - q1
    assert r.lower_fence == round(max(1.0, q1 - 1.5 * iqr), 6)
    assert r.upper_fence == round(min(100.0, q3 + 1.5 * iqr), 6)


def test_top_hits_agg(spark):
    from bertopic_spark.operators.rollup import top_hits_agg

    rows = [("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 9.0), ("a", 4, 1.0),
            ("b", 5, 2.0)]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    got = top_hits_agg(df, ["k"], "value", n=2, id_col="event_id").collect()
    by_k = {}
    for r in sorted(got, key=lambda r: (r.k, r.hit_rank)):
        by_k.setdefault(r.k, []).append(r.event_id)
    # tie at 9.0 broken by ascending event_id
    assert by_k == {"a": [2, 3], "b": [5]}


def test_multi_terms_agg(spark):
    from bertopic_spark.operators.rollup import multi_terms_agg

    rows = [("x", "p"), ("x", "p"), ("y", "p"), ("y", "q"), ("y", "q"),
            (None, "p"), ("x", None)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = multi_terms_agg(df, ["a", "b"], size=2).collect()
    got = sorted(got, key=lambda r: r.bucket_rank)
    # NULL-key rows dropped; count desc then key-tuple asc tie-break
    assert [(r.a, r.b, r.doc_count, r.bucket_rank) for r in got] == [
        ("x", "p", 2, 1), ("y", "q", 2, 2)]


def test_serial_diff_normalize(spark):
    from bertopic_spark.operators.rollup import serial_diff_normalize

    rows = [("s", 1, 10.0), ("s", 2, 14.0), ("s", 3, 12.0), ("s", 4, 20.0),
            ("flat", 1, 5.0), ("flat", 2, 5.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {(r.k, r.t): r for r in
           serial_diff_normalize(df, "t", "v", keys=("k",), lag=2).collect()}
    assert got[("s", 1)].sdiff_v is None and got[("s", 2)].sdiff_v is None
    assert got[("s", 3)].sdiff_v == 2.0 and got[("s", 4)].sdiff_v == 6.0
    assert got[("s", 1)].norm_v == 0.0 and got[("s", 4)].norm_v == 1.0
    assert got[("s", 2)].norm_v == 0.4  # (14-10)/(20-10)
    # constant series: ES divide-guard -> 0.0, not NULL/NaN
    assert got[("flat", 1)].norm_v == 0.0 and got[("flat", 2)].norm_v == 0.0


def test_date_histogram_dense_and_sparse(spark):
    from bertopic_spark.operators.rollup import date_histogram

    rows = [("a", datetime(2024, 1, 1, 0, 10), 1.0),
            ("a", datetime(2024, 1, 1, 0, 50), 2.0),
            ("a", datetime(2024, 1, 1, 3, 5), 4.0),   # hours 1-2 empty
            ("b", datetime(2024, 1, 1, 2, 0), 8.0),
            ("a", None, 99.0)]                         # NULL ts dropped
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    # sparse (ES default min_doc_count=1): only non-empty buckets
    sparse = date_histogram(df, "ts", "hour", keys=("event_type",),
                            value_col="value")
    got = {(r.event_type, r.bucket.hour): (r.doc_count, r.value_sum)
           for r in sparse.collect()}
    assert got == {("a", 0): (2, 3.0), ("a", 3): (1, 4.0), ("b", 2): (1, 8.0)}

    # dense over the data span: every hour 0-3 per key, empties zeroed
    dense = date_histogram(df, "ts", "hour", keys=("event_type",),
                           value_col="value", min_doc_count=0)
    d = {(r.event_type, r.bucket.hour): (r.doc_count, r.value_sum)
         for r in dense.collect()}
    assert len(d) == 8  # 4 hours x 2 keys
    assert d[("a", 1)] == (0, 0.0) and d[("b", 0)] == (0, 0.0)
    assert d[("a", 0)] == (2, 3.0)

    # extended bounds widen past the data; truncation to the interval
    ext = date_histogram(df, "ts", "hour", keys=("event_type",),
                         min_doc_count=0,
                         extended_min="2023-12-31 22:30:00",
                         extended_max="2024-01-01 05:00:00")
    buckets = sorted({r.bucket for r in ext.collect()})
    assert buckets[0] == datetime(2023, 12, 31, 22)   # truncated from 22:30
    assert buckets[-1] == datetime(2024, 1, 1, 5)
    assert len(buckets) == 8 and ext.count() == 16

    # min_doc_count=2 prunes single-doc buckets
    mdc2 = date_histogram(df, "ts", "hour", keys=("event_type",),
                          min_doc_count=2)
    assert [(r.event_type, r.bucket.hour) for r in mdc2.collect()] == [("a", 0)]

    with pytest.raises(ValueError):
        date_histogram(df, "ts", "fortnight")
    with pytest.raises(ValueError):
        date_histogram(df, "ts", "hour", min_doc_count=-1)
    empty = spark.createDataFrame([], "event_type string, ts timestamp, value double")
    with pytest.raises(ValueError):
        date_histogram(empty, "ts", "hour", min_doc_count=0)


def test_adjacency_matrix_counts(spark):
    from bertopic_spark.operators.rollup import adjacency_matrix

    rows = [(1, "en", 10), (2, "en", 500), (3, "fr", 500), (4, "fr", 20)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, n int")
    got = adjacency_matrix(df, {
        "en": F.col("lang") == "en",
        "long": F.col("n") >= 100,
    }).collect()
    m = {(r.key_x, r.key_y): r.doc_count for r in got}
    # diagonal = per-filter counts, off-diagonal = intersection, empties omitted
    assert m == {("en", "en"): 2, ("long", "long"): 2, ("en", "long"): 1}


def test_adjacency_matrix_omits_empty_and_validates(spark):
    import pytest as _pytest

    from bertopic_spark.operators.rollup import adjacency_matrix

    df = spark.createDataFrame([(1, "en")], "doc_id int, lang string")
    got = adjacency_matrix(df, {
        "en": F.col("lang") == "en",
        "zz": F.col("lang") == "zz",
    }).collect()
    assert {(r.key_x, r.key_y): r.doc_count for r in got} == {("en", "en"): 1}
    with _pytest.raises(ValueError):
        adjacency_matrix(df, {})


class TestAutoDateHistogram:
    def test_picks_guaranteed_interval(self, spark):
        from bertopic_spark.operators.rollup import auto_date_histogram
        import datetime as dt
        rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=6 * i))
                for i in range(12)]  # spans ~3 days
        d = spark.createDataFrame(rows, "id long, ts timestamp")
        out = auto_date_histogram(d, "ts", target_buckets=4).collect()
        assert {r["interval"] for r in out} == {"day"}
        assert sum(r["doc_count"] for r in out) == 12
        assert len(out) <= 4
        fine = auto_date_histogram(d, "ts", target_buckets=100).collect()
        assert {r["interval"] for r in fine} == {"hour"}

    def test_validation_and_empty(self, spark):
        import pytest as _pt
        from bertopic_spark.operators.rollup import auto_date_histogram
        d = spark.createDataFrame([], "id long, ts timestamp")
        with _pt.raises(ValueError, match="target_buckets"):
            auto_date_histogram(d, "ts", target_buckets=0)
        with _pt.raises(ValueError, match="no non-null"):
            auto_date_histogram(d, "ts")


def test_sibling_bucket_stats(spark):
    from bertopic_spark.operators.rollup import sibling_bucket_stats
    b = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("b", 1, 7)],
        "k string, h int, n long")
    got = {r["k"]: (r["n_buckets"], r["avg_b"], r["min_b"], r["max_b"],
                    r["sum_b"]) for r in
           sibling_bucket_stats(b, "n", keys=("k",)).collect()}
    assert got == {"a": (2, 20.0, 10, 30, 40), "b": (1, 7.0, 7, 7, 7)}


def test_ks_two_sample_hand_case(spark):
    """a=[1,2,3] vs b=[3,4]: D = 2/3 attained at value 2."""
    from bertopic_spark.operators.rollup import ks_test_two_sample

    rows = [(1.0, True), (2.0, True), (3.0, True), (3.0, False), (4.0, False)]
    df = spark.createDataFrame(rows, "v double, is_a boolean")
    r = ks_test_two_sample(df, "v", "is_a").collect()[0]
    assert r["d_stat"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["at_value"] == pytest.approx(2.0)
    assert (r["n_a"], r["n_b"]) == (3, 2)
    # identical samples -> D = 0
    same = spark.createDataFrame(
        [(1.0, True), (2.0, True), (1.0, False), (2.0, False)],
        "v double, is_a boolean")
    assert ks_test_two_sample(same, "v", "is_a").collect()[0]["d_stat"] \
        == pytest.approx(0.0)


def test_percentiles_bucket_hand_case(spark):
    from bertopic_spark.operators.rollup import percentiles_bucket

    b = spark.createDataFrame([("k", i, float(i)) for i in range(1, 5)],
                              "g string, b long, v double")
    out = {r["percent"]: r["value"]
           for r in percentiles_bucket(b, "v", [0, 50, 100],
                                       keys=("g",)).collect()}
    # linear interpolation over [1,2,3,4]
    assert out[0.0] == 1.0 and out[100.0] == 4.0
    assert out[50.0] == pytest.approx(2.5)
    with pytest.raises(ValueError):
        percentiles_bucket(b, "v", [150])


def test_linear_weighted_mavg_hand_case(spark):
    from bertopic_spark.operators.rollup import linear_weighted_mavg

    b = spark.createDataFrame([("k", i, v) for i, v in
                               enumerate([3.0, 6.0, 9.0, 12.0])],
                              "g string, t long, v double")
    out = {r["t"]: r["lwa_v"]
           for r in linear_weighted_mavg(b, "t", "v", keys=("g",),
                                         window=3).collect()}
    assert out[0] == pytest.approx(3.0)                 # head: window of 1
    assert out[1] == pytest.approx((1*3 + 2*6) / 3)     # window of 2
    assert out[2] == pytest.approx((1*3 + 2*6 + 3*9) / 6)
    assert out[3] == pytest.approx((1*6 + 2*9 + 3*12) / 6)

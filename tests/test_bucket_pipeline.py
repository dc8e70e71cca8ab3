"""ES bucket pipeline (bucket_script/selector/sort) + rate / date_range /
filters aggregation edge semantics."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.rollup import (bucket_script, bucket_selector,
                                             bucket_sort, date_range_agg,
                                             filters_agg, rate_agg)


@pytest.fixture(scope="module")
def buckets(spark):
    rows = [("a", 1, 10, 5.0), ("a", 2, 4, 2.0), ("a", 3, 7, 0.0),
            ("b", 1, 2, 9.0), ("b", 2, 6, 3.0)]
    return spark.createDataFrame(
        rows, "series string, h int, n long, sv double")


def test_bucket_sort_pagination(buckets):
    top = bucket_sort(buckets, [F.desc("n")], 1, keys=("series",))
    got = {(r["series"], r["h"]) for r in top.collect()}
    assert got == {("a", 1), ("b", 2)}
    page2 = bucket_sort(buckets, [F.desc("n")], 1, keys=("series",), from_=1)
    got2 = {(r["series"], r["h"]) for r in page2.collect()}
    assert got2 == {("a", 3), ("b", 1)}


def test_bucket_selector_null_drops(spark):
    b = spark.createDataFrame([("a", 1, None), ("a", 2, 5.0)],
                              "series string, h int, v double")
    kept = bucket_selector(b, F.col("v") > 1.0).collect()
    assert [(r["series"], r["h"]) for r in kept] == [("a", 2)]


def test_bucket_script_composes(buckets):
    out = bucket_script(buckets, {"avg": F.col("sv") / F.col("n"),
                                  "double_n": F.col("n") * 2})
    r = {(x["series"], x["h"]): (x["avg"], x["double_n"])
         for x in out.collect()}
    assert r[("a", 1)] == (0.5, 20)


def test_rate_validation_and_scaling(spark):
    ev = spark.createDataFrame(
        [("2024-01-01 00:30:00",), ("2024-01-01 05:00:00,".rstrip(","),),
         ("2024-01-02 01:00:00",)], "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"))
    out = {str(r["bucket"]): (r["n_docs"], r["rate"])
           for r in rate_agg(ev, "ts", "day", "hour").collect()}
    assert out["2024-01-01 00:00:00"] == (2, round(2 / 24, 6))
    assert out["2024-01-02 00:00:00"] == (1, round(1 / 24, 6))
    with pytest.raises(ValueError):
        rate_agg(ev, "ts", "hour", "day")  # unit coarser than interval


def test_date_range_empty_and_unbounded(spark):
    ev = spark.createDataFrame([("2024-01-05 12:00:00",)], "ts string") \
        .select(F.col("ts").cast("timestamp").alias("ts"))
    out = {r["range_key"]: r["n_docs"] for r in date_range_agg(
        ev, "ts", [("all", None, None),
                   ("before", None, "2024-01-05 12:00:00"),
                   ("at_or_after", "2024-01-05 12:00:00", None),
                   ("never", "2030-01-01 00:00:00", None)]).collect()}
    # half-open: from <= ts < to, so the boundary row is NOT in "before"
    assert out == {"all": 1, "before": 0, "at_or_after": 1, "never": 0}


def test_filters_agg_other_and_overlap(spark):
    d = spark.createDataFrame(
        [(1, "en", 100), (2, "de", 400), (3, "zh", 50), (4, None, 500)],
        "id long, lang string, n int")
    out = {r["filter_key"]: r["n_docs"] for r in filters_agg(d, {
        "en": F.col("lang") == "en",
        "big": F.col("n") > 300,
    }, other_bucket=True).collect()}
    # row 3 matches neither filter; row 4's NULL lang still matches big
    assert out == {"en": 1, "big": 2, "_other_": 1}


def test_numeric_histogram_offset_and_padding(spark):
    from bertopic_spark.operators.rollup import numeric_histogram
    d = spark.createDataFrame([(4.9,), (5.0,), (29.9,), (105.0,)],
                              "value double")
    out = {r["key"]: (r["n_docs"], r["sum_value"])
           for r in numeric_histogram(d, "value", 25.0, 5.0,
                                      min_doc_count=0).collect()}
    # 4.9 -> bucket -20; 5.0 and 29.9 -> bucket 5; 105 -> bucket 105
    assert out[-20.0][0] == 1
    assert out[5.0] == (2, round(5.0 + 29.9, 6))
    assert out[105.0][0] == 1
    # empty buckets 30, 55, 80 padded
    assert out[30.0] == (0, 0.0) and out[80.0] == (0, 0.0)
    assert len(out) == 6
    sparse = numeric_histogram(d, "value", 25.0, 5.0, min_doc_count=1)
    assert sparse.count() == 3

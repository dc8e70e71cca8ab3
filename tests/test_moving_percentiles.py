"""moving_percentiles: window-merge equivalence with a one-shot sketch,
dense-spine zero handling, validation."""

import pytest
from pyspark.sql import functions as F

from bertopic_spark.operators.rollup import moving_percentiles
from bertopic_spark.operators.sketch import (histogram_quantiles,
                                             histogram_sketch)


@pytest.fixture(scope="module")
def ev(spark):
    rows = []
    # day 1: values 10..19, day 2: 20..29, day 4: 40..49 (day 3 empty)
    for d, base in [(1, 10), (2, 20), (4, 40)]:
        rows += [(f"2024-01-0{d} 06:00:00", float(base + i))
                 for i in range(10)]
    return spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value")


def test_window_merge_equals_oneshot(ev):
    # window covering ALL buckets == quantiles of the whole relation
    out = moving_percentiles(ev, "ts", "value", "day", window=4,
                             qs=(0.5,), lo=0.0, hi=64.0, n_bins=32)
    last = {str(r["bucket"]): r["est"] for r in out.collect()}
    sk = histogram_sketch(ev, "value", 0.0, 64.0, 32)
    ref = histogram_quantiles(sk, [0.5], 0.0, 64.0, 32).collect()[0]["est"]
    assert last["2024-01-04 00:00:00"] == pytest.approx(ref, abs=1e-12)


def test_trailing_window_scopes_buckets(ev):
    out = moving_percentiles(ev, "ts", "value", "day", window=1,
                             qs=(0.5,), lo=0.0, hi=64.0, n_bins=32)
    got = {str(r["bucket"]): r["est"] for r in out.collect()}
    # window=1: each bucket sees only its own day's values
    d1 = histogram_quantiles(
        histogram_sketch(ev.filter(F.dayofmonth("ts") == 1), "value",
                         0.0, 64.0, 32), [0.5], 0.0, 64.0, 32
    ).collect()[0]["est"]
    assert got["2024-01-01 00:00:00"] == pytest.approx(d1, abs=1e-12)
    # empty day 3 with window=1 -> NULL est, bucket still present
    assert got["2024-01-03 00:00:00"] is None


def test_empty_bucket_inside_window_is_transparent(ev):
    out = moving_percentiles(ev, "ts", "value", "day", window=2,
                             qs=(0.5,), lo=0.0, hi=64.0, n_bins=32)
    got = {str(r["bucket"]): r["est"] for r in out.collect()}
    # day 4 with window=2 spans empty day 3: sees only day 4's values
    d4 = histogram_quantiles(
        histogram_sketch(ev.filter(F.dayofmonth("ts") == 4), "value",
                         0.0, 64.0, 32), [0.5], 0.0, 64.0, 32
    ).collect()[0]["est"]
    assert got["2024-01-04 00:00:00"] == pytest.approx(d4, abs=1e-12)


def test_validation(ev):
    with pytest.raises(ValueError):
        moving_percentiles(ev, "ts", "value", "week", 3, (0.5,), 0, 64)
    with pytest.raises(ValueError):
        moving_percentiles(ev, "ts", "value", "day", 0, (0.5,), 0, 64)
    with pytest.raises(ValueError):
        moving_percentiles(ev, "ts", "value", "day", 3, (1.5,), 0, 64)

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

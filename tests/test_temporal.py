"""As-of join (operators/temporal.py) against pandas.merge_asof — the
reference implementation of the semantics — plus tolerance, forward
direction, and left-join null contracts."""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from bertopic_spark.operators.temporal import asof_join

T0 = datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def frames(spark):
    import random

    rng = random.Random(99)
    lrows = [(u, T0 + timedelta(minutes=rng.randrange(0, 5000)), i)
             for i, u in enumerate(rng.choices(range(6), k=120))]
    rrows = [(u, T0 + timedelta(minutes=rng.randrange(0, 5000)), float(i))
             for i, u in enumerate(rng.choices(range(8), k=80))]
    # enforce the uniqueness contract per (key, ts)
    lrows = list({(u, t): (u, t, i) for u, t, i in lrows}.values())
    rrows = list({(u, t): (u, t, v) for u, t, v in rrows}.values())
    L = spark.createDataFrame(lrows, "user long, ts timestamp, lid long")
    R = spark.createDataFrame(rrows, "user long, ts timestamp, val double")
    lp = pd.DataFrame(lrows, columns=["user", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["user", "ts", "val"]).sort_values("ts")
    return L, R, lp, rp


@pytest.mark.parametrize("direction,tol", [
    ("backward", None), ("forward", None),
    ("backward", 3600.0), ("forward", 600.0),
])
def test_asof_matches_pandas_merge_asof(frames, direction, tol):
    L, R, lp, rp = frames
    got = {r["lid"]: (r["ts_right"], r["val_right"]) for r in
           asof_join(L, R, ["user"], "ts", direction=direction,
                     tolerance_seconds=tol).collect()}
    ref = pd.merge_asof(
        lp, rp, on="ts", by="user", direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol))
    assert len(got) == len(lp)  # left-join: every left row survives
    for _, row in ref.iterrows():
        g_ts, g_val = got[row["lid"]]
        if pd.isna(row["val"]):
            assert g_val is None and g_ts is None
        else:
            assert g_val == row["val"]
            # matched right ts reported alongside
            assert g_ts is not None


def test_asof_tie_is_inclusive(spark):
    L = spark.createDataFrame([(1, T0, 0)], "user long, ts timestamp, lid long")
    R = spark.createDataFrame([(1, T0, 5.0)], "user long, ts timestamp, val double")
    for d in ("backward", "forward"):
        out = asof_join(L, R, ["user"], "ts", direction=d).collect()[0]
        assert out["val_right"] == 5.0


def test_asof_validation(spark):
    L = spark.createDataFrame([(1, T0, 0)], "user long, ts timestamp, lid long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(L, L, ["user"], "ts", direction="nearest")


def test_range_join_matches_brute_force(spark, frames):
    from bertopic_spark.operators.temporal import range_join

    L, R, lp, rp = frames
    for lo, hi in [(-3600.0, 0.0), (0.0, 1800.0), (-600.0, 600.0)]:
        got = {(r["lid"], r["val_right"]) for r in
               range_join(L, R, ["user"], "ts", "ts", lo, hi).collect()}
        want = set()
        for _, l in lp.iterrows():
            for _, r in rp.iterrows():
                if l["user"] == r["user"] and \
                        lo <= (r["ts"] - l["ts"]).total_seconds() <= hi:
                    want.add((l["lid"], r["val"]))
        assert got == want, (lo, hi)


def test_range_join_zero_width_and_validation(spark):
    from bertopic_spark.operators.temporal import range_join

    L = spark.createDataFrame([(1, T0, 0)], "user long, ts timestamp, lid long")
    R = spark.createDataFrame([(1, T0, 5.0), (1, T0 + timedelta(seconds=1), 6.0)],
                              "user long, rts timestamp, val double")
    got = range_join(L, R, ["user"], "ts", "rts", 0.0, 0.0).collect()
    assert [(r["lid"], r["val_right"]) for r in got] == [(0, 5.0)]
    with pytest.raises(ValueError):
        range_join(L, R, ["user"], "ts", "rts", 10.0, 0.0)


def test_range_join_fractional_band_edge(spark):
    # regression: W derived independently of the filter integers truncated
    # 1 µs short (int((0.3-(-0.6))*1e6) == 899999), losing upper-edge
    # matches that landed in a third, unprobed bucket
    from bertopic_spark.operators.temporal import range_join

    rows_l, rows_r = [], []
    for i in range(200):
        base = T0 + timedelta(seconds=i * 7.3)
        rows_l.append((1, base, i))
        rows_r.append((1, base + timedelta(seconds=0.3), float(i)))  # at band_hi
        rows_r.append((1, base - timedelta(seconds=0.6), float(i) + 0.5))  # at band_lo
    L = spark.createDataFrame(rows_l, "user long, ts timestamp, lid long")
    R = spark.createDataFrame(rows_r, "user long, rts timestamp, val double")
    got = {(r["lid"], r["val_right"]) for r in
           range_join(L, R, ["user"], "ts", "rts", -0.6, 0.3).collect()}
    lp, rp = L.collect(), R.collect()
    want = {(l["lid"], r["val"]) for l in lp for r in rp
            if -0.6 <= (r["rts"] - l["ts"]).total_seconds() <= 0.3}
    assert got == want
    # both inclusive edges must be present for every left row
    assert all((i, float(i)) in got and (i, float(i) + 0.5) in got
               for i in range(200))


def test_asof_join_null_timestamps(spark):
    # a NULL right ts must never masquerade as a match; NULL left ts rows
    # come back unmatched (merge_asof refuses NaT keys outright)
    from bertopic_spark.operators.temporal import asof_join

    L = spark.createDataFrame(
        [(1, T0, 0), (1, None, 1)], "user long, ts timestamp, lid long")
    R = spark.createDataFrame(
        [(1, None, 5.0), (2, T0, 7.0)], "user long, ts timestamp, val double")
    got = {r["lid"]: (r["ts_right"], r["val_right"]) for r in
           asof_join(L, R, ["user"], "ts").collect()}
    assert got == {0: (None, None), 1: (None, None)}


def test_histogram_quantile_hand_case(spark):
    """le=[1,2,4,inf], cumulative=[2,5,9,10]: q=.5 -> rank 5 lands on
    le=2 exactly (2.0); q=.95 -> +Inf bucket caps at 4.0; q=.1 -> 0.5."""
    from bertopic_spark.operators.temporal import histogram_quantile

    rows = [("s", 1.0, 2), ("s", 2.0, 5), ("s", 4.0, 9),
            ("s", float("inf"), 10)]
    b = spark.createDataFrame(rows, "series string, le double, count long")
    for q, want in ((0.5, 2.0), (0.95, 4.0), (0.1, 0.5)):
        out = histogram_quantile(b, q, keys=("series",)).collect()
        assert len(out) == 1
        assert out[0]["value"] == pytest.approx(want, abs=1e-9), q
    # zero-total series yields no row
    z = spark.createDataFrame([("z", 1.0, 0), ("z", float("inf"), 0)],
                              "series string, le double, count long")
    assert histogram_quantile(z, 0.5, keys=("series",)).count() == 0
    with pytest.raises(ValueError):
        histogram_quantile(b, 1.5)


def test_change_point_cusum_hand_case(spark):
    """[0,0,0,10,10]: CUSUM argmax |S| at the 3rd point; shift 0 -> 10."""
    from bertopic_spark.operators.temporal import change_point_cusum

    rows = [("a", i, v) for i, v in enumerate([0.0, 0.0, 0.0, 10.0, 10.0])]
    s = spark.createDataFrame(rows, "k string, t long, v double")
    r = change_point_cusum(s, "t", "v", keys=("k",)).collect()[0]
    assert r["cp_order"] == 2
    assert r["mean_before"] == pytest.approx(0.0)
    assert r["mean_after"] == pytest.approx(10.0)
    assert r["magnitude"] == pytest.approx(10.0)
    # constant series: magnitude 0, still a deterministic earliest argmax
    c = spark.createDataFrame([("c", i, 5.0) for i in range(4)],
                              "k string, t long, v double")
    rc = change_point_cusum(c, "t", "v", keys=("k",)).collect()[0]
    assert rc["magnitude"] == pytest.approx(0.0)
    assert rc["cp_order"] == 0
    # 1-point series excluded
    one = spark.createDataFrame([("o", 0, 1.0)], "k string, t long, v double")
    assert change_point_cusum(one, "t", "v", keys=("k",)).count() == 0

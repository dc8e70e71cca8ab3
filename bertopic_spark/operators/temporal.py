"""Temporal joins Spark lacks as built-ins: as-of join (nearest event
at-or-before / at-or-after per key), the classic enrichment primitive for
event streams ("the user's latest purchase before this click").

Implementation is the union-tag trick — NOT a range join: right rows are
tagged 0 and left rows 1, unioned, and one window pass per key ordered by
(ts, tag) lets every left row pick the last non-null right payload at
ts' ≤ ts (`F.last(ignorenulls=True)` over an unbounded-preceding frame).
One shuffle on the join keys, no candidate-pair blowup (a naive range
join is |left|·|right| per key before filtering; this is |left|+|right|).

100-TB notes: the window is sequential WITHIN a key — a single pathological
hot key serializes into one task (fine for user/session keys, whose
per-key cardinality is bounded by reality); if a key is genuinely
unbounded, pre-bucket by coarse time and stitch the bucket boundaries.
DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Microseconds since epoch; NTZ-safe (unix_micros rejects
    TIMESTAMP_NTZ — the cast interprets NTZ in the session zone, which is
    consistent across both join sides, so band/tolerance arithmetic is
    unaffected)."""
    return F.unix_micros(col.cast("timestamp"))


def range_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               left_ts: str, right_ts: str,
               lower_seconds: float, upper_seconds: float,
               suffix: str = "_right") -> DataFrame:
    """Band join: every (left, right) pair with the same keys and
    ``right_ts`` ∈ [left_ts + lower, left_ts + upper] (inclusive).

    A naive inequality join makes Spark build |L|·|R| pairs PER KEY
    before filtering (BroadcastNestedLoopJoin / cartesian within key).
    This implementation buckets both sides by the band width W =
    upper − lower: a right row lands in bucket floor(ts/W); a left row's
    band can only intersect buckets floor((ts+lower)/W) and the one
    after, so each left row explodes into ≤ 2 bucket probes and the join
    is an EQUI-join on (keys, bucket) followed by the exact band filter —
    candidates are linear in the true neighborhood size, and Catalyst
    gets a hashable key (shuffle or broadcast, its choice).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    # quantize the band ONCE and derive the bucket width from the SAME
    # integers the filter uses — deriving W independently via
    # int((upper-lower)*1e6) can truncate 1 µs short of the filter span
    # (float error), leaving upper-edge matches in a third, unprobed
    # bucket
    lo_i, hi_i = int(round(lower_seconds * 1e6)), int(round(upper_seconds * 1e6))
    w_us = max(hi_i - lo_i, 1)
    on = list(on)
    rcols = [c for c in right.columns if c not in on]
    r = right.select(
        *on, *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        (F.floor(_us(F.col(right_ts)) / w_us)).alias("_bkt"))
    lo_us = _us(F.col(left_ts)) + lo_i
    l = left.withColumn(
        "_bkt", F.explode(F.array(F.floor(lo_us / w_us),
                                  F.floor(lo_us / w_us) + 1)))
    rts = F.col(f"{right_ts}{suffix}")
    band_lo = _us(F.col(left_ts)) + F.lit(lo_i)
    band_hi = _us(F.col(left_ts)) + F.lit(hi_i)
    return (l.join(r, [*on, "_bkt"])
            .filter(_us(rts).between(band_lo, band_hi))
            .drop("_bkt"))


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str | None = None,
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              right_cols: Sequence[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """Left rows enriched with the temporally nearest right row per key.

    ``direction="backward"`` (default): the right row with the greatest
    ``right_ts`` ≤ ``left_ts``; ``"forward"``: the least ``right_ts`` ≥
    ``left_ts``. Ties at equal timestamps match (inclusive), like
    pandas.merge_asof and DuckDB ASOF JOIN. Left-join semantics: every
    left row survives; unmatched (or out-of-``tolerance_seconds``) rows
    carry nulls. ``right_cols`` defaults to every right column except the
    keys; matched columns are suffixed, plus ``<right_ts><suffix>``.

    Right rows must be unique per (keys, right_ts) — enforce upstream
    (e.g. keep the max-id event) or the matched payload is
    nondeterministic; this mirrors merge_asof's contract. NULL
    timestamps: right rows with a NULL ``right_ts`` are dropped (they
    order before/after everything under Spark's null-first sort and
    would otherwise masquerade as matches — pandas.merge_asof refuses
    NaT keys outright); left rows with a NULL ``left_ts`` are returned
    unmatched.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != rts]
    payload_fields = [F.col(rts).alias(f"{rts}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    r = (right.filter(F.col(rts).isNotNull())
         .select(*on, F.col(rts).alias("_ts"),
                 F.struct(*payload_fields).alias("_payload"),
                 F.lit(0).alias("_tag")))
    left_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l_all = left.select(*on, F.col(left_ts).alias("_ts"),
                        left_struct, F.lit(1).alias("_tag"))
    l = l_all.filter(F.col("_ts").isNotNull())
    l_null = l_all.filter(F.col("_ts").isNull())
    both = (r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))
            .select(*on, "_ts", "_lrow", "_payload", "_tag")
            .unionByName(
                l.withColumn("_payload",
                             F.lit(None).cast(r.schema["_payload"].dataType))
                .select(*on, "_ts", "_lrow", "_payload", "_tag")))
    ts_order = F.col("_ts").asc() if direction == "backward" \
        else F.col("_ts").desc()
    w = (Window.partitionBy(*on).orderBy(ts_order, F.col("_tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (both.withColumn("_m", F.last("_payload", ignorenulls=True)
                               .over(w))
               .filter(F.col("_tag") == 1))
    if tolerance_seconds is not None:
        gap = F.abs(_us(F.col("_ts")) -
                    _us(F.col(f"_m.{rts}{suffix}"))) / 1e6
        matched = matched.withColumn(
            "_m", F.when(gap <= float(tolerance_seconds), F.col("_m")))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{rts}{suffix}").alias(f"{rts}{suffix}")]
    out_cols += [F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}")
                 for c in right_cols]
    out = matched.select(*out_cols)
    unmatched = l_null.withColumn(
        "_m", F.lit(None).cast(r.schema["_payload"].dataType))
    return out.unionByName(unmatched.select(*out_cols))


def funnel_conversion(df, steps, ts_col: str = "ts",
                      type_col: str = "event_type",
                      user_col: str = "user_id",
                      window_us: int | None = None):
    """Ordered funnel analysis (the product-analytics staple): per user,
    greedy first-touch matching — step 1 anchors at the user's EARLIEST
    step-1 event, each later step at its earliest occurrence strictly
    after the previous step (all within ``window_us`` microseconds of
    the anchor when given). Returns one row per funnel depth:
    (step_idx, step, n_users) with n_users = users whose greedy chain
    reaches that step — monotonically non-increasing by construction.

    Physical shape: events pruned to the step types, one groupBy(user)
    collecting each user's per-step sorted timestamp arrays (bounded by
    the user's own activity), the greedy chain evaluated in array HOFs
    (min-after-previous per step — the same pre-event reasoning as the
    span sweeps), then a |steps|-sized agg. One shuffle on the user key.
    """
    sts = [str(s) for s in steps]
    if len(sts) < 2:
        raise ValueError("a funnel needs >= 2 steps")
    if len(set(sts)) != len(sts):
        raise ValueError("steps must be distinct")
    ev = (df.where(F.col(user_col).isNotNull() &
                   F.col(type_col).isin(sts))
          .select(F.col(user_col).alias("_u"),
                  F.col(type_col).alias("_s"),
                  F.unix_micros(F.col(ts_col).cast("timestamp"))
                  .alias("_t")))
    arrs = [F.sort_array(F.collect_list(
        F.when(F.col("_s") == s, F.col("_t")))).alias(f"_a{i}")
        for i, s in enumerate(sts)]
    per_user = ev.groupBy("_u").agg(*arrs)
    # greedy chain: t0 = min(a0); t_i = min value in a_i strictly after
    # t_{i-1} (and within the window of t0); NULL once a step misses.
    # Each step references the PREVIOUS step's column (withColumn), so
    # the expression tree stays linear in funnel length.
    depth = per_user.withColumn("_t0", F.array_min("_a0"))

    def _after(prev_col):
        # factory so the HOF lambda stays single-parameter (pyspark
        # treats a second parameter as the element index)
        return lambda t: t > F.col(prev_col)

    def _in_window(t):
        return t - F.col("_t0") <= F.lit(int(window_us))

    for i in range(1, len(sts)):
        cand = F.filter(F.col(f"_a{i}"), _after(f"_t{i - 1}"))
        if window_us is not None:
            cand = F.filter(cand, _in_window)
        depth = depth.withColumn(
            f"_t{i}", F.when(F.col(f"_t{i - 1}").isNotNull(),
                             F.array_min(cand)))
    depth = depth.select(*[f"_t{i}" for i in range(len(sts))])
    counts = depth.agg(*[
        F.count(F.col(f"_t{i}")).cast("long").alias(f"_n{i}")
        for i in range(len(sts))])
    pairs = F.explode(F.array(*[
        F.struct(F.lit(i + 1).alias("step_idx"), F.lit(s).alias("step"),
                 F.col(f"_n{i}").alias("n_users"))
        for i, s in enumerate(sts)])).alias("p")
    return (counts.select(pairs)
            .select(F.col("p.step_idx").cast("long").alias("step_idx"),
                    "p.step", "p.n_users"))


def counter_rate(buckets, order_col: str, value_col: str,
                 interval_seconds: float,
                 keys=(), dp: int = 6):
    """Prometheus-style ``rate()`` over a MONOTONIC COUNTER series with
    reset detection: per adjacent bucket pair, increase = vₜ − vₜ₋₁ when
    non-negative, else vₜ (the counter restarted from zero — the
    standard single-reset assumption); rate = increase / interval.
    First bucket of each series has NULL rate (no predecessor), like
    PromQL. Returns (keys…, order_col, value, increase, rate).

    One lag window over the BUCKET relation per series — the TSDB
    operator that makes ever-growing counters (bytes served, requests
    handled) chartable as throughput.
    """
    if interval_seconds <= 0:
        raise ValueError("interval_seconds must be > 0")
    gb = list(keys)
    w = Window.partitionBy(*gb).orderBy(order_col)
    base = buckets.select(*gb, F.col(order_col),
                          F.col(value_col).cast("double").alias("value"))
    v = F.col("value")
    prev = F.lag(v).over(w)
    inc = F.when(prev.isNull(), F.lit(None).cast("double")) \
        .when(v >= prev, v - prev).otherwise(v)
    return (base
            .withColumn("increase", F.round(inc, dp))
            .withColumn("rate", F.round(inc / F.lit(float(interval_seconds)),
                                        dp)))


def interval_overlap_join(a, b, a_id: str, b_id: str,
                          start_col: str = "start", end_col: str = "end",
                          bucket_seconds: int = 3600):
    """Interval overlap join: pairs (a, b) whose HALF-OPEN time intervals
    [start, end) intersect — the temporal-database primitive behind
    "which deploys overlapped which incidents". Never a cross join: each
    interval explodes to the fixed-width buckets it covers
    (⌈len/width⌉ rows — bounded when interval lengths are), pairs
    equi-join on the bucket, and the exact overlap predicate + a
    min-bucket dedup keep each pair exactly once. Returns
    (a_id, b_id, overlap_us).

    Shuffle key = the time bucket: load spreads over the timeline, and
    ``bucket_seconds`` trades bucket-row fanout against per-bucket pair
    density exactly like the band-width range join.

    Degenerate intervals (end <= start) are EMPTY under the half-open
    convention and participate in no pair — both sides filter them
    before spreading, and any paired oracle must apply the same
    ``end > start`` filter (a bare ``a.s < b.e AND b.s < a.e`` predicate
    would match a zero-length interval strictly inside the other side).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be > 0")
    bus = int(bucket_seconds) * 1_000_000

    def spread(df, idc):
        s = F.unix_micros(F.col(start_col).cast("timestamp"))
        e = F.unix_micros(F.col(end_col).cast("timestamp"))
        out = df.select(F.col(idc), s.alias("_s"), e.alias("_e")) \
            .where(F.col("_e") > F.col("_s"))
        bks = F.sequence(F.floor(F.col("_s") / bus),
                         F.floor((F.col("_e") - 1) / bus))
        return out.select(idc, "_s", "_e", F.explode(bks).alias("_bk"))
    aa = spread(a, a_id)
    bbb = (spread(b, b_id)
           .withColumnRenamed("_s", "_s2").withColumnRenamed("_e", "_e2"))
    pairs = (aa.join(bbb, "_bk")
             .where((F.col("_s") < F.col("_e2")) &
                    (F.col("_s2") < F.col("_e")))
             .groupBy(a_id, b_id)
             .agg(F.first(F.least(F.col("_e"), F.col("_e2")) -
                          F.greatest(F.col("_s"), F.col("_s2")))
                  .alias("overlap_us")))  # constant per pair; groupBy dedups
    return pairs.select(a_id, b_id,
                        F.col("overlap_us").cast("long").alias("overlap_us"))


def histogram_quantile(buckets: DataFrame, q: float,
                       keys: Sequence[str] = (),
                       le_col: str = "le", count_col: str = "count",
                       dp: int = 6) -> DataFrame:
    """PromQL ``histogram_quantile(q, ...)`` over classic le-bucketed
    CUMULATIVE counts: per series (``keys``), find the lowest bucket whose
    cumulative count reaches rank = q·total and linearly interpolate
    inside it,

        value = lo + (le − lo) · (rank − c_prev) / (c − c_prev)

    with lo = the previous bucket's upper bound (0 for the first finite
    bucket, Prometheus convention) — and, when the rank lands in the
    +Inf bucket, the highest finite ``le`` is returned (Prometheus caps
    there rather than extrapolating). Series with zero total yield NULL.
    Returns (keys…, q, value).

    One lag/sum window pass over the BUCKET relation (|series|·|buckets|
    rows — metadata-sized next to the raw events), so the operator costs
    nothing at any corpus scale; building the buckets is the data pass
    and is a plain groupBy the caller owns.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    gb = list(keys)
    w = Window.partitionBy(*gb).orderBy("_le")
    wall = Window.partitionBy(*gb)
    b = (buckets.select(*gb, F.col(le_col).cast("double").alias("_le"),
                        F.col(count_col).cast("double").alias("_c"))
         .withColumn("_prev", F.coalesce(F.lag("_c").over(w), F.lit(0.0)))
         .withColumn("_lo", F.coalesce(F.lag("_le").over(w), F.lit(0.0)))
         .withColumn("_tot", F.max("_c").over(wall))
         .withColumn("_maxfin", F.max(F.when(
             F.col("_le") != float("inf"), F.col("_le"))).over(wall)))
    rank = F.lit(float(q)) * F.col("_tot")
    # lowest bucket with cumulative count >= rank (ties -> lowest le)
    hit = (b.filter((F.col("_tot") > 0) & (F.col("_c") >= rank))
           .withColumn("_rn", F.row_number().over(
               Window.partitionBy(*gb).orderBy("_le")))
           .filter(F.col("_rn") == 1))
    interp = F.when(
        F.col("_le") == float("inf"), F.col("_maxfin")
    ).otherwise(
        F.col("_lo") + (F.col("_le") - F.col("_lo")) *
        (rank - F.col("_prev")) /
        F.when(F.col("_c") > F.col("_prev"),
               F.col("_c") - F.col("_prev")).otherwise(F.lit(1.0)))
    return hit.select(*gb, F.lit(float(q)).alias("q"),
                      F.round(interp, dp).alias("value"))


def change_point_cusum(series: DataFrame, order_col: str, value_col: str,
                       keys: Sequence[str] = (), dp: int = 6) -> DataFrame:
    """Offline change-point detection by CUSUM (Page 1954; the ES 8.x
    ``change_point`` agg's simple_bulk shift test): per series, S_t =
    Σ_{i≤t}(x_i − x̄); the change point is the argmax of |S_t| (earliest
    on ties) and the shift estimate is the mean difference across it.
    Returns (keys…, cp_order, magnitude, mean_before, mean_after) — one
    row per series, NULL-free only for series with ≥ 2 points.

    Two window passes over the SERIES relation (already aggregated to
    buckets — metadata-sized): one for the cumulative sum, one argmax.
    The argmax runs on the SCALED cusum n·S_t = n·cumsum(x) − t·Σx
    (same argmax, positive scale) so that for integer-valued series every
    compared quantity is exact integer arithmetic — bit-identical across
    engines and partitionings, no ulp-flipped change points.
    """
    gb = list(keys)
    w = Window.partitionBy(*gb).orderBy(order_col)
    wall = Window.partitionBy(*gb)
    b = (series.select(*gb, F.col(order_col).alias("_o"),
                       F.col(value_col).cast("double").alias("_v"))
         .withColumn("_n", F.count(F.lit(1)).over(wall))
         .filter(F.col("_n") >= 2)
         .withColumn("_tot", F.sum("_v").over(wall))
         .withColumn("_i", F.row_number().over(
             Window.partitionBy(*gb).orderBy("_o")))
         .withColumn("_cum", F.sum("_v").over(
             Window.partitionBy(*gb).orderBy("_o")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
         .withColumn("_s", F.col("_n") * F.col("_cum") -
                     F.col("_i") * F.col("_tot")))
    # argmax |S_t| over t = 1..n-1 (a split AFTER the last point is no
    # split); earliest index wins ties — same rule in the oracle
    cand = b.filter(F.col("_i") < F.col("_n"))
    top = (cand.withColumn("_rn", F.row_number().over(
        Window.partitionBy(*gb).orderBy(F.desc(F.abs(F.col("_s"))),
                                        F.asc("_o"))))
        .filter(F.col("_rn") == 1)
        .select(*gb, F.col("_o").alias("cp_order"), F.col("_i").alias("_cp")))
    stats = (b.join(top, gb) if gb else b.crossJoin(F.broadcast(top)))
    agg = (stats.groupBy(*gb, "cp_order")
           .agg(F.avg(F.when(F.col("_i") <= F.col("_cp"), F.col("_v")))
                .alias("_mb"),
                F.avg(F.when(F.col("_i") > F.col("_cp"), F.col("_v")))
                .alias("_ma")))
    return agg.select(
        *gb, "cp_order",
        F.round(F.abs(F.col("_ma") - F.col("_mb")), dp).alias("magnitude"),
        F.round("_mb", dp).alias("mean_before"),
        F.round("_ma", dp).alias("mean_after"))

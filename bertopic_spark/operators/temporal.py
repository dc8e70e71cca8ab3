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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    nondeterministic; this mirrors merge_asof's contract.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != rts]
    payload_fields = [F.col(rts).alias(f"{rts}{suffix}")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    r = right.select(*on, F.col(rts).alias("_ts"),
                     F.struct(*payload_fields).alias("_payload"),
                     F.lit(0).alias("_tag"))
    left_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l = left.select(*on, F.col(left_ts).alias("_ts"),
                    left_struct, F.lit(1).alias("_tag"))
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
        gap = F.abs(F.unix_micros(F.col("_ts")) -
                    F.unix_micros(F.col(f"_m.{rts}{suffix}"))) / 1e6
        matched = matched.withColumn(
            "_m", F.when(gap <= float(tolerance_seconds), F.col("_m")))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{rts}{suffix}").alias(f"{rts}{suffix}")]
    out_cols += [F.col(f"_m.{c}{suffix}").alias(f"{c}{suffix}")
                 for c in right_cols]
    return matched.select(*out_cols)

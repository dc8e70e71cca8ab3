"""Hypertable-style continuous-aggregate rollups (TimescaleDB analog):
a multi-resolution time hierarchy where the FINEST level is aggregated
from raw events once and every coarser level is re-aggregated from the
level below — count/sum/min/max are algebraic, so day-from-hour equals
day-from-raw exactly, and avg is derived as sum/n at read time. 'week'
may only terminate a hierarchy (ISO weeks cross month/year boundaries,
so nothing coarser can be derived from week buckets — validated).

Why it matters at 100 TB: the raw event table is scanned once per refresh
window for the finest grain; hour→day→month→year each re-aggregate a
relation that is orders of magnitude smaller than raw. Non-algebraic
measures (distinct users) do NOT rollup — use the mergeable sketches
(``operators/sketch.py`` HLL registers merge linearly) alongside.
Incremental refresh composes with the streaming layer: the finest level
is a watermarked windowed agg (``streaming/incremental.windowed_term_
counts`` shape) and coarser levels re-aggregate its appends.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# coarse-to-fine ordering for validation
_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]


def rollup_levels(df: DataFrame, ts_col: str, keys: Sequence[str],
                  value_col: str,
                  levels: Sequence[str] = ("hour", "day", "week"),
                  ) -> dict[str, DataFrame]:
    """{level: (bucket, keys..., n, sum_v, min_v, max_v)} — the finest
    level aggregated from ``df`` once, each coarser level re-aggregated
    from the previous level's relation (one groupBy over an already-tiny
    input; raw is never re-scanned)."""
    lv = list(levels)
    order = [_GRAIN_ORDER.index(x) for x in lv]  # ValueError = bad grain
    if order != sorted(order) or len(set(lv)) != len(lv):
        raise ValueError(f"levels must be strictly fine-to-coarse, got {lv}")
    if "week" in lv[:-1]:
        # ISO weeks cross month/year boundaries: a month bucket derived
        # from week buckets credits each month-leading partial week to the
        # PRIOR month — week does not nest inside any coarser grain, so it
        # may only terminate a hierarchy
        raise ValueError(
            "'week' does not nest inside coarser grains (ISO weeks cross "
            "month/year boundaries) — it may only be the LAST level")
    keys = list(keys)
    out: dict[str, DataFrame] = {}
    finer: DataFrame | None = None
    for level in lv:
        if finer is None:
            agg = (df.select(
                F.date_trunc(level, F.col(ts_col)).alias("bucket"),
                *keys, F.col(value_col).alias("_v"))
                .groupBy("bucket", *keys)
                .agg(F.count(F.lit(1)).cast("long").alias("n"),
                     F.sum("_v").alias("sum_v"),
                     F.min("_v").alias("min_v"),
                     F.max("_v").alias("max_v")))
        else:
            agg = (finer.select(
                F.date_trunc(level, F.col("bucket")).alias("bucket"),
                *keys, "n", "sum_v", "min_v", "max_v")
                .groupBy("bucket", *keys)
                .agg(F.sum("n").cast("long").alias("n"),
                     F.sum("sum_v").alias("sum_v"),
                     F.min("min_v").alias("min_v"),
                     F.max("max_v").alias("max_v")))
        out[level] = agg
        finer = agg
    return out


def with_avg(level_df: DataFrame, dp: int = 6) -> DataFrame:
    """Derived average at read time (avg itself is not algebraic; sum/n
    is — the standard continuous-aggregate trick)."""
    return level_df.withColumn(
        "avg_v", F.round(F.col("sum_v") / F.col("n"), dp))


def composite_agg(df: DataFrame, keys, measures, size: int = 10,
                  after: Sequence | None = None) -> DataFrame:
    """ES composite aggregation: deterministic multi-key bucket pagination.

    ``keys``: ordered (name, Column) pairs defining the bucket key;
    buckets sort ascending by the full key tuple (ES ``composite``
    sources order, ``missing_bucket=false`` — NULL-keyed rows are
    excluded). ``measures``: (name, aggregate Column) pairs. ``after``:
    the last bucket key tuple of the previous page, or None for page 1.

    The after-key is a KEYSET predicate on the grouping keys, so it is
    applied BELOW the aggregation — page N+1 re-aggregates only rows
    whose key tuple sorts after the cursor (predicate on the raw scan,
    partition-prunable when the table is laid out by the leading key),
    never "compute all buckets then OFFSET". That is what makes deep
    pagination over a 100-TB event table O(remaining data), and why ES
    recommends composite over terms+partitions for full enumeration.
    The final global sort runs on ONE page of ``size`` bucket rows.
    """
    ks = list(keys)
    ms = list(measures)
    if not ks or not ms or size < 1:
        raise ValueError("need keys, measures and size >= 1")
    names = [n for n, _ in ks]
    keyed = df
    for n, c in ks:  # withColumn so a key may shadow its source column
        keyed = keyed.withColumn(n, c)
    for n in names:
        keyed = keyed.filter(F.col(n).isNotNull())
    if after is not None:
        if len(after) != len(ks):
            raise ValueError("after must have one value per key")
        # lexicographic (k1..kn) > (a1..an) as an OR-of-ANDs chain
        pred = None
        for i in range(len(ks)):
            clause = F.col(names[i]) > F.lit(after[i])
            for j in range(i):
                clause = clause & (F.col(names[j]) == F.lit(after[j]))
            pred = clause if pred is None else pred | clause
        # redundant leading-key bound: implied by the OR chain but, unlike
        # it, parquet-pushable (a simple >= on one column) — this is what
        # prunes row groups / partitions when the table is laid out by the
        # leading key, instead of scanning everything below the cursor.
        keyed = keyed.filter((F.col(names[0]) >= F.lit(after[0])) & pred)
    out = keyed.groupBy(*names).agg(*[c.alias(n) for n, c in ms])
    return out.orderBy(*[F.asc(n) for n in names]).limit(size)


def pipeline_aggs(buckets: DataFrame, order_col: str, value_col: str,
                  keys: Sequence[str] = (), window: int = 3,
                  dp: int = 6) -> DataFrame:
    """ES pipeline aggregations (cumulative_sum, derivative, moving_fn
    average) over an ALREADY-AGGREGATED bucket relation — e.g. a
    date_histogram / continuous-aggregate level, one row per (keys,
    order_col) bucket.

    Adds ``cum_<v>`` (running sum), ``deriv_<v>`` (bucket minus previous
    bucket; NULL on each series' first bucket, like ES derivative), and
    ``mavg_<v>`` (trailing ``window``-bucket mean incl. current, rounded
    to ``dp``). All three share ONE window spec (same partitioning and
    sort), so the plan pays a single exchange+sort regardless of how many
    pipeline metrics ride it.

    Scale note: this consumes BUCKETS, not raw rows — exactly like ES,
    whose pipeline aggs run on the coordinator over the returned
    histogram. Partitioned by ``keys`` the window never concentrates more
    than one series on a task; with no keys the relation is a single
    global time series (already orders of magnitude smaller than raw —
    hours-in-a-decade sized), which is the one case a single-partition
    sort is the honest plan.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.partitionBy(*keys).orderBy(order_col)
    v = F.col(value_col)
    return buckets.select(
        *keys, order_col, value_col,
        F.sum(value_col).over(w).alias(f"cum_{value_col}"),
        (v - F.lag(value_col).over(w)).alias(f"deriv_{value_col}"),
        F.round(F.avg(value_col).over(
            w.rowsBetween(-(window - 1), 0)), dp).alias(f"mavg_{value_col}"))


def range_agg(df: DataFrame, value_col: str, ranges,
              dp: int = 6) -> DataFrame:
    """ES ``range`` aggregation: (range_key, from_v, to_v, n_docs,
    sum_value) for explicit half-open buckets ``from <= v < to`` (a NULL
    bound is unbounded, ES semantics). Ranges MAY overlap — a row lands in
    EVERY bucket containing it, which is why this is not a CASE/width_bucket
    binning: the tiny literal range list explodes against each row (≤
    |ranges| copies, map-side, one scan) and empty buckets come back with
    n_docs = 0 via a final broadcast left join from the literal ranges —
    ES returns empty ranges rather than dropping them.
    """
    rs = [(str(k), lo, hi) for k, lo, hi in ranges]
    if not rs or len({k for k, _, _ in rs}) != len(rs):
        raise ValueError("need non-empty ranges with unique keys")
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        rs, "range_key string, from_v double, to_v double")
    rlit = F.explode(F.array(*[
        F.struct(F.lit(k).alias("range_key"),
                 F.lit(lo).cast("double").alias("from_v"),
                 F.lit(hi).cast("double").alias("to_v"))
        for k, lo, hi in rs])).alias("r")
    v = F.col(value_col)
    hits = (df.filter(v.isNotNull()).select(v.alias("_v"), rlit)
            .select("_v", "r.range_key", "r.from_v", "r.to_v")
            .filter((F.col("from_v").isNull() | (F.col("_v") >= F.col("from_v")))
                    & (F.col("to_v").isNull() | (F.col("_v") < F.col("to_v")))))
    agg = (hits.groupBy("range_key")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.round(F.sum("_v"), dp).alias("sum_value")))
    return (rdf.join(F.broadcast(agg), "range_key", "left")
            .select("range_key", "from_v", "to_v",
                    F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
                    F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")))


def matrix_stats(df: DataFrame, cols: Sequence[str], dp: int = 6) -> DataFrame:
    """ES ``matrix_stats``: pairwise Pearson correlation over numeric
    fields — (field_x, field_y, n, corr) for every unordered pair
    including self (corr 1.0), ``n`` counting rows where BOTH fields are
    non-null (ES's listwise pair count).

    ONE scan computes every pair: the k(k+1)/2 moment aggregates ride a
    single two-phase agg (partial moments merge associatively exactly as
    ES merges per-shard running moments), and the result is a
    pairs-squared-sized local relation — never a row-level self-join,
    which is the naive unpivot formulation's O(n·k²) shuffle.
    """
    cs = list(cols)
    if len(cs) < 2 or len(set(cs)) != len(cs):
        raise ValueError("need >= 2 distinct columns")
    pairs = [(a, b) for i, a in enumerate(cs) for b in cs[i:]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        both = F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1)
        aggs.append(F.count(both).cast("long").alias(f"n_{i}"))
        aggs.append(F.round(F.corr(a, b), dp).alias(f"c_{i}"))
    row = df.agg(*aggs).collect()[0]
    data = [(a, b, row[f"n_{i}"], row[f"c_{i}"])
            for i, (a, b) in enumerate(pairs)]
    return df.sparkSession.createDataFrame(
        data, "field_x string, field_y string, n long, corr double")


def adjacency_matrix(df: DataFrame, filters) -> DataFrame:
    """ES ``adjacency_matrix`` agg: named filter intersections — one row
    per unordered filter pair ``key_x <= key_y`` with the count of docs
    matching BOTH (diagonal rows are the per-filter counts); empty
    intersections are omitted, matching ES's bucket list.

    ONE scan: each row maps to the array of filter names it matches, then
    the pair expansion explodes only that matched subset — |matched|² rows
    per doc, bounded by the filter count (ES caps at 100), never one scan
    per pair and never a row-level self-join.
    """
    names = list(filters)
    if not names or len(set(names)) != len(names):
        raise ValueError("need distinct filter names")
    matched = F.array_compact(F.array(
        *[F.when(c, F.lit(n)) for n, c in filters.items()]))
    return (df.select(matched.alias("ks"))
            .select(F.explode("ks").alias("key_x"), "ks")
            .select("key_x", F.explode("ks").alias("key_y"))
            .filter(F.col("key_x") <= F.col("key_y"))
            .groupBy("key_x", "key_y")
            .agg(F.count(F.lit(1)).cast("long").alias("doc_count")))


def extended_stats(df: DataFrame, value_col: str, keys: Sequence[str],
                   dp: int = 6) -> DataFrame:
    """ES ``extended_stats`` agg: per-bucket count / min / max / sum /
    avg / sum_of_squares / variance / std_deviation (population, ES
    default). Derived moments use the explicit shard-mergeable sums
    (variance = sos/n − (sum/n)², exactly how ES merges per-shard
    running sums) rather than engine-native var_pop — formula-identical
    across engines, one two-phase hash agg, no window."""
    n = F.count(value_col)
    s = F.sum(value_col)
    sos = F.sum(F.col(value_col) * F.col(value_col))
    var = sos / n - (s / n) * (s / n)
    return df.groupBy(*keys).agg(
        n.cast("long").alias("n"),
        F.round(F.min(value_col), dp).alias("min_v"),
        F.round(F.max(value_col), dp).alias("max_v"),
        F.round(s, dp).alias("sum_v"),
        F.round(s / n, dp).alias("avg_v"),
        F.round(sos, dp).alias("sum_sq"),
        F.round(var, dp).alias("variance"),
        F.round(F.sqrt(var), dp).alias("std_dev"),
    )


def t_test_agg(df: DataFrame, value_col: str, side_col: str,
               keys: Sequence[str] | None = None, dp: int = 6) -> DataFrame:
    """ES ``t_test`` agg (unpaired heteroscedastic = Welch, the ES
    default): per bucket, the t-statistic between the rows where
    ``side_col`` is true (population a) and false (population b).

    Both populations' moments ride ONE two-phase hash agg via conditional
    sums (never two scans, never a self-join); variance is the unbiased
    sample form ES uses, derived from the shard-mergeable (n, sum, sum_sq)
    triple exactly as ES merges per-shard running sums. Buckets where
    either side has < 2 values return NULL t (ES returns null there).
    """
    keys = list(keys or [])
    v = F.col(value_col).cast("double")
    a, b = F.col(side_col).cast("boolean"), ~F.col(side_col).cast("boolean")

    def side(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0.0)))

    na = F.sum(F.when(a & v.isNotNull(), 1).otherwise(0)).cast("double")
    nb = F.sum(F.when(b & v.isNotNull(), 1).otherwise(0)).cast("double")
    sa, sb = side(a, v), side(b, v)
    qa, qb = side(a, v * v), side(b, v * v)
    # try_divide: one-sided / n<2 buckets yield NULL (ES returns null),
    # never an ANSI divide-by-zero
    ma, mb = F.try_divide(sa, na), F.try_divide(sb, nb)
    va = F.try_divide(qa - F.try_divide(sa * sa, na), na - 1)
    vb = F.try_divide(qb - F.try_divide(sb * sb, nb), nb - 1)
    t = F.try_divide(ma - mb,
                     F.sqrt(F.try_divide(va, na) + F.try_divide(vb, nb)))
    out = df.groupBy(*keys).agg(
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round(ma, dp).alias("mean_a"), F.round(mb, dp).alias("mean_b"),
        F.round(va, dp).alias("var_a"), F.round(vb, dp).alias("var_b"),
        F.round(F.when((na >= 2) & (nb >= 2), t), dp).alias("t_stat"))
    return out


def median_absolute_deviation(df: DataFrame, value_col: str,
                              keys: Sequence[str] | None = None,
                              dp: int = 6) -> DataFrame:
    """ES ``median_absolute_deviation`` agg, computed EXACTLY (ES
    approximates with a TDigest; exactness is what makes this
    cross-engine gateable): MAD = median(|x - median(x)|) per bucket.

    Inherently two dependent aggregation passes (the second median needs
    the first); both are group-keyed exact ``percentile(0.5)`` aggs, the
    per-group median table is broadcast back onto the fact relation, so
    the plan is scan -> agg -> broadcast-join -> agg with no window over
    the fact table and no driver collect.
    """
    keys = list(keys or [])
    v = F.col(value_col).cast("double")
    med = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(0.5)).alias("_med"),
        F.count(v).cast("long").alias("n"))
    joined = (df.join(F.broadcast(med), keys) if keys
              else df.crossJoin(F.broadcast(med)))
    dev = F.abs(v - F.col("_med"))
    return (joined.groupBy(*(keys + ["_med", "n"]))
            .agg(F.round(F.percentile(dev, F.lit(0.5)), dp).alias("mad"))
            .select(*keys, "n", F.round(F.col("_med"), dp).alias("median"),
                    "mad"))


def string_stats(df: DataFrame, text_col: str,
                 keys: Sequence[str] | None = None, dp: int = 6) -> DataFrame:
    """ES ``string_stats`` agg with ``show_distribution``'s entropy: per
    bucket count / min_length / max_length / avg_length plus the Shannon
    entropy (bits) of the bucket's character distribution.

    Scale path: the char explode is pipelined into a partial hash agg
    inside the same task (explode rows never materialize beyond the
    operator pipeline), so the shuffle carries only the partially-summed
    ~|buckets| x |charset| keys no matter how big the corpus is. Entropy
    then folds over that tiny per-bucket char relation (the window runs
    on |buckets| x |charset| rows, never the fact table). Length stats
    ride a separate scan-level agg on the unexploded relation and join
    back broadcast at |buckets| width.
    """
    keys = list(keys or [])
    t = F.col(text_col)
    lens = df.groupBy(*keys).agg(
        F.count(t).cast("long").alias("n"),
        F.min(F.length(t)).cast("long").alias("min_length"),
        F.max(F.length(t)).cast("long").alias("max_length"),
        F.round(F.avg(F.length(t)), dp).alias("avg_length"))
    chars = (df.filter(F.length(t) > 0)
             .select(*keys, F.explode(F.split(t, "(?!^)")).alias("ch"))
             # split(limit=-1) keeps one trailing "" per row — not a char
             .filter(F.col("ch") != "")
             .groupBy(*(keys + ["ch"]))
             .agg(F.count(F.lit(1)).cast("double").alias("c")))
    tot = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    p = F.col("c") / F.sum("c").over(tot)
    ent = (chars.withColumn("_h", -p * F.log2(p))
           .groupBy(*keys).agg(F.round(F.sum("_h"), dp).alias("entropy")))
    return (lens.join(F.broadcast(ent), keys) if keys
            else lens.crossJoin(F.broadcast(ent)))


def rare_terms_agg(df: DataFrame, term_col: str, id_col: str,
                   max_doc_count: int = 1,
                   keys: Sequence[str] | None = None) -> DataFrame:
    """ES ``rare_terms`` agg: the long-tail terms whose DOCUMENT count is
    <= ``max_doc_count`` (ES caps it at 100; the knob means "show me what
    the terms agg's top-N ordering structurally hides").

    One distinct + one count per (keys, term) — both two-phase hash aggs.
    ES implements this with a CuckooFilter false-positive pass because a
    coordinator can't hold the tail; a shuffle CAN, and the exact form is
    what makes the result gateable cross-engine. Scale note: the output
    itself is tail-sized (can approach vocabulary size) — it's a relation
    to keep distributed or write out, never a driver list.
    """
    keys = list(keys or [])
    return (df.select(*keys, term_col, id_col).distinct()
            .groupBy(*keys, term_col)
            .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
            .filter(F.col("doc_count") <= int(max_doc_count)))


def boxplot_agg(df: DataFrame, value_col: str,
                keys: Sequence[str] | None = None, dp: int = 6) -> DataFrame:
    """ES ``boxplot`` agg, exact: min / q1 / q2 / q3 / max plus the IQR
    whisker fences (q1 - 1.5*IQR, q3 + 1.5*IQR, clamped to observed
    min/max, which is how ES draws them). ES approximates the quartiles
    with a TDigest; exact linear-interpolation percentiles are mergeable
    in Spark's percentile agg and cross-engine reproducible (DuckDB
    quantile_cont), so the gate compares values, not sketch internals.

    One group-keyed agg — every statistic rides the same two-phase pass.
    """
    keys = list(keys or [])
    v = F.col(value_col).cast("double")
    q = lambda p: F.percentile(v, F.lit(p))
    agg = df.groupBy(*keys).agg(
        F.count(v).cast("long").alias("n"),
        F.round(F.min(v), dp).alias("min"),
        F.round(q(0.25), dp).alias("q1"),
        F.round(q(0.5), dp).alias("q2"),
        F.round(q(0.75), dp).alias("q3"),
        F.round(F.max(v), dp).alias("max"))
    iqr = F.col("q3") - F.col("q1")
    return agg.select(
        *keys, "n", "min", "q1", "q2", "q3", "max",
        F.round(F.greatest(F.col("min"), F.col("q1") - 1.5 * iqr), dp)
         .alias("lower_fence"),
        F.round(F.least(F.col("max"), F.col("q3") + 1.5 * iqr), dp)
         .alias("upper_fence"))


def top_hits_agg(df: DataFrame, keys: Sequence[str], sort_col: str, n: int = 3,
                 id_col: str = "event_id", desc: bool = True) -> DataFrame:
    """ES ``top_hits`` sub-agg: the top-``n`` whole source rows per
    bucket, ordered by ``sort_col`` (``id_col`` ascending breaks ties so
    the result is deterministic — ES uses _shard/_doc order, which isn't).

    One ranking window per bucket; Catalyst rewrites rank<=n into
    WindowGroupLimit, so each partition retains n rows per bucket before
    the exchange — the agg never materializes whole buckets.
    """
    s = F.col(sort_col)
    w = Window.partitionBy(*keys).orderBy(
        s.desc() if desc else s.asc(), F.col(id_col).asc())
    return (df.withColumn("hit_rank", F.row_number().over(w))
            .filter(F.col("hit_rank") <= int(n)))


def multi_terms_agg(df: DataFrame, keys: Sequence[str], size: int = 10,
                    min_doc_count: int = 1) -> DataFrame:
    """ES ``multi_terms`` agg: composite-key buckets ordered by doc count
    (desc, then the key tuple asc as ES tie-breaks), top ``size``.

    NULL in any key drops the row (ES emits no bucket for missing
    values). The global top-size over bucket rows compiles to
    TakeOrderedAndProject when consumed with a limit — bucket cardinality
    is the product of the key cardinalities, already agg-sized.
    """
    keys = list(keys)
    out = df
    for k in keys:
        out = out.filter(F.col(k).isNotNull())
    out = (out.groupBy(*keys)
           .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
           .filter(F.col("doc_count") >= int(min_doc_count)))
    w = Window.orderBy(F.desc("doc_count"), *[F.asc(k) for k in keys])
    return (out.withColumn("bucket_rank", F.row_number().over(w))
            .filter(F.col("bucket_rank") <= int(size)))


def serial_diff_normalize(buckets: DataFrame, order_col: str, value_col: str,
                          keys: Sequence[str] = (), lag: int = 1,
                          dp: int = 6) -> DataFrame:
    """ES ``serial_diff`` + ``normalize`` pipeline aggs over a bucket
    relation: ``sdiff_<v>`` = value minus the value ``lag`` buckets back
    (NULL for each series' first ``lag`` buckets, like ES), and
    ``norm_<v>`` = rescale_0_1 within the series (ES normalize's default
    method; constant series → 0.0, matching ES's divide-guard).

    The diff rides one ordered window; the min/max for the rescale ride
    the SAME partitioning without an ordering (no second exchange — the
    planner reuses the hash partitioning and adds only the unsorted agg).
    Consumes buckets, never raw rows (coordinator-side shape).
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    w = Window.partitionBy(*keys).orderBy(order_col)
    wall = Window.partitionBy(*keys)
    v = F.col(value_col).cast("double")
    rng = F.max(v).over(wall) - F.min(v).over(wall)
    return buckets.select(
        *keys, order_col, value_col,
        (v - F.lag(v, lag).over(w)).alias(f"sdiff_{value_col}"),
        F.round(F.when(rng == 0, F.lit(0.0))
                 .otherwise((v - F.min(v).over(wall)) / rng), dp)
         .alias(f"norm_{value_col}"))


def date_histogram(df: DataFrame, ts_col: str, interval: str = "hour",
                   keys: Sequence[str] = (), value_col: str | None = None,
                   min_doc_count: int = 1,
                   extended_min: str | None = None,
                   extended_max: str | None = None) -> DataFrame:
    """ES ``date_histogram`` with ``min_doc_count`` and
    ``extended_bounds``: (keys..., bucket, doc_count[, value_sum]).

    With ``min_doc_count=0`` every calendar bucket in the covered span is
    emitted — including empty ones — and ``extended_bounds`` widens the
    span past the data (a dashboard's fixed time axis). The spine is a
    driver-side literal ``sequence(lo, hi, interval)`` (one row per
    bucket — thousands, never data-sized) cross-joined with the DISTINCT
    key tuples and left-joined onto the aggregated buckets, so raw data
    is scanned exactly once and the densification join touches only
    bucket-sized relations. With the ES-default ``min_doc_count=1`` (or
    higher) it is a plain filtered groupBy — no spine is built.

    ``extended_*`` accept ``'YYYY-MM-DD HH:MM:SS'`` strings; bounds are
    truncated to the interval like ES. Rows with NULL ``ts_col`` are
    dropped (ES routes them to ``missing``, not to a bucket)."""
    if interval not in _GRAIN_ORDER:
        raise ValueError(f"interval must be one of {_GRAIN_ORDER}")
    if min_doc_count < 0:
        raise ValueError("min_doc_count must be >= 0")
    keys = list(keys)
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    got = (df.filter(F.col(ts_col).isNotNull())
           .groupBy(*keys, bucket).agg(*aggs))
    if min_doc_count > 0:
        return got.filter(F.col("doc_count") >= min_doc_count)

    spark = df.sparkSession
    if extended_min and extended_max:
        span = {"_dlo": None, "_dhi": None}   # data span not needed
    else:
        span = (df.filter(F.col(ts_col).isNotNull())
                .agg(F.min(ts_col).alias("_dlo"),
                     F.max(ts_col).alias("_dhi")).collect()[0])
        if span["_dlo"] is None:
            raise ValueError(
                f"no non-null values in {ts_col!r} and no extended bounds")
    row = spark.range(1).select(
        F.date_trunc(interval,
                     F.lit(extended_min or span["_dlo"]).cast("timestamp"))
        .alias("lo"),
        F.date_trunc(interval,
                     F.lit(extended_max or span["_dhi"]).cast("timestamp"))
        .alias("hi"))
    spine = row.select(F.explode(F.sequence(
        F.col("lo"), F.col("hi"),
        F.expr(f"interval 1 {interval}"))).alias("bucket"))
    if keys:
        spine = spine.crossJoin(F.broadcast(got.select(*keys).distinct()))
    fill = [F.coalesce("doc_count", F.lit(0)).cast("long").alias("doc_count")]
    if value_col is not None:
        fill.append(F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"))
    return (spine.join(got, [*keys, "bucket"], "left")
            .select(*keys, "bucket", *fill))


#: auto_date_histogram interval ladder with UPPER-BOUND bucket seconds
#: (month = 31 d etc.) so the chosen interval GUARANTEES
#: bucket_count <= target, exactly like ES's rounding guarantee.
_AUTO_LADDER = [("second", 1), ("minute", 60), ("hour", 3600),
                ("day", 86400), ("week", 7 * 86400), ("month", 31 * 86400),
                ("quarter", 92 * 86400), ("year", 366 * 86400)]


def auto_date_histogram(df: DataFrame, ts_col: str,
                        target_buckets: int = 20,
                        keys: Sequence[str] = (),
                        value_col: str | None = None) -> DataFrame:
    """ES ``auto_date_histogram``: pick the SMALLEST calendar interval
    from the ladder whose bucket count cannot exceed ``target_buckets``
    over the data span, then run the plain ``date_histogram`` at it —
    (keys..., interval, bucket, doc_count[, value_sum]). Interval choice
    is one 1-row min/max agg + a driver-side ladder walk (ceil(span/sec)
    + 1 with upper-bound seconds per calendar unit, so the guarantee
    holds for every actual month/year length); the data is scanned once
    more for the aggregation itself — two passes total, like ES's
    coordinator reduce.
    """
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    span = (df.filter(F.col(ts_col).isNotNull())
            .agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"))
            .collect()[0])
    if span["lo"] is None:
        raise ValueError(f"no non-null values in {ts_col!r}")
    secs = (span["hi"] - span["lo"]).total_seconds()
    chosen = _AUTO_LADDER[-1][0]
    for name, unit in _AUTO_LADDER:
        if secs // unit + 1 <= target_buckets:
            chosen = name
            break
    out = date_histogram(df, ts_col, chosen, keys, value_col,
                         min_doc_count=1)
    return out.select(*keys, F.lit(chosen).alias("interval"), "bucket",
                      *[c for c in out.columns
                        if c not in (*keys, "bucket")])


def sibling_bucket_stats(buckets: DataFrame, value_col: str,
                         keys: Sequence[str] = ()) -> DataFrame:
    """ES sibling pipeline aggregations — ``avg_bucket`` / ``min_bucket``
    / ``max_bucket`` / ``sum_bucket`` / ``stats_bucket`` in one pass:
    per key tuple, the stats OF the sibling buckets' metric values
    (a second-level agg over the bucket relation, never the raw data) —
    (keys…, n_buckets, avg_b, min_b, max_b, sum_b). The whole ES
    sibling family is one groupBy over an already-aggregated relation;
    splitting them into five operators would be five names for one
    shuffle."""
    return (buckets.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.avg(value_col).alias("avg_b"),
        F.min(value_col).alias("min_b"),
        F.max(value_col).alias("max_b"),
        F.sum(value_col).alias("sum_b")))


def bucket_script(buckets: DataFrame, scripts: dict) -> DataFrame:
    """ES ``bucket_script`` pipeline aggregation: derive a per-bucket
    metric from the bucket's OTHER metrics — ``scripts`` maps new column
    name → a Column over the bucket row (e.g. error_rate =
    errors/total). Pure projection over the already-aggregated bucket
    relation (ES runs the script on the coordinator per bucket): zero
    shuffle, composes with ``bucket_selector``/``bucket_sort`` into the
    standard ES histogram post-processing chain."""
    if not scripts:
        raise ValueError("scripts must be non-empty")
    out = buckets
    for name, col in scripts.items():
        out = out.withColumn(name, col)
    return out


def bucket_selector(buckets: DataFrame, cond) -> DataFrame:
    """ES ``bucket_selector``: KEEP buckets where ``cond`` (a boolean
    Column over the bucket row, ES's script over bucket_path metrics)
    holds; NULL comparisons drop the bucket, matching ES's "skip" gap
    policy. A filter over buckets — runs after the aggregation, never
    touches raw rows."""
    return buckets.filter(cond)


def bucket_sort(buckets: DataFrame, sort_cols, size: int,
                keys: Sequence[str] = (), from_: int = 0) -> DataFrame:
    """ES ``bucket_sort``: order each series' buckets by ``sort_cols``
    (list of Columns, e.g. [F.desc("rate")]) and keep rows
    ``from_ < rn <= from_ + size`` — the truncating pagination step of a
    histogram response. One window over the BUCKET relation partitioned
    by ``keys`` (the enclosing terms-agg identity); WindowGroupLimit
    pushes the cap into the sort, so a million-series relation pays one
    exchange and no global sort."""
    if size < 1 or from_ < 0:
        raise ValueError("need size >= 1 and from_ >= 0")
    w = Window.partitionBy(*keys).orderBy(*sort_cols)
    return (buckets.withColumn("_bs_rn", F.row_number().over(w))
            .filter((F.col("_bs_rn") > from_) &
                    (F.col("_bs_rn") <= from_ + size))
            .drop("_bs_rn"))


def rate_agg(df: DataFrame, ts_col: str, bucket_interval: str,
             rate_unit: str, value_col: str | None = None,
             keys: Sequence[str] = (), dp: int = 6) -> DataFrame:
    """ES ``rate`` aggregation inside a date_histogram: per bucket,
    the doc count (or ``value_col`` sum) RESCALED from the histogram
    interval to ``rate_unit`` — e.g. day buckets reported as per-hour
    rates divide by 24. ES requires rate_unit <= bucket_interval; same
    validation here. One two-phase agg over raw (map-side combine), the
    rescale is a constant multiply on the bucket relation.

    Returns (keys…, bucket, n_docs, rate) with rate = metric ·
    unit/interval, rounded to ``dp``.
    """
    seconds = {"minute": 60, "hour": 3600, "day": 86400}
    if bucket_interval not in seconds or rate_unit not in seconds:
        raise ValueError(f"interval/unit must be one of {sorted(seconds)}")
    if seconds[rate_unit] > seconds[bucket_interval]:
        raise ValueError("rate_unit must not exceed bucket_interval")
    factor = seconds[rate_unit] / seconds[bucket_interval]
    metric = (F.count(F.lit(1)).cast("double") if value_col is None
              else F.sum(F.col(value_col).cast("double")))
    return (df.groupBy(*keys,
                       F.date_trunc(bucket_interval, F.col(ts_col))
                       .alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.round(metric * F.lit(factor), dp).alias("rate")))


def date_range_agg(df: DataFrame, ts_col: str, ranges,
                   keys: Sequence[str] = ()) -> DataFrame:
    """ES ``date_range`` aggregation: explicit half-open timestamp
    buckets ``from <= ts < to`` (NULL bound = unbounded, ranges may
    overlap — a row lands in EVERY containing bucket), empty ranges
    return n_docs = 0. Same physical shape as ``range_agg``: the tiny
    literal range list explodes against each row (map-side, one scan),
    empty buckets restored by a broadcast left join from the literals.
    Returns (range_key, from_ts, to_ts, n_docs) — plus per-``keys``
    splits when given (then empty (key, range) pairs are NOT padded;
    ES nests the terms agg inside each range instead)."""
    rs = [(str(k), lo, hi) for k, lo, hi in ranges]
    if not rs or len({k for k, _, _ in rs}) != len(rs):
        raise ValueError("need non-empty ranges with unique keys")
    rlit = F.explode(F.array(*[
        F.struct(F.lit(k).alias("range_key"),
                 F.lit(lo).cast("timestamp").alias("from_ts"),
                 F.lit(hi).cast("timestamp").alias("to_ts"))
        for k, lo, hi in rs])).alias("r")
    t = F.col(ts_col).cast("timestamp")
    hits = (df.filter(t.isNotNull())
            .select(*keys, t.alias("_t"), rlit)
            .select(*keys, "_t", "r.range_key", "r.from_ts", "r.to_ts")
            .filter((F.col("from_ts").isNull() | (F.col("_t") >= F.col("from_ts")))
                    & (F.col("to_ts").isNull() | (F.col("_t") < F.col("to_ts")))))
    agg = (hits.groupBy(*keys, "range_key")
           .agg(F.count("*").cast("long").alias("n_docs")))
    rdf = (df.sparkSession.createDataFrame(
        [(k, lo, hi) for k, lo, hi in rs],
        "range_key string, from_ts string, to_ts string")
        .select("range_key",
                F.col("from_ts").cast("timestamp").alias("from_ts"),
                F.col("to_ts").cast("timestamp").alias("to_ts")))
    if keys:
        return agg.join(F.broadcast(rdf), "range_key").select(
            *keys, "range_key", "from_ts", "to_ts", "n_docs")
    return (rdf.join(F.broadcast(agg), "range_key", "left")
            .select("range_key", "from_ts", "to_ts",
                    F.coalesce("n_docs", F.lit(0)).cast("long")
                    .alias("n_docs")))


def filters_agg(df: DataFrame, filters: dict, other_bucket: bool = False,
                other_key: str = "_other_") -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per filter (a boolean
    Column), a document counted in EVERY bucket whose filter it matches;
    ``other_bucket=True`` adds a bucket counting docs matching NO filter
    (ES ``other_bucket_key``). Returns (filter_key, n_docs), empty
    buckets included with 0.

    One scan: every filter evaluates in a single projection as 0/1 ints,
    one global sum-agg — never one pass (or one job) per filter.
    """
    if not filters:
        raise ValueError("filters must be non-empty")
    if other_key in filters:
        raise ValueError("other_key collides with a filter name")
    names = list(filters)
    sums = [F.sum(F.when(filters[n], 1).otherwise(0)).cast("long")
            .alias(n) for n in names]
    if other_bucket:
        none_match = filters[names[0]]
        for n in names[1:]:
            none_match = none_match | filters[n]
        sums.append(F.sum(F.when(~F.coalesce(none_match, F.lit(False)),
                                 1).otherwise(0))
                    .cast("long").alias(other_key))
        names = names + [other_key]
    row = df.agg(*sums)
    # one wide row -> long (filter_key, n_docs): a names-sized literal stack
    pairs = F.explode(F.array(*[
        F.struct(F.lit(n).alias("filter_key"), F.col(n).alias("n_docs"))
        for n in names])).alias("p")
    return row.select(pairs).select("p.filter_key", "p.n_docs")


def moving_percentiles(df: DataFrame, ts_col: str, value_col: str,
                       interval: str, window: int, qs,
                       lo: float, hi: float, n_bins: int = 32,
                       keys: Sequence[str] = ()) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: per date-histogram
    bucket, percentiles of the trailing ``window`` buckets (inclusive),
    computed by MERGING per-bucket histogram sketches — the reason ES
    requires the inner agg to be a combinable percentiles sketch. Here
    the sketch is the deterministic fixed-grid histogram
    (operators/sketch.histogram_sketch): counters are linear, so the
    trailing merge is a window SUM per (keys, bin) over a DENSE bucket
    spine (empty buckets contribute zeros, never silently skew the
    window), and the estimate is the same closed-form interpolation as
    ``histogram_quantiles`` — bit-identical across partitionings and
    engines.

    Returns (keys…, bucket, q, est), est NULL when the trailing window
    is empty (ES skips those buckets; NULL keeps the spine visible).

    Plan: one narrow scan builds (keys, bucket, bin) counts (shuffle
    cardinality = |keys|·|buckets|·n_bins, never row count); the spine ×
    bin grid is bucket-relation-sized; one window over bins × one over
    the cumulative — nothing scales with raw rows.
    """
    iv = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}
    if interval not in iv:
        raise ValueError(f"interval must be one of {sorted(iv)}")
    if window < 1:
        raise ValueError("window must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    if not all(0.0 <= float(q) <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    gb = list(keys)
    wdt = (float(hi) - float(lo)) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(F.lit(n_bins - 1),
                F.greatest(F.lit(0),
                           F.floor((v - F.lit(float(lo))) / F.lit(wdt))
                           .cast("int"))).cast("int")
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    cnts = (df.where(v.isNotNull())
            .groupBy(*gb, bucket, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    # dense bucket spine per key group (min..max of the group's buckets)
    spine = (df.groupBy(*gb)
             .agg(F.date_trunc(interval, F.min(ts_col)).alias("_mn"),
                  F.date_trunc(interval, F.max(ts_col)).alias("_mx"))
             .select(*gb, F.explode(F.expr(
                 f"sequence(_mn, _mx, interval {iv[interval]})"))
                 .alias("bucket")))
    bins = df.sparkSession.createDataFrame(
        [(i,) for i in range(n_bins)], "bin int")
    grid = spine.crossJoin(F.broadcast(bins))
    dense = (grid.join(cnts, gb + ["bucket", "bin"], "left")
             .select(*gb, "bucket", "bin",
                     F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")))
    wmov = Window.partitionBy(*gb, "bin").orderBy("bucket") \
        .rowsBetween(-(window - 1), 0)
    merged = dense.withColumn("mcnt", F.sum("cnt").over(wmov))
    wcum = Window.partitionBy(*gb, "bucket").orderBy("bin")
    cum = (merged
           .withColumn("cum", F.sum("mcnt").over(wcum))
           .withColumn("cumb", F.col("cum") - F.col("mcnt")))
    wtot = Window.partitionBy(*gb, "bucket")
    cum = cum.withColumn("n", F.sum("mcnt").over(wtot))
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(set(float(q) for q in qs))],
        "q double")
    probe = (cum.crossJoin(F.broadcast(qdf))
             .withColumn("target", F.col("q") * F.col("n"))
             .filter((F.col("n") == 0) |
                     ((F.col("cum") >= F.col("target")) & (F.col("mcnt") > 0))))
    est = (F.lit(float(lo)) + F.lit(wdt) *
           (F.col("bin") +
            F.when(F.col("q") == 0.0, F.lit(0.0))
            .otherwise((F.col("target") - F.col("cumb")) / F.col("mcnt"))))
    rw = Window.partitionBy(*gb, "bucket", "q").orderBy("bin")
    return (probe.withColumn("_rn", F.row_number().over(rw))
            .filter(F.col("_rn") == 1)
            .select(*gb, "bucket", "q",
                    F.when(F.col("n") > 0, est).alias("est")))


def seasonal_anomalies(df: DataFrame, ts_col: str,
                       keys: Sequence[str] = (), dp: int = 6) -> DataFrame:
    """Seasonal-baseline anomaly scores over an hourly histogram: each
    (keys, hour) bucket is compared to the mean/stddev of SAME-HOUR-OF-
    DAY buckets in its series — the "is this hour unusual for a 3am?"
    check behind alerting on periodic traffic. Returns
    (keys…, bucket, n, hod, z) for every bucket (z = 0 where the
    seasonal stddev is 0; thresholding is the caller's policy — emitting
    scores instead of a filtered set keeps the relation ulp-stable
    across engines).

    Two aggs over the BUCKET relation (one builds buckets from raw, one
    derives per-(keys, hour-of-day) moments — 24·|keys| rows); the join
    back broadcasts. Nothing scales with raw rows beyond the first agg.
    """
    gb = list(keys)
    b = (df.groupBy(*gb, F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    b = b.withColumn("hod", F.hour("bucket").cast("int"))
    mom = (b.groupBy(*gb, "hod")
           .agg(F.avg("n").alias("mu"),
                F.stddev_samp(F.col("n").cast("double")).alias("sd")))
    z = F.when(F.coalesce(F.col("sd"), F.lit(0.0)) > 0,
               (F.col("n") - F.col("mu")) / F.col("sd")).otherwise(F.lit(0.0))
    return (b.join(F.broadcast(mom), gb + ["hod"])
            .select(*gb, "bucket", "n", "hod", F.round(z, dp).alias("z")))


def ewma_smooth(buckets: DataFrame, order_col: str, value_col: str,
                alpha: float = 0.3, keys: Sequence[str] = (),
                dp: int = 6) -> DataFrame:
    """ES ``moving_fn`` ewma over a bucket series: s₁ = y₁,
    sₜ = α·yₜ + (1−α)·sₜ₋₁ — evaluated in CLOSED FORM,

        sₜ = Σ_{i=2..t} α(1−α)^{t−i} yᵢ + (1−α)^{t−1} y₁

    so there is no sequential recursion to distribute: one rank window
    per series plus a triangular self-join over the BUCKET relation
    (t(t+1)/2 pairs per series — bucket-sized, never raw-sized; a decade
    of hourly buckets is ~87k rows, ~4e9 pairs is the worst case where
    you'd truncate the tail: weights below ~1e-12 of the current value
    contribute nothing, so a ``max_lag`` cap of log(ε)/log(1−α) buckets
    is exact to machine precision).

    Returns (keys…, order_col, value, ewma).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    gb = list(keys)
    w = Window.partitionBy(*gb).orderBy(order_col)
    r = buckets.select(*gb, F.col(order_col),
                       F.col(value_col).cast("double").alias("_y")) \
        .withColumn("_r", F.row_number().over(w))
    a = r.select(*gb, F.col(order_col), F.col("_y").alias("_ya"),
                 F.col("_r").alias("_ra"))
    bb = r.select(*([F.col(c).alias(f"_k{i}") for i, c in enumerate(gb)]
                    + [F.col("_y").alias("_yb"), F.col("_r").alias("_rb")]))
    cond = [a[c] == bb[f"_k{i}"] for i, c in enumerate(gb)]
    pairs = a.join(bb, cond + [bb["_rb"] <= a["_ra"]] if cond else
                   [bb["_rb"] <= a["_ra"]])
    weight = F.when(F.col("_rb") == 1,
                    F.pow(F.lit(1.0 - alpha), F.col("_ra") - 1)) \
        .otherwise(F.lit(alpha) *
                   F.pow(F.lit(1.0 - alpha), F.col("_ra") - F.col("_rb")))
    return (pairs.groupBy(*gb, order_col)
            .agg(F.first("_ya").alias("value"),
                 F.round(F.sum(F.col("_yb") * weight), dp).alias("ewma"))
            .select(*gb, order_col, "value", "ewma"))


def cohort_retention(df: DataFrame, ts_col: str, user_col: str,
                     interval: str = "day") -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-seen bucket
    (the cohort), counted distinct at each later offset —
    (cohort, bucket_offset, n_users). The product-analytics staple ("of users
    who arrived Jan 3, how many were back 7 days later?").

    Two aggs: per-user first bucket (|users| rows), then distinct users
    per (cohort, offset). The first-bucket relation joins back on the
    user key — the natural shuffle key, skew-free unless one user id
    dominates the event stream. Integer counts: exact cross-engine.
    """
    sec = {"day": 86400, "hour": 3600}
    if interval not in sec:
        raise ValueError(f"interval must be one of {sorted(sec)}")
    b = F.date_trunc(interval, F.col(ts_col))
    ev = df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()) \
        .select(F.col(user_col).alias("_u"), b.alias("_b"))
    first = ev.groupBy("_u").agg(F.min("_b").alias("cohort"))
    joined = ev.join(first, "_u")
    offset = ((F.unix_timestamp("_b") - F.unix_timestamp("cohort"))
              / F.lit(sec[interval])).cast("long")
    return (joined.select("_u", "cohort", offset.alias("bucket_offset"))
            .groupBy("cohort", "bucket_offset")
            .agg(F.count_distinct("_u").cast("long").alias("n_users")))


def numeric_histogram(df: DataFrame, value_col: str, interval: float,
                      offset: float = 0.0, min_doc_count: int = 1,
                      dp: int = 6) -> DataFrame:
    """ES ``histogram`` aggregation over a numeric field: bucket key =
    ⌊(v − offset)/interval⌋·interval + offset, with ES's
    ``min_doc_count=0`` semantics — the bucket spine densifies between
    the observed min and max key so empty buckets surface explicitly
    (a sequence between two scalars; spine-sized, never data-sized).
    Returns (key, n_docs, sum_value).
    """
    if interval <= 0:
        raise ValueError("interval must be > 0")
    if min_doc_count not in (0, 1):
        raise ValueError("min_doc_count must be 0 or 1")
    v = F.col(value_col).cast("double")
    # Bucket identity is the integer step index; the double key is
    # derived from it only for display. Joining spine→agg on a
    # recomputed double key loses buckets to 1-ulp drift when interval
    # is not binary-representable (e.g. 0.1).
    idx = (F.floor((v - F.lit(float(offset))) / F.lit(float(interval)))
           .cast("long"))
    keyof = lambda c: (c.cast("double") * F.lit(float(interval))
                       + F.lit(float(offset)))
    agg = (df.where(v.isNotNull())
           .groupBy(idx.alias("_idx"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.round(F.sum(v), dp).alias("sum_value")))
    if min_doc_count == 1:
        return agg.select(keyof(F.col("_idx")).alias("key"),
                          "n_docs", "sum_value")
    # dense spine: every integer step between the observed extremes.
    bounds = agg.agg(F.min("_idx").alias("_mn"), F.max("_idx").alias("_mx"))
    spine = (bounds.select(F.explode(
        F.sequence(F.col("_mn"), F.col("_mx"))).alias("_idx")))
    return (spine.join(agg, "_idx", "left")
            .select(keyof(F.col("_idx")).alias("key"),
                    F.coalesce("n_docs", F.lit(0)).cast("long")
                    .alias("n_docs"),
                    F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")))


def ks_test_two_sample(df: DataFrame, value_col: str, group_col,
                       dp: int = 6) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (the ES
    ``bucket_count_ks_test`` pipeline agg's underlying test, here exact
    over raw values): D = sup_x |F̂_a(x) − F̂_b(x)| between the empirical
    CDFs of the two groups selected by the boolean column/expression
    ``group_col``, plus the location where the supremum is attained
    (lowest such value on ties). Returns ONE row
    (d_stat, at_value, n_a, n_b).

    Shape: one DISTRIBUTED groupBy collapses the samples to per-distinct-
    value counts (ties absorbed — the classic right-continuous CDF), then
    the running sums ride one ordered window over that distinct-value
    relation only. For continuous columns whose distinct-value count is
    itself data-sized, pre-bin upstream (the ES agg operates on bucket
    counts for the same reason). The final argmax is a 1-row agg. NULLs
    are excluded (both engines).
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    v = F.col(value_col).cast("double")
    base = (df.where(v.isNotNull() & g.isNotNull())
            .select(v.alias("_v"), g.cast("boolean").alias("_a")))
    cnt = base.groupBy("_v").agg(
        F.sum(F.col("_a").cast("int")).alias("_na"),
        F.sum((~F.col("_a")).cast("int")).alias("_nb"))
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    cum = (cnt.withColumn("_ca", F.sum("_na").over(w))
           .withColumn("_cb", F.sum("_nb").over(w)))
    tot = cnt.agg(
        F.sum("_na").cast("long").alias("n_a"),
        F.sum("_nb").cast("long").alias("n_b"))
    d = (cum.crossJoin(F.broadcast(tot))
         .select("_v", "n_a", "n_b",
                 F.abs(F.col("_ca") / F.col("n_a") -
                       F.col("_cb") / F.col("n_b")).alias("_d")))
    top = (d.withColumn("_rn", F.row_number().over(
        Window.orderBy(F.desc("_d"), F.asc("_v"))))
        .filter(F.col("_rn") == 1))
    return top.select(F.round("_d", dp).alias("d_stat"),
                      F.col("_v").alias("at_value"), "n_a", "n_b")


def percentiles_bucket(buckets: DataFrame, value_col: str,
                       percents: Sequence[float],
                       keys: Sequence[str] = (), dp: int = 6) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline agg: exact
    linear-interpolation percentiles of a metric ACROSS its sibling
    buckets (e.g. "p99 of daily event counts"), one output row per
    (keys…, percent). Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the interpolation rule, so the gate is
    value-exact cross-engine. Consumes the bucket relation, never raw
    rows — coordinator-sized, like every sibling agg.
    """
    ps = [float(p) for p in percents]
    if not ps or any(not 0.0 <= p <= 100.0 for p in ps):
        raise ValueError("percents must be within [0, 100]")
    gb = list(keys)
    v = F.col(value_col).cast("double")
    agg = buckets.groupBy(*gb).agg(
        *[F.round(F.percentile(v, F.lit(p / 100.0)), dp)
          .alias(f"_p{i}") for i, p in enumerate(ps)])
    pairs = F.array(*[
        F.struct(F.lit(p).alias("percent"), F.col(f"_p{i}").alias("value"))
        for i, p in enumerate(ps)])
    return (agg.select(*gb, F.explode(pairs).alias("_e"))
            .select(*gb, F.col("_e.percent").alias("percent"),
                    F.col("_e.value").alias("value")))


def linear_weighted_mavg(buckets: DataFrame, order_col: str, value_col: str,
                         keys: Sequence[str] = (), window: int = 5,
                         dp: int = 6) -> DataFrame:
    """ES ``moving_fn`` with ``MovingFunctions.linearWeightedAvg``: a
    trailing moving average whose weights rise linearly toward the
    current bucket (oldest in the window weighs 1, newest weighs m for a
    window holding m ≤ ``window`` buckets; partial head windows use
    their actual size, like ES). Returns the bucket relation plus
    ``lwa_<value_col>``.

    No per-row lists: with rn = the bucket's rank in its series,
    Σ weights·x over the window = Σ rn·x − (rn_t − m)·Σ x — two trailing
    window sums and one row_number, identical expressions in the SQL
    oracle. Integer-valued buckets keep the sums exact.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    gb = list(keys)
    wo = Window.partitionBy(*gb).orderBy(order_col)
    wt = wo.rowsBetween(-(window - 1), 0)
    v = F.col(value_col).cast("double")
    rn = F.row_number().over(wo)
    m = F.count(F.lit(1)).over(wt)
    num = (F.sum(rn * v).over(wt) -
           (rn - m).cast("double") * F.sum(v).over(wt))
    den = (m * (m + 1) / 2).cast("double")
    return buckets.withColumn(
        f"lwa_{value_col}", F.round(num / den, dp))

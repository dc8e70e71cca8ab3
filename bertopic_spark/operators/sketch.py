"""Distributed frequency sketches.

A count-min sketch (Cormode & Muthukrishnan 2005) as a long-form relation
(row, bucket, cnt): the streaming/mergeable answer to "how often is term t"
when the exact vocabulary-size aggregation is too wide to keep. Hashing is
md5-derived (same idiom as the engine's other seeded randomness) so the
sketch is bit-identical across engines, partitionings and cluster sizes —
and the DuckDB oracle replays it exactly.

Physical shape: build = one tokenize pass, one groupBy((row, bucket))
whose cardinality is depth×width REGARDLESS of vocabulary size (the whole
point — the shuffle never carries the vocabulary); merge = unionByName +
the same groupBy (counters are linear); query = a broadcast probe of
|terms|×depth rows, never a scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import with_tokens


def _bucket(term, row: int, width: int, seed: int):
    h = F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.lit(row), term)), 1, 15),
        16, 10).cast("long")
    return h % width


def cms_build(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              mode: str = "ascii_code", depth: int = 4, width: int = 1024,
              seed: int = 42) -> DataFrame:
    """Count-min sketch of term occurrences: (row, bucket, cnt).

    depth×width rows total — the reduction from |vocab| to a fixed grid is
    what makes the sketch shippable (broadcastable serving state) at any
    corpus size.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    terms = toks.select(F.explode("tokens").alias("term"))
    rows = [terms.select(F.lit(r).alias("row"),
                         _bucket(F.col("term"), r, width, seed).alias("bucket"))
            for r in range(depth)]
    from functools import reduce
    return (reduce(DataFrame.unionByName, rows)
            .groupBy("row", "bucket")
            .agg(F.count("*").cast("long").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width, seed): counters
    are linear, so merge = union + re-sum. This is the property that lets
    per-partition / per-day sketches roll up without touching raw data."""
    from functools import reduce
    if not sketches:
        raise ValueError("need at least one sketch")
    return (reduce(DataFrame.unionByName, sketches)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def cms_estimate(sketch: DataFrame, terms: Sequence[str],
                 depth: int = 4, width: int = 1024,
                 seed: int = 42) -> DataFrame:
    """Point estimates for ``terms``: (term, est) with est ≥ true count
    (classic CMS one-sided error). The probe is a |terms|×depth broadcast
    joined to the sketch — no scan of anything corpus-sized."""
    ts = sorted(set(str(t) for t in terms))
    if not ts:
        raise ValueError("need at least one probe term")
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(t, r) for t in ts for r in range(depth)], "term string, row int")
    h = F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col("row"), F.col("term"))),
        1, 15), 16, 10).cast("long")
    probe = probe.select("term", "row", (h % width).alias("bucket"))
    hit = (sketch.join(F.broadcast(probe), ["row", "bucket"])
           .groupBy("term", "row").agg(F.max("cnt").alias("c")))
    # a missing counter row means 0 — left join from the probe grid
    grid = probe.select("term", "row").distinct()
    per_row = (grid.join(hit, ["term", "row"], "left")
               .select("term", F.coalesce("c", F.lit(0)).alias("c")))
    return per_row.groupBy("term").agg(F.min("c").cast("long").alias("est"))


def bloom_build(df: DataFrame, col: str = "term", k_hashes: int = 4,
                n_bits: int = 1 << 16, seed: int = 42) -> DataFrame:
    """Bloom filter over the distinct values of ``col``: (bit) — the set
    bit positions, at most min(k·|values|, n_bits) rows.

    The distributed membership primitive (e.g. ship a benchmark shingle
    set to every executor without shipping the shingles): k md5-derived
    positions per value, distinct. Build shuffles ≤ n_bits rows; the
    relation broadcasts when n_bits is sized to the expected set.
    """
    if k_hashes < 1 or n_bits < 1:
        raise ValueError("k_hashes and n_bits must be >= 1")
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    rows = [vals.select(_bucket(F.col("v"), r, n_bits, seed).alias("bit"))
            for r in range(k_hashes)]
    from functools import reduce
    return reduce(DataFrame.unionByName, rows).distinct()


def bloom_contains(bloom: DataFrame, probe: DataFrame, col: str,
                   k_hashes: int = 4, n_bits: int = 1 << 16,
                   seed: int = 42) -> DataFrame:
    """Membership verdicts for ``probe[col]``: (value, maybe) — ``maybe``
    is True iff ALL k bit positions are set (no false negatives; false
    positives at the classic Bloom rate for the chosen n_bits).

    The bloom relation broadcasts; the probe side streams — membership
    against a billion-shingle set without a shuffle of either."""
    if k_hashes < 1 or n_bits < 1:
        raise ValueError("k_hashes and n_bits must be >= 1")
    p = probe.select(F.col(col).alias("value")).where(
        F.col("value").isNotNull()).distinct()
    from functools import reduce
    probe_bits = reduce(DataFrame.unionByName, [
        p.select("value", F.lit(r).alias("r"),
                 _bucket(F.col("value"), r, n_bits, seed).alias("bit"))
        for r in range(k_hashes)])
    hit = (probe_bits.join(F.broadcast(bloom.withColumn("_set", F.lit(1))),
                           "bit", "left")
           .groupBy("value")
           .agg((F.count(F.when(F.col("_set").isNotNull(), 1))
                 == F.countDistinct("r")).alias("maybe")))
    return hit


_HLL_BITS = 60  # md5-derived hash width (15 hex digits)


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = 12,
                  seed: int = 42) -> DataFrame:
    """HyperLogLog registers over ``df[col]``: (idx, rho) — m=2^p rows max.

    Flajolet et al. 2007 with md5-derived hashing, so the registers (and
    therefore the estimate) are bit-identical across engines, partitions
    and cluster sizes — unlike ``approx_count_distinct``, whose HLL++ is
    not reproducible outside Spark. Register index = low p bits' modulus,
    rho = leading-zero run of the remaining 60−p bits + 1 (computed from
    the binary-string length — pure integer math, no float log). One
    groupBy of at most 2^p keys regardless of cardinality; registers merge
    by max (tested).
    """
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    h = F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(col))), 1, 15),
        16, 10).cast("long")
    idx = h % m
    w = F.floor(h / m).cast("long")
    rho = F.when(w > 0, F.lit(_HLL_BITS - p + 1) - F.length(F.bin(w))
                 ).otherwise(F.lit(_HLL_BITS - p + 1)).cast("int")
    return (df.where(F.col(col).isNotNull())
            .select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("rho")))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """Cardinality estimate from a register relation: one row (est).

    Raw estimate α_m·m²/Σ2^(−rho) with the standard small-range linear-
    counting correction (absent registers count as rho=0). Same float
    arithmetic on both engines — the DuckDB oracle reproduces the estimate
    exactly, not just approximately.
    """
    m = 1 << p
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count("*").alias("nz"))
    est = agg.select(
        (F.lit(_hll_alpha(m) * m * m)
         / (F.col("s") + (F.lit(m) - F.col("nz")))).alias("raw"),
        (F.lit(m) - F.col("nz")).alias("zeros"))
    return est.select(
        F.when((F.col("raw") <= 2.5 * m) & (F.col("zeros") > 0),
               F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
               ).otherwise(F.col("raw")).alias("est"))


def histogram_sketch(df: DataFrame, value_col: str,
                     lo: float, hi: float, n_bins: int = 64,
                     group_cols: Sequence[str] = ()) -> DataFrame:
    """Fixed-grid equi-width histogram sketch — the engine's mergeable
    quantile structure (the t-digest role, with the determinism the
    CMS/Bloom/HLL family already guarantees): (group…, bin, cnt) with
    bin = clamp(floor((v − lo)/w), 0, n_bins−1), w = (hi − lo)/n_bins.

    Counters are linear, so merging sketches from different partitions,
    days or clusters is ``histogram_merge`` (union + re-sum) and the
    result is BIT-IDENTICAL regardless of data order, partitioning or
    cluster size — the property approximate quantile sketches with
    data-dependent centroids (t-digest, GK) give up. Accuracy is a fixed
    ±w/2; choose the grid from the column's contract, not the data.

    Build = one narrow projection + one groupBy whose cardinality is
    |groups|·n_bins regardless of row count — the shuffle never carries
    values. NULLs are dropped (they have no quantile).
    """
    if not n_bins >= 1:
        raise ValueError("n_bins must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    w = (float(hi) - float(lo)) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(F.lit(n_bins - 1),
                F.greatest(F.lit(0),
                           F.floor((v - F.lit(float(lo))) / F.lit(w))
                           .cast("int"))).cast("int")
    return (df.where(v.isNotNull())
            .groupBy(*group_cols, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histogram sketches built on the SAME grid: union + re-sum."""
    from functools import reduce as _reduce

    u = _reduce(DataFrame.unionByName, sketches)
    keys = [c for c in u.columns if c not in ("cnt",)]
    return u.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(sketch: DataFrame, qs: Sequence[float],
                        lo: float, hi: float, n_bins: int = 64,
                        group_cols: Sequence[str] = ()) -> DataFrame:
    """Quantile estimates from a histogram sketch: (group…, q, est) with
    est = lo + w·(bin + (target − cum_before)/cnt), target = q·N — linear
    interpolation inside the first bin whose cumulative count reaches the
    target (q=0 → the left edge of the first occupied bin). Closed-form
    arithmetic over integer counts, so Spark and the SQL oracle agree to
    the last ulp.

    Plan: the cumulative window runs over ≤ n_bins rows per group (the
    sketch is grid-sized, not data-sized); the quantile probe is a
    broadcast of |qs| literals. Nothing here scales with the raw data.
    """
    if not all(0.0 <= float(q) <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / n_bins
    gb = list(group_cols)
    win = Window.partitionBy(*gb).orderBy("bin") if gb else \
        Window.partitionBy().orderBy("bin")
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(win))
           .withColumn("cumb", F.col("cum") - F.col("cnt")))
    tot = sketch.groupBy(*gb).agg(F.sum("cnt").alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(qs)], "q double")
    probe = (cum.join(tot, gb) if gb else cum.crossJoin(F.broadcast(tot))) \
        .crossJoin(F.broadcast(qdf)) \
        .withColumn("target", F.col("q") * F.col("n")) \
        .filter(F.col("cum") >= F.col("target"))
    rw = Window.partitionBy(*gb, "q").orderBy("bin")
    est = (F.lit(float(lo)) + F.lit(w) *
           (F.col("bin") +
            F.when(F.col("q") == 0.0, F.lit(0.0))
            .otherwise((F.col("target") - F.col("cumb")) / F.col("cnt"))))
    return (probe.withColumn("_rn", F.row_number().over(rw))
            .filter(F.col("_rn") == 1)
            .select(*gb, "q", est.alias("est")))


def histogram_percentile_rank(sketch: DataFrame, values: Sequence[float],
                              lo: float, hi: float, n_bins: int = 64,
                              group_cols: Sequence[str] = ()) -> DataFrame:
    """Inverse quantile from a histogram sketch: (group…, v, pct) with
    pct = (cum_before(bin(v)) + frac(v)·cnt(bin(v))) / N — the estimated
    fraction of mass ≤ v under the within-bin-uniform assumption (the ES
    percentile_ranks aggregation). Probes are |values| literals broadcast
    onto the grid-sized sketch; closed-form over integer counts, so the
    SQL oracle reproduces it exactly. Values outside [lo, hi) clamp to
    0/1 mass via the same bin clamping as the build.
    """
    from pyspark.sql import Window

    w = (float(hi) - float(lo)) / n_bins
    gb = list(group_cols)
    win = Window.partitionBy(*gb).orderBy("bin") if gb else \
        Window.partitionBy().orderBy("bin")
    cum = (sketch
           .withColumn("cum", F.sum("cnt").over(win))
           .withColumn("cumb", F.col("cum") - F.col("cnt")))
    tot = sketch.groupBy(*gb).agg(F.sum("cnt").alias("n"))
    vdf = sketch.sparkSession.createDataFrame(
        [(float(v),) for v in sorted(values)], "v double")
    vb = F.least(F.lit(n_bins - 1),
                 F.greatest(F.lit(0),
                            F.floor((F.col("v") - F.lit(float(lo)))
                                    / F.lit(w)).cast("int"))).cast("int")
    frac = F.least(F.lit(1.0), F.greatest(
        F.lit(0.0),
        (F.col("v") - (F.lit(float(lo)) + F.col("bin") * F.lit(w)))
        / F.lit(w)))
    probe = (cum.crossJoin(F.broadcast(vdf.withColumn("vbin", vb)))
             .filter(F.col("bin") <= F.col("vbin")))
    rw = Window.partitionBy(*gb, "v").orderBy(F.desc("bin"))
    last = (probe.withColumn("_rn", F.row_number().over(rw))
            .filter(F.col("_rn") == 1))
    mass = (F.col("cumb") +
            F.when(F.col("bin") == F.col("vbin"), frac)
            .otherwise(F.lit(1.0)) * F.col("cnt"))
    last = last.select(*gb, "v", mass.alias("_mass"))
    # a value below the group's first occupied bin has zero mass ≤ v: keep
    # the (group, v) row with pct 0 instead of dropping it
    grid = tot.crossJoin(F.broadcast(vdf.select("v")))
    return (grid.join(last, [*gb, "v"], "left")
            .select(*gb, "v",
                    (F.coalesce(F.col("_mass"), F.lit(0.0)) / F.col("n"))
                    .alias("pct")))


# ---------------------------------------------------------------------------
# KMV / theta sketches — distinct counting WITH set algebra
# ---------------------------------------------------------------------------

def _kmv_u(col, seed: int):
    """md5-derived uniform in [0,1) of a VALUE (not an id): first 15 hex
    digits / 16^15 — the engine's standard cross-engine uniform."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), col.cast("string"))), 1, 15),
        16, 10).cast("double") / F.lit(float(16 ** 15)))


def kmv_sketch(df: DataFrame, col: str, k: int = 256,
               key_cols: Sequence[str] = (), seed: int = 42,
               n_salts: int = 64) -> DataFrame:
    """KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al. 2016,
    the DataSketches theta family): per key, the ``k`` smallest md5-hash
    values of the distinct ``col`` values — a fixed-size summary that
    answers distinct-count AND set-algebra (union/intersect/difference)
    questions the HLL registers cannot.

    Returns (key…, h double, rank int), rank 1..≤k ascending by h.

    Physical shape: one distinct shuffle over (key, h), then a two-level
    bottom-k — a per-(key, salt) window prunes each branch to k rows in
    parallel BEFORE the final per-key window, so a keyless (global) sketch
    of a billion-value set never funnels the full distinct relation
    through one task; the final window sees ≤ n_salts·k rows per key.
    The salt prune is semantically a no-op (bottom-k of bottom-ks), so the
    SQL oracle replays the sketch with one plain row_number.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError("k must be >= 2")
    gb = list(key_cols)
    dist = (df.select(*gb, _kmv_u(F.col(col), seed).alias("h"))
            .filter(F.col("h").isNotNull()).distinct())
    salt = F.pmod(F.xxhash64(F.col("h")), F.lit(int(n_salts)))
    w1 = Window.partitionBy(*gb, "_salt").orderBy("h")
    pruned = (dist.withColumn("_salt", salt)
              .withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= k).drop("_r1", "_salt"))
    w2 = Window.partitionBy(*gb).orderBy("h")
    return (pruned.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k))


def kmv_merge(*sketches: DataFrame, k: int = 256,
              key_cols: Sequence[str] = ()) -> DataFrame:
    """Union sketches: the k smallest distinct hashes of the union —
    merge(build(A), build(B)) == build(A ∪ B) exactly (pytest-proved).
    Input relations are ≤ k rows per key, so this is window-over-tiny."""
    from functools import reduce

    from pyspark.sql import Window

    gb = list(key_cols)
    u = reduce(lambda a, b: a.unionByName(b),
               [s.select(*gb, "h") for s in sketches]).distinct()
    w = Window.partitionBy(*gb).orderBy("h")
    return (u.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kmv_estimate(sketch: DataFrame, k: int = 256,
                 key_cols: Sequence[str] = ()) -> DataFrame:
    """(key…, n_hashes, est): exact count while the sketch is not full
    (n < k ⇒ every distinct hash is present), else the classic unbiased
    KMV estimator (k−1)/h_k with h_k the k-th smallest hash."""
    gb = list(key_cols)
    agg = sketch.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("_hk"))
    est = F.when(F.col("n_hashes") < k,
                 F.col("n_hashes").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / F.col("_hk"))
    return agg.select(*gb, "n_hashes", est.alias("est"))


def theta_set_ops(sketch: DataFrame, pairs: Sequence[tuple], k: int = 256,
                  key_col: str = "key") -> DataFrame:
    """Theta-sketch set algebra between keyed sketches (the DataSketches
    union/intersection/a-not-b trio): for each (key_a, key_b) pair

        θ_X   = h_k(X) if X holds k hashes else 1.0
        θ     = min(θ_a, θ_b)
        X'    = {h ∈ X : h < θ}            (both sketches re-thresholded)
        est_∪ = |A' ∪ B'| / θ,  est_∩ = |A' ∩ B'| / θ,
        est_⊖ = |A' \\ B'| / θ,  jaccard = |A' ∩ B'| / |A' ∪ B'|

    Answers "how many docs contain BOTH/EITHER term" from k-row summaries
    — no posting list is rescanned. Every relation here is ≤ |pairs|·2k
    rows; the pair table is literal and broadcast. Deterministic md5
    hashing makes the whole computation replayable in SQL.
    """
    spark = sketch.sparkSession
    pr = spark.createDataFrame([(str(a), str(b)) for a, b in pairs],
                               "key_a string, key_b string")
    th = (sketch.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk"))
        .select("_k", F.when(F.col("_n") >= k, F.col("_hk"))
                .otherwise(F.lit(1.0)).alias("theta")))
    pth = (pr.join(F.broadcast(th.withColumnRenamed("_k", "key_a")
                               .withColumnRenamed("theta", "_ta")), "key_a")
           .join(F.broadcast(th.withColumnRenamed("_k", "key_b")
                             .withColumnRenamed("theta", "_tb")), "key_b")
           .select("key_a", "key_b",
                   F.least("_ta", "_tb").alias("theta")))
    sa = (sketch.select(F.col(key_col).alias("key_a"), "h")
          .join(F.broadcast(pth), "key_a")
          .filter(F.col("h") < F.col("theta"))
          .select("key_a", "key_b", "h", F.lit(1).alias("in_a")))
    sb = (sketch.select(F.col(key_col).alias("key_b"), "h")
          .join(F.broadcast(pth), "key_b")
          .filter(F.col("h") < F.col("theta"))
          .select("key_a", "key_b", "h", F.lit(1).alias("in_b")))
    both = (sa.join(sb, ["key_a", "key_b", "h"], "full_outer")
            .groupBy("key_a", "key_b").agg(
                F.count(F.lit(1)).alias("_u"),
                F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1),
                             1).otherwise(0)).alias("_i"),
                F.sum(F.when(F.col("in_b").isNull(), 1).otherwise(0))
                .alias("_d")))
    out = (pth.join(both, ["key_a", "key_b"], "left")
           .select("key_a", "key_b", "theta",
                   F.coalesce(F.col("_u"), F.lit(0)).alias("union_n"),
                   F.coalesce(F.col("_i"), F.lit(0)).alias("inter_n"),
                   F.coalesce(F.col("_d"), F.lit(0)).alias("diff_n")))
    return out.select(
        "key_a", "key_b", "theta", "union_n", "inter_n", "diff_n",
        (F.col("union_n") / F.col("theta")).alias("union_est"),
        (F.col("inter_n") / F.col("theta")).alias("inter_est"),
        (F.col("diff_n") / F.col("theta")).alias("diff_ab_est"),
        F.when(F.col("union_n") > 0,
               F.col("inter_n").cast("double") / F.col("union_n"))
        .otherwise(F.lit(0.0)).alias("jaccard"))


def cumulative_cardinality(df: DataFrame, ts_col: str, col: str,
                           interval: str = "day", p: int = 12,
                           seed: int = 42) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation: per
    date-histogram bucket, the number of DISTINCT ``col`` values seen up
    to and including that bucket — "total unique users to date". The
    reason ES restricts the inner agg to cardinality: HLL registers
    merge by MAX, so the running union is a per-register running max
    over the bucket order — no re-scan of history, no exact distinct
    over an ever-growing window.

    Physical shape: one scan → (bucket, idx, rho) register relation
    (≤ |buckets|·2^p rows — sketch-sized, never data-sized); a dense
    bucket×idx grid (same spine pattern as ``moving_percentiles``) so
    carry-forward works through empty buckets; ONE window max per idx;
    one per-bucket estimate agg using the same closed-form as
    ``hll_estimate`` — deterministic md5 registers, so the estimate
    replays exactly in the oracle AND is identical across cluster sizes.

    Returns (bucket, est) for every spine bucket.
    """
    iv = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}
    if interval not in iv:
        raise ValueError(f"interval must be one of {sorted(iv)}")
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    h = F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(col))), 1, 15),
        16, 10).cast("long")
    idx = h % m
    w_ = F.floor(h / m).cast("long")
    rho = F.when(w_ > 0, F.lit(_HLL_BITS - p + 1) - F.length(F.bin(w_))
                 ).otherwise(F.lit(_HLL_BITS - p + 1)).cast("int")
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    per = (df.where(F.col(col).isNotNull() & F.col(ts_col).isNotNull())
           .select(bucket, idx.alias("idx"), rho.alias("rho"))
           .groupBy("bucket", "idx").agg(F.max("rho").alias("rho")))
    spine = (df.where(F.col(ts_col).isNotNull())
             .agg(F.date_trunc(interval, F.min(ts_col)).alias("_mn"),
                  F.date_trunc(interval, F.max(ts_col)).alias("_mx"))
             .select(F.explode(F.expr(
                 f"sequence(_mn, _mx, interval {iv[interval]})"))
                 .alias("bucket")))
    idxs = per.select("idx").distinct()
    grid = spine.crossJoin(idxs)
    dense = grid.join(per, ["bucket", "idx"], "left")
    wcum = (Window.partitionBy("idx").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = (dense.withColumn("rho_cum", F.max("rho").over(wcum))
           .filter(F.col("rho_cum").isNotNull()))
    agg = (cum.groupBy("bucket")
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("rho_cum"))).alias("s"),
                F.count("*").alias("nz")))
    raw = (F.lit(_hll_alpha(m) * m * m)
           / (F.col("s") + (F.lit(m) - F.col("nz"))))
    est = F.when((raw <= 2.5 * m) & (F.lit(m) - F.col("nz") > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / (F.lit(m) - F.col("nz")))
                 ).otherwise(raw)
    out = agg.select("bucket", est.alias("est"))
    # spine buckets BEFORE any data carry est of the empty sketch (0 via
    # linear counting) — restore them so the histogram stays dense
    return (spine.join(out, "bucket", "left")
            .select("bucket", F.coalesce("est", F.lit(0.0)).alias("est")))


def bloom_semi_join(big: DataFrame, keys: DataFrame, col: str,
                    k_hashes: int = 4, n_bits: int = 1 << 16,
                    seed: int = 42) -> DataFrame:
    """Bloom-prefiltered semi-join: keep ``big`` rows whose ``col`` is in
    ``keys[col]`` — the 100-TB join pattern Spark's runtime bloom join
    automates, made explicit: a broadcast Bloom over the key side
    prefilters the probe MAP-SIDE (no false negatives, so nothing is
    lost), and only the survivors — |matches| + the Bloom's false-
    positive residue — pay the exact semi-join shuffle. When the key
    side is small but over-broadcast-threshold and the probe is a
    petabyte fact table, the prefilter cuts the shuffle by the
    selectivity factor.

    Result is EXACTLY the semi-join (the exact join removes Bloom false
    positives) — the sketch changes the plan, never the answer.
    """
    bloom = bloom_build(keys, col, k_hashes, n_bits, seed)
    bits = [F.broadcast(bloom.select(F.col("bit").alias(f"_b{r}")))
            for r in range(k_hashes)]
    pre = big
    for r in range(k_hashes):
        pos = _bucket(F.col(col), r, n_bits, seed)
        pre = (pre.join(bits[r], pos == F.col(f"_b{r}"), "leftsemi"))
    return pre.join(keys.select(F.col(col)).distinct(), col, "leftsemi")


def rolling_cardinality(df: DataFrame, ts_col: str, col: str,
                        interval: str = "day", window: int = 7,
                        p: int = 12, seed: int = 42) -> DataFrame:
    """Trailing-window distinct counts from daily HLL sketches — the
    WAU/MAU primitive ("distinct users in the last 7 days, every day")
    without an exact distinct over a sliding window: registers merge by
    max, so the trailing union is a windowed per-register MAX over the
    same dense bucket spine as ``cumulative_cardinality``. At 100 TB
    the per-bucket sketches are the ONLY state — 2^p rows per bucket —
    and any window (7-day WAU, 30-day MAU) is a window-spec change, not
    a recompute.

    Returns (bucket, est) for every spine bucket (0.0 before any data
    enters the window).
    """
    iv = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}
    if interval not in iv:
        raise ValueError(f"interval must be one of {sorted(iv)}")
    if window < 1:
        raise ValueError("window must be >= 1")
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    h = F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(col))), 1, 15),
        16, 10).cast("long")
    idx = h % m
    w_ = F.floor(h / m).cast("long")
    rho = F.when(w_ > 0, F.lit(_HLL_BITS - p + 1) - F.length(F.bin(w_))
                 ).otherwise(F.lit(_HLL_BITS - p + 1)).cast("int")
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    per = (df.where(F.col(col).isNotNull() & F.col(ts_col).isNotNull())
           .select(bucket, idx.alias("idx"), rho.alias("rho"))
           .groupBy("bucket", "idx").agg(F.max("rho").alias("rho")))
    spine = (df.where(F.col(ts_col).isNotNull())
             .agg(F.date_trunc(interval, F.min(ts_col)).alias("_mn"),
                  F.date_trunc(interval, F.max(ts_col)).alias("_mx"))
             .select(F.explode(F.expr(
                 f"sequence(_mn, _mx, interval {iv[interval]})"))
                 .alias("bucket")))
    idxs = per.select("idx").distinct()
    grid = spine.crossJoin(idxs)
    dense = grid.join(per, ["bucket", "idx"], "left")
    wmov = (Window.partitionBy("idx").orderBy("bucket")
            .rowsBetween(-(window - 1), 0))
    cum = (dense.withColumn("rho_w", F.max("rho").over(wmov))
           .filter(F.col("rho_w").isNotNull()))
    agg = (cum.groupBy("bucket")
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("rho_w"))).alias("s"),
                F.count("*").alias("nz")))
    raw = (F.lit(_hll_alpha(m) * m * m)
           / (F.col("s") + (F.lit(m) - F.col("nz"))))
    est = F.when((raw <= 2.5 * m) & (F.lit(m) - F.col("nz") > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / (F.lit(m) - F.col("nz")))
                 ).otherwise(raw)
    out = agg.select("bucket", est.alias("est"))
    return (spine.join(out, "bucket", "left")
            .select("bucket", F.coalesce("est", F.lit(0.0)).alias("est")))

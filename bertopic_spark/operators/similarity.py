"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (reference analog:
``cosine_similarity`` calls all over ``_bertopic.py`` — J4 in SURVEY §2.5),
plus a sign-LSH bucketed variant as the scale path: at 10^9+ vectors the
cross join is infeasible; bucketing by hyperplane sign bits bounds each
probe to one bucket (recall < 1 by design, measured in tests).

Everything is JVM-side array expressions (zip_with/aggregate) — no UDFs.
Dot products fold sequentially in array order, so results are deterministic
and match the DuckDB oracle's per-index join to the last ulp (rounded 6dp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_vec_id, vec_id, cos, rn).

    The query side is a tiny broadcast; the corpus side streams — one pass,
    no shuffle except the per-query window top-k (W1 analog).

    ``where`` is ES knn PRE-filtering: the predicate restricts the corpus
    side BEFORE any distance is computed (pushed to the scan — metadata
    predicates prune row groups/partitions, and the candidate set shrinks
    ahead of the arithmetic), and the top-k window then always returns k
    qualifying hits. Post-filtering a vector top-k would instead starve
    k behind the filter. Query vectors are fetched from the UNFILTERED
    relation, so a query may live outside the filtered slice.
    """
    proj = lambda df: df.select(  # noqa: E731
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    q = proj(emb.filter(F.col(id_col).isin(query_ids))).select(
        F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv")
    )
    base = proj(emb if where is None else emb.filter(where))
    pairs = base.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_vec_id"))
    scored = pairs.select(
        "query_vec_id", id_col, cosine_expr(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_vec_id", id_col, F.round("cos", 6).alias("cos"), "rn")
    )


def sign_bucket_expr(vec: Column, n_bits: int = 8) -> Column:
    """Sign-LSH bucket id from the first n_bits dimensions' signs.

    Production would use seeded random hyperplanes (dot-product signs);
    using leading dims keeps the oracle SQL trivial while exercising the
    identical plan shape (bucket → co-bucket join → rerank).
    """
    bucket = F.lit(0)
    for j in range(n_bits):
        bucket = bucket + F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("long")


def random_hyperplane_buckets(emb: DataFrame, n_planes: int = 8, seed: int = 42,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """(id, bucket): real sign-LSH — bucket bit p = sign of ⟨v, h_p⟩ with
    seeded pseudo-random hyperplanes h_p[d] ∈ [−0.5, 0.5) derived from
    md5(seed_p_d) (bit-identical in DuckDB, so the bucketed ANN keeps a
    cross-engine oracle — unlike library RNG hyperplanes).

    Long-form plan: posexplode dims → broadcast-join the (plane, dim)
    coefficient table (n_planes × dim rows — tiny) → (id, plane) agg →
    (id) agg. Two narrow-keyed shuffles on id; no UDFs, any vector dim.
    """
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"))
    spark = emb.sparkSession
    planes = (
        ex.select("dim").distinct()
        .crossJoin(spark.range(n_planes).select(F.col("id").cast("int").alias("plane")))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.lit(seed), F.col("plane"), F.col("dim"))), 1, 8),
        16, 10,
    ).cast("long")
    coeff = planes.withColumn("c", (h % 1000) / F.lit(1000.0) - 0.5)
    plane_scores = (
        ex.join(F.broadcast(coeff), "dim")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("val") * F.col("c")).alias("s"))
    )
    # pyspark's shiftleft() only takes an int literal for numBits; the SQL
    # form accepts a column expression
    bit = F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), plane) "
                 "ELSE CAST(0 AS BIGINT) END")
    return plane_scores.groupBy(id_col).agg(F.sum(bit).cast("long").alias("bucket"))


def random_hyperplane_buckets_multi(
    emb: DataFrame, n_planes: int = 8, n_tables: int = 1, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket): ``n_tables`` independent sign-LSH hash tables
    over the same seeded coefficient stream. Global plane index ``p`` in
    ``[0, n_planes*n_tables)`` maps to table ``p div n_planes`` and bit
    ``p mod n_planes`` — table 0 is therefore bit-identical to
    :func:`random_hyperplane_buckets` for the same seed, and the whole
    relation stays cross-engine reproducible (md5-derived coefficients).

    Same two narrow shuffles as the single-table helper; the coefficient
    broadcast grows to ``n_planes*n_tables × dim`` rows (still tiny)."""
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"))
    spark = emb.sparkSession
    planes = (
        ex.select("dim").distinct()
        .crossJoin(spark.range(n_planes * n_tables)
                   .select(F.col("id").cast("int").alias("plane")))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("_", F.lit(seed), F.col("plane"), F.col("dim"))), 1, 8),
        16, 10,
    ).cast("long")
    coeff = planes.withColumn("c", (h % 1000) / F.lit(1000.0) - 0.5)
    plane_scores = (
        ex.join(F.broadcast(coeff), "dim")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("val") * F.col("c")).alias("s"))
    )
    bit = F.expr(
        f"CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), plane % {n_planes}) "
        "ELSE CAST(0 AS BIGINT) END")
    return (
        plane_scores
        .withColumn("table", (F.col("plane") / n_planes).cast("int"))
        .groupBy(id_col, "table")
        .agg(F.sum(bit).cast("long").alias("bucket"))
    )


def rplsh_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
) -> DataFrame:
    """Approximate cosine top-k restricted to the query's random-hyperplane
    bucket — `lsh_cosine_topk` with real hyperplanes instead of the
    leading-dims stand-in. Same output shape; bucket is a partition key at
    scale, so each probe touches one partition.

    ``n_tables > 1`` is standard OR-amplification (Indyk-Motwani): a
    candidate qualifies if it collides with the query in ANY of the
    ``n_tables`` independent tables, so recall rises ~linearly in tables
    while each probe still touches ``n_tables`` buckets instead of the
    corpus. Candidates are deduplicated BEFORE scoring — a pair colliding
    in several tables is scored once."""
    if n_tables <= 1:
        buckets = random_hyperplane_buckets(emb, n_planes, seed, id_col, vec_col)
    else:
        buckets = random_hyperplane_buckets_multi(
            emb, n_planes, n_tables, seed, id_col, vec_col)
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).join(buckets, id_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
        *([F.col("table").alias("qtable")] if n_tables > 1 else []),
    )
    join_cond = F.col("bucket") == F.col("qbucket")
    if n_tables > 1:
        join_cond = join_cond & (F.col("table") == F.col("qtable"))
    pairs = base.join(F.broadcast(q), join_cond).filter(
        F.col(id_col) != F.col("query_vec_id"))
    if n_tables > 1:
        # collapse multi-table collisions to one row per (query, candidate)
        # so each pair is scored exactly once
        pairs = pairs.groupBy("query_vec_id", id_col).agg(
            F.first("qv").alias("qv"), F.first("v").alias("v"))
    scored = pairs.select(
        "query_vec_id", id_col, cosine_expr(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_vec_id", id_col, F.round("cos", 6).alias("cos"), "rn")
    )


def lsh_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k restricted to the query's sign-LSH bucket.

    Same output shape as cosine_topk; recall measured in tests. At scale the
    bucket column is a partition key — each probe touches one partition.
    """
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", sign_bucket_expr(F.col("v"), n_bits))
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = base.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col(id_col) != F.col("query_vec_id"))
    scored = pairs.select(
        "query_vec_id", id_col, cosine_expr(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_vec_id", id_col, F.round("cos", 6).alias("cos"), "rn")
    )


def ivf_centroids(emb: DataFrame, nlist: int = 16, iters: int = 0,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantizer: (list_id, cv). Seeds are the ``nlist``
    lowest-id vectors (deterministic — production swaps in k-means||
    init); each Lloyd iteration is one assign + one (list, dim) mean
    re-agg, i.e. the exact distributed k-means plan. With ``iters=0``
    the seeds themselves are the centroids, which keeps a cross-engine
    DuckDB oracle; tests cover ``iters>0`` convergence invariants.

    Centroid table is nlist rows — always broadcast-side."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    # the global window here runs over the nlist-row post-limit relation
    # (driver-bounded), not the corpus — single-partition by construction
    cents = (
        base.orderBy(id_col).limit(nlist)
        .select(F.row_number().over(Window.orderBy(id_col)).alias("list_id"),
                F.col("v").alias("cv"))
    )
    for _ in range(iters):
        assigned = ivf_assign(base, cents, id_col)
        means = (
            base.join(assigned, id_col)
            .select("list_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("list_id", "dim").agg(F.avg("val").alias("m"))
        )
        cents = (
            means.groupBy("list_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"]).alias("cv"))
        )
    return cents


def ivf_assign(base: DataFrame, cents: DataFrame,
               id_col: str = "vec_id") -> DataFrame:
    """(id, list_id): nearest centroid by cosine (ties → lowest list_id).
    base: (id, v). The nlist-row centroid table broadcasts; the corpus
    streams — one narrow window per vector, no corpus shuffle."""
    scored = base.crossJoin(F.broadcast(cents)).select(
        id_col, "list_id", cosine_expr(F.col("v"), F.col("cv")).alias("_sim"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("list_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).select(id_col, "list_id")
    )


def ivf_cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: partition the corpus into ``nlist`` inverted lists by
    nearest coarse centroid, probe the ``nprobe`` lists nearest each query,
    exact-rerank only those lists. Same output shape as ``cosine_topk``;
    at scale ``list_id`` is the partition key, so each query touches
    nprobe/nlist of the corpus instead of all of it (the third scale path
    next to the two sign-LSH variants — recall degrades gracefully with
    nprobe, measured in tests)."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    cents = ivf_centroids(emb, nlist, iters, id_col, vec_col)
    lists = ivf_assign(base, cents, id_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"))
    # probe lists: nprobe best centroids per query (q × nlist — tiny)
    wq = Window.partitionBy("query_vec_id").orderBy(
        F.desc("_sim"), F.asc("list_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_vec_id", "qv", "list_id",
                cosine_expr(F.col("qv"), F.col("cv")).alias("_sim"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_vec_id", "qv", "list_id")
    )
    cand = base.join(lists, id_col).join(
        F.broadcast(probes), "list_id"
    ).filter(F.col(id_col) != F.col("query_vec_id"))
    scored = cand.select(
        "query_vec_id", id_col, cosine_expr(F.col("qv"), F.col("v")).alias("cos"))
    w = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_vec_id", id_col, F.round("cos", 6).alias("cos"), "rn")
    )


def class_centroids(emb: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """A7: per-group mean vector (topic embeddings, _bertopic.py:4334-4343).

    posexplode → groupBy(label, dim).avg — shuffles (label, dim) pairs, not
    vectors; at scale this beats collecting arrays per group.
    """
    exploded = emb.select(
        F.col(label_col), F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val")
    )
    return (
        exploded.groupBy(label_col, "dim")
        .agg(F.round(F.avg("val"), 6).alias("mean_val"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the embedding-compression scale path.
#
# At 100 TB of embeddings the float vectors themselves are the bottleneck
# (64 dims × 4 B = 256 B/vector); PQ codes are m bytes (m=8 → 32×
# smaller), small enough to keep the whole index in executor memory and
# scan map-only. Codebooks are m×ksub rows — always broadcast/literal.
# Same oracle strategy as IVF (ivf_centroids above): iters=0 seeds the
# codebooks with the ksub lowest-id vectors' subvectors (cross-engine
# DuckDB oracle); iters>0 runs distributed Lloyd for real recall
# (pytest-measured).
# ---------------------------------------------------------------------------


def pq_codebooks(emb: DataFrame, m: int = 8, ksub: int = 16, iters: int = 0,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """PQ codebooks: (sub, code, cv array<double> of d/m dims).

    Seeds are the ``ksub`` lowest-id vectors split into ``m`` subvectors;
    each Lloyd iteration re-assigns codes (via ``pq_encode``) and re-means
    per (sub, code, subdim) — the exact distributed k-means plan, run per
    subspace.
    """
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    d = len(base.select("v").first()["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice("v", s * dsub + 1, dsub))
    cents = (base.orderBy(id_col).limit(ksub)
             .select((F.row_number().over(Window.orderBy(id_col)) - 1)
                     .alias("code"), subs.alias("svs"))
             .select("code", F.posexplode("svs").alias("sub", "cv"))
             .select("sub", "code", "cv"))
    for _ in range(iters):
        codes = pq_encode(base.select(id_col, "v"), cents, m,
                          id_col=id_col, vec_col="v")
        assigned = (base.join(codes, id_col)
                    .select(F.posexplode("v").alias("dim", "val"), "codes")
                    .select((F.col("dim") / dsub).cast("int").alias("sub"),
                            (F.col("dim") % dsub).alias("sd"), "val", "codes"))
        assigned = assigned.select(
            "sub", "sd", "val",
            F.element_at("codes", F.col("sub") + 1).alias("code"))
        means = (assigned.groupBy("sub", "code", "sd")
                 .agg(F.avg("val").alias("mv")))
        new = (means.groupBy("sub", "code")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("sd", "mv"))),
                   lambda s: s["mv"]).alias("nv")))
        # a code with no members keeps its previous centroid — dropping it
        # would shrink the codebook and zero-fill later lookups
        cents = (cents.join(new, ["sub", "code"], "left")
                 .select("sub", "code",
                         F.coalesce("nv", "cv").alias("cv")))
    return cents


def pq_encode(emb: DataFrame, codebooks: DataFrame, m: int,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """PQ codes: (id, codes array<int>, len m), code = argmin-L2 centroid
    per subspace (ties → lowest code).

    The codebook (m×ksub×dsub doubles ≈ 1 KB) collects to the driver and
    ships inside a vectorized Arrow pandas UDF — the documented fast path
    for a genuinely numeric kernel (batched numpy argmin; per-row JVM
    expression trees for m·ksub·dsub terms defeat codegen instead).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rows = codebooks.orderBy("sub", "code").collect()
    ksub = 1 + max(r["code"] for r in rows)
    cb = np.zeros((m, ksub, len(rows[0]["cv"])))
    for r in rows:
        cb[r["sub"], r["code"], :] = r["cv"]

    def _encode(vs):
        x = np.asarray(vs.tolist(), dtype=np.float64)
        n, d = x.shape
        xs = x.reshape(n, m, d // m)
        out = np.empty((n, m), dtype=np.int32)
        for s in range(m):  # m is small; each step is fully vectorized
            diff = xs[:, s, None, :] - cb[None, s, :, :]
            out[:, s] = np.square(diff).sum(axis=2).argmin(axis=1)
        return pd.Series(list(out))

    encode = pandas_udf(_encode, "array<int>")

    return emb.select(F.col(id_col),
                      encode(F.col(vec_col).cast("array<double>"))
                      .alias("codes"))


def _pq_lut(q: DataFrame, cents: DataFrame, m: int, dsub: int,
            id_col: str = "vec_id") -> DataFrame:
    """(query_vec_id, lut) — the per-query ADC lookup table: an m×ksub
    nested array with lut[sub][code] = <q_sub, centroid_{sub,code}>.
    m·ksub doubles per query — always the broadcast side."""
    qsv = (q.select(F.col(id_col).alias("query_vec_id"),
                    F.posexplode("v").alias("dim", "qval"))
           .select("query_vec_id",
                   (F.col("dim") / dsub).cast("int").alias("sub"),
                   (F.col("dim") % dsub).alias("sd"), "qval"))
    cbe = cents.select(
        "sub", "code", F.posexplode("cv").alias("sd", "cval"))
    lut_long = (qsv.join(cbe, ["sub", "sd"])
                .groupBy("query_vec_id", "sub", "code")
                .agg(F.sum(F.col("qval") * F.col("cval")).alias("ip")))
    return (lut_long.groupBy("query_vec_id", "sub")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("code", "ip"))),
                lambda s: s["ip"]).alias("row"))
            .groupBy("query_vec_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))),
                lambda s: s["row"]).alias("lut")))


def _adc_score(m: int) -> Column:
    """Σ_sub lut[sub][codes[sub]] — the ADC sum as one aggregate HOF over
    a (codes, lut) pair of columns."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
        lambda acc, s: acc + F.element_at(
            F.element_at("lut", s + 1),
            F.element_at("codes", s + 1) + F.lit(1)))


def ivfpq_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
               nlist: int = 16, nprobe: int = 4,
               m: int = 8, ksub: int = 16, iters: int = 0,
               refine: int = 0, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ ANN (the canonical billion-scale recipe, FAISS IndexIVFPQ
    shape): coarse-quantize the corpus into ``nlist`` inverted lists,
    PQ-encode every vector to ``m`` byte codes, and serve a query by
    probing its ``nprobe`` nearest lists and ADC-scoring ONLY their codes
    — the candidate set shrinks by nprobe/nlist AND each candidate costs
    m table lookups instead of d float multiplies. ``refine`` > 0 adds
    the standard exact re-rank of the top refine·k ADC hits.

    Simplification vs FAISS, documented: codes quantize the RAW vectors,
    not the per-list residuals (residual encoding needs per-list
    codebook arithmetic that would forfeit the cross-engine oracle; the
    recall cost is measured in tests). Physical shape: centroid + LUT +
    probe relations all broadcast; the codes relation is partitionable
    by ``list_id`` at scale so a probe reads nprobe/nlist of the corpus;
    the only wide exchange is the final per-query top-k window.
    """
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    cents_ivf = ivf_centroids(emb, nlist, iters, id_col, vec_col)
    lists = ivf_assign(base, cents_ivf, id_col)
    cb = pq_codebooks(base, m, ksub, iters, id_col, "v")
    codes = pq_encode(base, cb, m, id_col, "v")

    q = base.filter(F.col(id_col).isin(query_ids))
    d = len(base.select("v").first()["v"])
    lut = _pq_lut(q, cb, m, d // m, id_col)

    wq = Window.partitionBy("query_vec_id").orderBy(
        F.desc("_sim"), F.asc("list_id"))
    probes = (
        q.select(F.col(id_col).alias("query_vec_id"), "v")
        .crossJoin(F.broadcast(cents_ivf))
        .select("query_vec_id", "list_id",
                cosine_expr(F.col("v"), F.col("cv")).alias("_sim"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_vec_id", "list_id"))

    cand = (codes.join(lists, id_col)
            .join(F.broadcast(probes), "list_id")
            .join(F.broadcast(lut), "query_vec_id")
            .filter(F.col(id_col) != F.col("query_vec_id")))
    scored = cand.select("query_vec_id", id_col,
                         _adc_score(m).alias("score"))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    top = (scored.withColumn("rn", F.row_number().over(w).cast("long"))
           .filter(F.col("rn") <= (refine * k if refine else k)))
    if not refine:
        return top.select("query_vec_id", id_col,
                          F.round("score", 6).alias("score"), "rn")
    qv = q.select(F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"))
    rer = (top.select("query_vec_id", id_col)
           .join(base, id_col).join(F.broadcast(qv), "query_vec_id")
           .select("query_vec_id", id_col,
                   cosine_expr(F.col("qv"), F.col("v")).alias("score")))
    w2 = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    return (rer.withColumn("rn", F.row_number().over(w2).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_vec_id", id_col,
                    F.round("score", 6).alias("score"), "rn"))


def pq_topk_adc(emb: DataFrame, query_ids: list[int], k: int = 10,
                m: int = 8, ksub: int = 16, iters: int = 0,
                refine: int = 0, normalize: bool = False,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """PQ asymmetric-distance top-k: (query_vec_id, vec_id, score, rn).

    score = Σ_sub LUT[sub][code] with LUT[sub][c] = <q_sub, centroid_c> —
    inner-product ADC. ``normalize=True`` L2-normalizes every vector
    before training/encoding, making IP-ADC approximate COSINE ranking
    (without it, norm variance dominates and recall against a cosine
    ground truth is meaningless). Serving is
    MAP-ONLY: the per-query LUT (m×ksub doubles) broadcasts onto the
    codes relation and one ``aggregate`` HOF sums the lookups; the only
    shuffle is the final per-query top-k window. With ``refine`` > 0 the
    top ``refine·k`` ADC candidates are exactly re-ranked by cosine
    against the float vectors — the standard two-stage PQ serve; at
    ``refine`` ≥ corpus/k it degenerates to exact brute force (the pytest
    plumbing check).
    """
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    if normalize:
        nrm = norm_expr(F.col("v"))
        base = base.select(
            id_col, F.transform("v", lambda x: x / nrm).alias("v"))
    cents = pq_codebooks(base, m, ksub, iters, id_col, "v")
    codes = pq_encode(base, cents, m, id_col, "v")

    q = base.filter(F.col(id_col).isin(query_ids))
    d = len(base.select("v").first()["v"])
    lut = _pq_lut(q, cents, m, d // m, id_col)

    pairs = (codes.crossJoin(F.broadcast(lut))
             .filter(F.col(id_col) != F.col("query_vec_id")))
    scored = pairs.select("query_vec_id", id_col,
                          _adc_score(m).alias("score"))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    top = (scored.withColumn("rn", F.row_number().over(w).cast("long"))
           .filter(F.col("rn") <= (refine * k if refine else k)))
    if not refine:
        return top.select("query_vec_id", id_col,
                          F.round("score", 6).alias("score"), "rn")
    qv = q.select(F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"))
    rer = (top.select("query_vec_id", id_col)
           .join(base, id_col).join(F.broadcast(qv), "query_vec_id")
           .select("query_vec_id", id_col,
                   cosine_expr(F.col("qv"), F.col("v")).alias("score")))
    w2 = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    return (rer.withColumn("rn", F.row_number().over(w2).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_vec_id", id_col,
                    F.round("score", 6).alias("score"), "rn"))


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the FAISS IndexScalarQuantizer (QT_8bit)
# point on the embedding-compression curve, next to PQ above: every
# COMPONENT quantizes to one byte against per-dimension trained bounds.
# 4× smaller than float32 (PQ is 32×) but with no codebook training, a
# per-component CERTIFIED reconstruction error of half a level, and
# map-only encode/serve (array-literal bounds, JVM HOFs — no join, no
# UDF). All level arithmetic is BIGINT micro-units (values rounded to
# 6 dp × 1e6) with integer floor division, the same cross-engine
# determinism discipline as quantize_impacts and histogram_sketch: no
# float ⌊⌋ boundary can disagree between engines or partitionings.
# ---------------------------------------------------------------------------


def sq8_bounds(emb: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Per-dimension training bounds: (dim, min_u, max_u) in BIGINT
    micro-units. One posexplode + one groupBy(dim) — partial aggregation
    collapses each partition to d rows before the shuffle, so the
    exchange is d×partitions regardless of corpus size."""
    vu = F.round(F.col("val") * 1e6, 0).cast("long")
    return (emb.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("dim", "val"))
            .groupBy("dim").agg(F.min(vu).alias("min_u"),
                                F.max(vu).alias("max_u")))


def _sq8_literals(bounds: DataFrame) -> tuple[Column, Column, int]:
    """Collect the d-row bounds and bind them as array literals
    (mins_u, ranges_u) — d·16 bytes on the driver, never a join."""
    rows = sorted(bounds.collect(), key=lambda r: r["dim"])
    if not rows:
        raise ValueError("empty bounds relation")
    if [r["dim"] for r in rows] != list(range(len(rows))):
        raise ValueError("bounds must cover dims 0..d-1 exactly")
    mins = F.array(*[F.lit(int(r["min_u"])) for r in rows])
    rngs = F.array(*[F.lit(int(r["max_u"] - r["min_u"])) for r in rows])
    return mins, rngs, len(rows)


def sq8_encode(emb: DataFrame, bounds: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): code_i = clamp(⌊(v_u − min_u)·256 /
    range_u⌋, 0, 255) — uniform 8-bit levels over the trained
    per-dimension range; a degenerate dimension (max==min) codes 0.
    Frozen ``bounds`` encode out-of-range components to the clamped edge
    levels (the FAISS train/add split). Map-only projection in
    WholeStageCodegen; the floor is exact integer arithmetic
    ((ri − pmod(ri, rng)) / rng)."""
    mins, rngs, d = _sq8_literals(bounds)

    def code_at(v):
        def one(i):
            vu = F.round(F.element_at(v, i + 1) * 1e6, 0).cast("long")
            mn = F.element_at(mins, i + 1)
            rng = F.element_at(rngs, i + 1)
            ri = (vu - mn) * 256
            lvl = (ri - F.pmod(ri, rng)) / rng
            return F.when(rng == 0, F.lit(0)).otherwise(
                F.greatest(F.lit(0), F.least(F.lit(255), lvl))).cast("int")
        return F.transform(F.sequence(F.lit(0), F.lit(d - 1)), one)

    return emb.select(
        F.col(id_col),
        code_at(F.col(vec_col).cast("array<double>")).alias("codes"))


def sq8_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             normalize: bool = False, refine: int = 0,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Asymmetric SQ8 top-k: (query_vec_id, vec_id, score, err_bound, rn).

    score = Σ_i q_i · rec_i with the midpoint reconstruction
    rec_i = (min_u + (code_i + 0.5)·range_u / 256) / 1e6 — full-precision
    query against quantized corpus (FAISS asymmetric distance).
    ``err_bound`` is the CERTIFIED per-result bound |approx − exact_IP| ≤
    Σ_i |q_i|·range_i/512 + Σ_i |q_i|·5e-7: half a level per component
    plus the micro-unit rounding of the stored value (both one-sided
    maxima). ``normalize=True`` L2-normalizes before training/encoding so
    IP approximates cosine. Serving is MAP-ONLY — the query vectors
    broadcast onto the codes relation, the reconstruction constants are
    array literals, and one ``aggregate`` HOF forms the dot product; the
    only shuffle is the final per-query top-k window. With ``refine`` > 0
    the top refine·k candidates re-rank exactly by cosine (two-stage
    serve; refine ≥ corpus/k degenerates to brute force)."""
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    if normalize:
        nrm = norm_expr(F.col("v"))
        base = base.select(
            id_col, F.transform("v", lambda x: x / nrm).alias("v"))
    bounds = sq8_bounds(base, id_col, "v")
    mins, rngs, d = _sq8_literals(bounds)
    codes = sq8_encode(base, bounds, id_col, "v")

    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"))
    rec = lambda i: (  # noqa: E731 — local reconstruction expression
        (F.element_at(mins, i + 1)
         + (F.element_at(F.col("codes"), i + 1) + F.lit(0.5))
         * F.element_at(rngs, i + 1) / F.lit(256.0)) / F.lit(1e6))
    dims = F.sequence(F.lit(0), F.lit(d - 1))
    score = F.aggregate(
        dims, F.lit(0.0),
        lambda acc, i: acc + F.element_at(F.col("qv"), i + 1) * rec(i))
    bound = F.aggregate(
        dims, F.lit(0.0),
        lambda acc, i: acc + F.abs(F.element_at(F.col("qv"), i + 1))
        * (F.element_at(rngs, i + 1) / F.lit(512e6) + F.lit(5e-7)))
    pairs = (codes.crossJoin(F.broadcast(q))
             .filter(F.col(id_col) != F.col("query_vec_id")))
    scored = pairs.select("query_vec_id", id_col, score.alias("score"),
                          bound.alias("err_bound"))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    top = (scored.withColumn("rn", F.row_number().over(w).cast("long"))
           .filter(F.col("rn") <= (refine * k if refine else k)))
    if not refine:
        return top.select("query_vec_id", id_col,
                          F.round("score", 6).alias("score"),
                          F.round("err_bound", 6).alias("err_bound"), "rn")
    qv = q.select("query_vec_id", F.col("qv"))
    rer = (top.select("query_vec_id", id_col)
           .join(base, id_col).join(F.broadcast(qv), "query_vec_id")
           .select("query_vec_id", id_col,
                   cosine_expr(F.col("qv"), F.col("v")).alias("score")))
    w2 = Window.partitionBy("query_vec_id").orderBy(
        F.desc("score"), F.asc(id_col))
    return (rer.withColumn("rn", F.row_number().over(w2).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_vec_id", id_col,
                    F.round("score", 6).alias("score"),
                    F.lit(0.0).alias("err_bound"), "rn"))


def _sign_code_expr(vec, lo_bit: int, n: int):
    """Σ_{j} (vec[j+1] > 0) << (j - lo_bit) over j in [lo_bit, lo_bit+n)."""
    # 2^(j-lo_bit) via float pow (exact for exponents < 53; halves are
    # <= 32 bits): shiftleft takes only a literal bit count, not a Column.
    return F.aggregate(
        F.transform(F.sequence(F.lit(lo_bit), F.lit(lo_bit + n - 1)),
                    lambda j: F.when(
                        F.element_at(vec, j + 1) > 0,
                        F.pow(F.lit(2.0), (j - lo_bit).cast("double"))
                        .cast("long")
                    ).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda a, v: a + v)


def bq_hamming_topk(emb: DataFrame, query_ids, k: int = 10,
                    rerank: int = 40, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Binary-quantized ANN (FAISS/Lucene BQ): 1-bit sign codes packed
    into two 32-bit halves (64-dim vectors → 8 bytes/vector, a 32×
    compression), Hamming pre-ranking via xor+popcount — pure JVM bit
    ops over a map-only broadcast probe — then EXACT cosine re-rank of
    the top-``rerank`` Hamming candidates. Returns (query_vec_id,
    vec_id, hamming, cos, rn) ranked by exact cosine.

    Scale shape: the code relation is 8 bytes/vector — at 10⁹ vectors it
    fits executor memory where raw floats do not; the Hamming pass
    streams the codes against broadcast query codes (no shuffle), and
    only |q|·rerank candidates ever touch the full vectors.
    """
    if k < 1 or rerank < k:
        raise ValueError("need k >= 1 and rerank >= k")
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    dim = len(base.select("v").first()["v"])
    half = (dim + 1) // 2
    codes = base.select(
        id_col,
        _sign_code_expr(F.col("v"), 0, half).alias("lo"),
        _sign_code_expr(F.col("v"), half, dim - half).alias("hi"))
    qids = [int(q) for q in query_ids]
    qcodes = F.broadcast(
        codes.filter(F.col(id_col).isin(qids))
        .select(F.col(id_col).alias("query_vec_id"),
                F.col("lo").alias("qlo"), F.col("hi").alias("qhi")))
    ham = (codes.crossJoin(qcodes)
           .filter(F.col(id_col) != F.col("query_vec_id"))
           .select("query_vec_id", id_col,
                   (F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo"))) +
                    F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi"))))
                   .cast("long").alias("hamming")))
    w = Window.partitionBy("query_vec_id").orderBy(F.asc("hamming"),
                                                   F.asc(id_col))
    cand = (ham.withColumn("_hr", F.row_number().over(w))
            .filter(F.col("_hr") <= rerank).drop("_hr"))
    qv = F.broadcast(base.filter(F.col(id_col).isin(qids))
                     .select(F.col(id_col).alias("query_vec_id"),
                             F.col("v").alias("qv")))
    rer = (cand.join(base, id_col).join(qv, "query_vec_id")
           .select("query_vec_id", id_col, "hamming",
                   cosine_expr(F.col("v"), F.col("qv")).alias("cos")))
    w2 = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"),
                                                    F.asc(id_col))
    return (rer.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= k)
            .select("query_vec_id", id_col, "hamming",
                    F.round("cos", 6).alias("cos"),
                    F.col("rn").cast("long").alias("rn")))


def matryoshka_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    prefix_dims: int = 16,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka two-stage serving (Kusupati et al. 2022 MRL; the
    OpenAI/Nomic "shortening" deployment pattern): stage 1 ranks the
    whole corpus by cosine over only the FIRST ``prefix_dims``
    dimensions and keeps ``n_candidates`` per query; stage 2 re-ranks
    the survivors with exact full-dimension cosine. With MRL-trained
    embeddings the prefix is a faithful coarse embedding, so recall@k
    is near-1 at prefix/full of the FLOPs — and at 10⁹ vectors the
    prefix can live as its OWN parquet column (column pruning reads
    prefix_dims/dim of the bytes in stage 1; stage 2 fetches full
    vectors for only n_candidates·|queries| rows).

    Returns (query_vec_id, vec_id, cos, rn) — exact cosine of the
    survivors, so rows are directly comparable to ``cosine_topk``.
    Both stages are broadcast-query map passes; the only shuffles are
    the two per-query top-k windows.
    """
    if prefix_dims < 1 or n_candidates < k:
        raise ValueError("need prefix_dims >= 1 and n_candidates >= k")
    proj = lambda df: df.select(  # noqa: E731
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    q = proj(emb.filter(F.col(id_col).isin(query_ids))).select(
        F.col(id_col).alias("query_vec_id"), F.col("v").alias("qv"))
    base = proj(emb)
    pairs = (base.crossJoin(F.broadcast(q))
             .filter(F.col(id_col) != F.col("query_vec_id")))
    coarse = pairs.select(
        "query_vec_id", id_col, "qv", "v",
        cosine_expr(F.slice(F.col("qv"), 1, prefix_dims),
                    F.slice(F.col("v"), 1, prefix_dims)).alias("ccos"))
    w1 = Window.partitionBy("query_vec_id").orderBy(F.desc("ccos"),
                                                    F.asc(id_col))
    cand = (coarse.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= n_candidates))
    w2 = Window.partitionBy("query_vec_id").orderBy(F.desc("cos"),
                                                    F.asc(id_col))
    return (cand.select("query_vec_id", id_col,
                        cosine_expr(F.col("qv"), F.col("v")).alias("cos"))
            .withColumn("rn", F.row_number().over(w2).cast("long"))
            .filter(F.col("rn") <= k)
            .select("query_vec_id", id_col, F.round("cos", 6).alias("cos"),
                    "rn"))


def mmr_diversify(emb: DataFrame, cands: DataFrame, k: int = 5,
                  diversity: float = 0.4, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  query_col: str = "query_vec_id",
                  rel_col: str = "cos") -> DataFrame:
    """Search-result diversification: greedy MMR over an ANN candidate
    relation — step i keeps the candidate maximizing

        (1−λ)·relevance − λ·max cosine-to-already-selected

    (Carbonell & Goldstein 1998; the "don't show five near-identical
    results" re-rank every vector search serves through). Returns
    (query, id, rel, mmr_rank), mmr_rank 1..k.

    Inherently sequential over ≤|candidates| items per query →
    applyInPandas per query group (tiny — the candidate list), exactly
    how ``topics.mmr_rerank`` scopes the same loop per topic. Relevance
    and pairwise sims round to 6dp BEFORE the argmax so the greedy path
    is engine-stable (the unrolled SQL oracle replays it step for step);
    ties break on id ascending.
    """
    import numpy as np
    import pandas as pd

    if k < 1 or not 0.0 <= diversity <= 1.0:
        raise ValueError("need k >= 1 and 0 <= diversity <= 1")
    vecs = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("_v"))
    j = cands.select(query_col, id_col, rel_col).join(vecs, id_col)
    w_rel, w_div = 1.0 - diversity, diversity

    def _g(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([rel_col, id_col],
                              ascending=[False, True]).reset_index(drop=True)
        ids = list(pdf[id_col])
        rel = {i: round(float(r), 6)
               for i, r in zip(pdf[id_col], pdf[rel_col])}
        vs = {i: np.asarray(v, dtype=np.float64)
              for i, v in zip(pdf[id_col], pdf["_v"])}
        nrm = {i: float(np.sqrt(np.dot(v, v))) for i, v in vs.items()}

        def sim(a, b):
            return round(float(np.dot(vs[a], vs[b])) / (nrm[a] * nrm[b]), 6)

        selected: list = []
        remaining = list(ids)
        while remaining and len(selected) < k:
            best, best_v = None, None
            for c in remaining:
                ms = max((sim(c, s) for s in selected), default=0.0)
                v = w_rel * rel[c] - w_div * ms
                if best_v is None or v > best_v or (v == best_v and c < best):
                    best, best_v = c, v
            selected.append(best)
            remaining.remove(best)
        rows = [(pdf[query_col].iloc[0], i, rel[i], r + 1)
                for r, i in enumerate(selected)]
        return pd.DataFrame(rows,
                            columns=[query_col, id_col, rel_col, "mmr_rank"])

    schema = (f"{query_col} long, {id_col} long, {rel_col} double, "
              "mmr_rank long")
    return j.groupBy(query_col).applyInPandas(_g, schema)

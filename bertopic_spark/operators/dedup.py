"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. All hashing is md5-based (present in both Spark
and DuckDB with identical output) so every op has a cross-engine oracle;
xxhash64 would be faster JVM-side but is Spark-only — swap via ``hash_expr``
when no oracle is needed.

Scale notes (100 TB):
* exact: one shuffle on the 128-bit digest; trivially skew-free.
* jaccard: shingle self-join is quadratic per shared shingle — production
  path prunes with document-frequency cap on shingles (drop shingles in
  > max_df docs: they generate huge candidate lists but never discriminate).
* minhash-lsh: candidate generation is a groupBy on (band, band_hash) —
  bounded by band width; verification joins only bucket-mates.
* simhash: one narrow pass + one self-join on the 16-bit key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bertopic_spark.tokenizer import with_tokens

# 60-bit hash from the md5 hex prefix — identical in DuckDB via
# CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT).
def md5_long(col, nhex: int = 15):
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dup groups: (keep_id, dup_count) — keep the min id per digest."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_id", "dup_count", "digest")
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3,
             mode: str = "ascii_code") -> DataFrame:
    """Distinct token n-gram shingles per doc: (id, shingle)."""
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    # n-gram shingles via transform over token positions (JVM-side)
    sh = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.slice(F.col("tokens"), 1,
                        F.greatest(F.size("tokens") - (n - 1), F.lit(0))),
                lambda _, i: F.concat_ws(" ", F.slice(F.col("tokens"), i + 1, n)),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


# "auto" heavy-shingle guard: drop shingles with document frequency above
# max(AUTO_MIN_DF, ceil(AUTO_DF_FRAC * n_docs)). The floor keeps small
# corpora exact (no shingle in a 2k-doc test corpus is dropped unless it
# really is boilerplate); the fraction keeps the per-shingle pair blowup
# bounded at any corpus size (a shingle kept by the guard contributes at
# most (frac*N)^2/2 candidate rows — linear in N per unit of frac^2*N).
# Shared verbatim with the DuckDB oracle SQL (entry_queries builds the
# guard predicate from these exact constants).
AUTO_MIN_DF = 256
AUTO_DF_FRAC = 0.005


def _guard_heavy_shingles(sh: DataFrame, id_col: str, max_df) -> DataFrame:
    """Anti-join the shingle relation against its heavy tail.

    ``max_df``: None = no guard (exact; the documented oracle path),
    an int = fixed document-frequency cap, "auto" = the corpus-relative
    cap above. The heavy set is tiny by construction (broadcastable at
    any corpus size), whereas the keep-set is nearly the whole shingle
    vocabulary — hence anti-join against heavy, never semi-join on kept.
    """
    if max_df is None:
        return sh
    dfreq = sh.groupBy("shingle").count()
    if max_df == "auto":
        nd = sh.agg(F.count_distinct(id_col).alias("_nd"))
        heavy = (dfreq.crossJoin(F.broadcast(nd))
                 .filter(F.col("count") >
                         F.greatest(F.lit(AUTO_MIN_DF),
                                    F.ceil(F.lit(AUTO_DF_FRAC) *
                                           F.col("_nd")))))
    else:
        heavy = dfreq.filter(F.col("count") > int(max_df))
    return sh.join(F.broadcast(heavy.select("shingle")), "shingle",
                   "left_anti")


def jaccard_pairs(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                  threshold: float = 0.5, mode: str = "ascii_code",
                  max_df: int | str | None = None) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold: (id_a, id_b, jaccard).

    id_a < id_b. ``max_df`` drops shingles occurring in more than that many
    docs before the self-join (the candidate-explosion guard at scale);
    "auto" applies the corpus-relative cap (``_guard_heavy_shingles``);
    None (the default here) is the exact/oracle path.
    """
    sh = _guard_heavy_shingles(shingles(df, text_col, id_col, n, mode),
                               id_col, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# MinHash permutation constants: h_i(x) = (a_i * x + b_i) mod P, seeded and
# shared verbatim with the DuckDB oracle SQL (entry_queries builds the SQL
# string from these exact values).
MINHASH_P = 2305843009213693951  # 2^61 - 1 (Mersenne prime)


def minhash_params(num_perm: int = 16, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P)) for _ in range(num_perm)]


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_perm: int = 16, seed: int = 42, n: int = 2,
                       mode: str = "ascii_code") -> DataFrame:
    """(id, sig_0..sig_{num_perm-1}) MinHash over n-gram shingle hashes.

    a*h is computed in double precision modular arithmetic? No — to stay
    exact AND cross-engine we keep everything in BIGINT with a reduced
    multiplier: h < 2^60, a < 2^31 ⇒ a*h would overflow, so we use
    (a * (h % 2^31) + b) % P' with P' = 2^31-1; 31-bit minhash values are
    plenty for 16 permutations at corpus scale.
    """
    params = minhash_params(num_perm, seed)
    sh = shingles(df, text_col, id_col, n, mode)
    h = (md5_long(F.col("shingle")) % F.lit(2147483647)).alias("h")
    base = sh.select(id_col, h)
    aggs = []
    for i, (a, b) in enumerate(params):
        a31, b31 = a % 2147483647, b % 2147483647
        aggs.append(F.min((F.col("h") * a31 + b31) % 2147483647).alias(f"sig_{i}"))
    return base.groupBy(id_col).agg(*aggs)


def _bucket_edges(exploded: DataFrame, id_col: str, edge_mode: str,
                  max_bucket: int | None) -> DataFrame:
    """Candidate edges from (id, band, key) bucket membership.

    edge_mode="all": every intra-bucket pair (id_a < id_b) — m²/2 rows per
    m-doc bucket. Correct for pair-level verification, but a 100-TB crawl
    puts 10⁶⁺ boilerplate/license duplicates in ONE bucket → 10¹²⁺ rows
    from a single key. ``max_bucket`` drops buckets larger than the cap
    from the all-pairs output (the dropped buckets are exactly the ones
    star mode should handle).

    edge_mode="star": per (band, key) bucket emit (min_id, member) edges —
    LINEAR in bucket size, same connected components as all-pairs (every
    member links to the bucket representative), so duplicate-cluster
    discovery via union-find/connected-components is unchanged. The scale
    path for candidate generation on heavy-duplicate corpora.

    Both modes return (id_a, id_b, n_bands) with id_a < id_b; n_bands =
    number of bands in which that edge was generated.
    """
    if edge_mode not in ("all", "star"):
        raise ValueError(f"edge_mode must be 'all' or 'star', got {edge_mode!r}")
    if edge_mode == "star":
        reps = exploded.groupBy("band", "key").agg(
            F.min(id_col).alias("id_a"), F.count(F.lit(1)).alias("m"))
        edges = (
            exploded.join(reps.filter(F.col("m") >= 2), ["band", "key"])
            .filter(F.col(id_col) != F.col("id_a"))
            .select("id_a", F.col(id_col).alias("id_b"))
        )
        return edges.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands"))
    if max_bucket is not None:
        sizes = exploded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("m"))
        exploded = exploded.join(
            sizes.filter(F.col("m") <= max_bucket).select("band", "key"),
            ["band", "key"])
    a = exploded.select(F.col(id_col).alias("id_a"), "band", "key")
    b = exploded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      num_perm: int = 16, bands: int = 4, seed: int = 42,
                      n: int = 2, mode: str = "ascii_code",
                      edge_mode: str = "all",
                      max_bucket: int | None = None) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band (rows = num_perm/bands).

    Returns (id_a, id_b, n_bands) with id_a < id_b. Verification (exact
    jaccard on candidates only) is the caller's second step.

    ``edge_mode="star"`` emits per-bucket min-id star edges (linear in
    bucket size — the giant-duplicate-cluster scale path); ``max_bucket``
    caps bucket size in all-pairs mode. See ``_bucket_edges``.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_perm, seed, n, mode)
    exploded = minhash_band_keys(sigs, id_col, num_perm, bands)
    return _bucket_edges(exploded, id_col, edge_mode, max_bucket)


def minhash_band_keys(sigs: DataFrame, id_col: str, num_perm: int = 16,
                      bands: int = 4) -> DataFrame:
    """(id, band, key) LSH bucket membership from a signature relation —
    the persistable generational state of incremental dedup (store THIS,
    bucketed by (band, key), and new batches probe only the buckets they
    hash into)."""
    rows_per_band = num_perm // bands
    band_cols = []
    for bnd in range(bands):
        cols = [F.col(f"sig_{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), F.concat_ws("_", *[c.cast("string") for c in cols]).alias("key"))
        )
    return sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")) \
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_incremental_pairs(old_banded: DataFrame, new_df: DataFrame,
                              text_col: str, id_col: str,
                              num_perm: int = 16, bands: int = 4,
                              seed: int = 42, n: int = 2,
                              mode: str = "ascii_code",
                              edge_mode: str = "all",
                              max_bucket: int | None = None) -> DataFrame:
    """O(delta) near-dup maintenance: candidate pairs TOUCHING a new batch
    — new×new plus new×old — against a persisted generation of LSH bucket
    membership (``minhash_band_keys`` output), never recomparing old×old.
    The incremental analog of ``minhash_lsh_pairs``: running it per batch
    and unioning the edges yields the same connected components as a full
    rebuild over the accumulated corpus.

    Physical shape: only the NEW batch is shingled/hashed; the old state
    is pruned to buckets the new batch hashes into (left_semi on
    (band, key) — with the state bucketed/partitioned on that key this is
    a co-located probe touching a delta-sized fraction of a 100-TB
    index). ``edge_mode="star"`` collapses the new side to one min-id
    representative per bucket before pairing, keeping old×new edges
    LINEAR in bucket size on boilerplate mega-clusters; components are
    unchanged (old members and the batch's members all link through the
    representative).

    Returns (id_a, id_b, n_bands), id_a < id_b, n_bands = shared bands
    that generated the edge (new×new counts its band multiplicity the
    same way the full run does).
    """
    sigs = minhash_signatures(new_df, text_col, id_col, num_perm, seed, n, mode)
    new_banded = minhash_band_keys(sigs, id_col, num_perm, bands)
    nn = _bucket_edges(new_banded, id_col, edge_mode, max_bucket)
    new_side = new_banded
    if edge_mode == "star":
        new_side = new_banded.groupBy("band", "key").agg(
            F.min(id_col).alias(id_col))
    hit = new_side.select("band", "key").distinct()
    old_hit = old_banded.join(hit, ["band", "key"], "left_semi")
    if max_bucket is not None:
        sizes = old_hit.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("_m"))
        old_hit = old_hit.join(
            sizes.filter(F.col("_m") <= max_bucket).select("band", "key"),
            ["band", "key"], "left_semi")
    o = F.col(f"o.{id_col}")
    nw = F.col(f"nw.{id_col}")
    on_edges = (old_hit.alias("o")
                .join(new_side.alias("nw"), ["band", "key"])
                .filter(o != nw)
                .select(F.least(o, nw).alias("id_a"),
                        F.greatest(o, nw).alias("id_b"), "band")
                .groupBy("id_a", "id_b")
                .agg(F.count_distinct("band").cast("long").alias("n_bands")))
    return nn.unionByName(on_edges)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16,
            mode: str = "ascii_code") -> DataFrame:
    """(id, simhash) — tf-weighted sign-sum over md5-derived term bits."""
    toks = with_tokens(df.select(id_col, text_col), text_col, mode)
    terms = (
        toks.select(id_col, F.explode("tokens").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", md5_long(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = terms.groupBy(id_col).agg(*bit_sums)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, text_col: str, id_col: str,
                          bits: int = 48, bands: int = 4,
                          max_hamming: int = 3,
                          mode: str = "ascii_code",
                          edge_mode: str = "all",
                          max_bucket: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) — near-dup pairs by banded SimHash.

    The scale path for simhash dedup: a single B-bit key gives ~N/2^B docs
    per bucket (huge at 10⁹ docs for small B, zero recall for large B).
    Banding splits the B-bit signature into ``bands`` tables of B/bands
    bits; any pair within Hamming distance < bands shares ≥1 band
    (pigeonhole), so candidate generation is ``bands`` groupBys on short
    keys and verification XOR+popcounts only bucket-mates. All JVM
    expressions (shiftright / bitwiseAND / bit_count), no Python.

    ``edge_mode="star"``: per (band, key) bucket emit (min_id, member)
    edges instead of all m² intra-bucket pairs — linear in bucket size,
    same connected components (the giant-duplicate-cluster scale path;
    dup-cluster members are near-identical so star edges pass the same
    hamming verification). ``max_bucket`` caps bucket size in all-pairs
    mode, dropping oversized buckets from the output.
    """
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    if bits > 63:
        raise ValueError("bits must fit a signed 64-bit key (≤ 63)")
    if max_hamming >= bands:
        raise ValueError(
            "banded candidates only guarantee recall for hamming < bands; "
            "raise bands or lower max_hamming")
    if edge_mode not in ("all", "star"):
        raise ValueError(f"edge_mode must be 'all' or 'star', got {edge_mode!r}")
    sig = simhash(df, text_col, id_col, bits, mode)
    width = bits // bands
    mask = (1 << width) - 1
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ]
    exploded = sig.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if edge_mode == "star":
        # min(struct(id, sig)) picks the bucket representative and carries
        # its signature in the same agg — no second join against sig.
        reps = exploded.groupBy("band", "key").agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s"))).alias("r"),
            F.count(F.lit(1)).alias("m"))
        cand = (
            exploded.join(reps.filter(F.col("m") >= 2), ["band", "key"])
            .filter(F.col(id_col) != F.col("r.i"))
            .select(F.col("r.i").alias("id_a"), F.col(id_col).alias("id_b"),
                    F.col("r.s").alias("sig_a"), F.col("simhash").alias("sig_b"))
            .distinct()
        )
    else:
        if max_bucket is not None:
            sizes = exploded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("m"))
            exploded = exploded.join(
                sizes.filter(F.col("m") <= max_bucket).select("band", "key"),
                ["band", "key"])
        a = exploded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"),
                            "band", "key")
        b = exploded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"),
                            "band", "key")
        cand = (
            a.join(b, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sig_a", "sig_b")
            .distinct()
        )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold (brute-force all-pairs;
    the LSH-bucketed variant in similarity.py is the scale path)."""
    from bertopic_spark.operators.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_lsh_pairs(emb: DataFrame, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.95,
                                n_planes: int = 6, n_tables: int = 8,
                                seed: int = 42,
                                max_bucket: int | None = 4096) -> DataFrame:
    """The SCALE path for embedding-cosine near-dup: banded sign-LSH
    candidate generation (pairs colliding in ANY of ``n_tables`` hash
    tables of ``n_planes`` bits) + exact cosine verification ≥ threshold.
    Precision 1 by construction — every emitted pair is exact-verified —
    so output ⊆ ``embedding_neardup_pairs``; recall is the banded-LSH
    collision probability 1−(1−p^n_planes)^n_tables with
    p = 1−θ/π (tests pin it against the brute oracle on a bounded slice).

    Plan shape at 100 TB: two narrow shuffles to bucket, a per-
    (table, bucket) co-partitioned self-join bounded by ``max_bucket``
    (oversized buckets — near-constant vectors hashing together — are
    dropped, mirroring the heavy-shingle guard), and exact cosine only on
    candidates. No crossJoin anywhere.
    """
    from bertopic_spark.operators.similarity import (
        cosine_expr, random_hyperplane_buckets_multi)

    b = random_hyperplane_buckets_multi(emb, n_planes, n_tables, seed,
                                        id_col, vec_col)
    if max_bucket is not None:
        # window over the join key, not a separate size relation: the
        # guard then costs no extra scan of the bucketing subtree, and
        # its shuffle pre-partitions both legs of the pair self-join
        from pyspark.sql import Window

        w = Window.partitionBy("table", "bucket")
        b = (b.withColumn("_m", F.count(F.lit(1)).over(w))
             .filter(F.col("_m") <= int(max_bucket)).drop("_m"))
    l = b.select("table", "bucket", F.col(id_col).alias("id_a"))
    r = b.select("table", "bucket", F.col(id_col).alias("id_b"))
    cand = (l.join(r, ["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    va = emb.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).cast("array<double>").alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).cast("array<double>").alias("vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos")))


def _release_local_checkpoint(df: DataFrame) -> None:
    """Eagerly free a ``localCheckpoint`` generation's storage blocks.

    ``DataFrame.unpersist`` goes through the CacheManager and does NOT
    release checkpoint RDDs (those are persisted directly on the RDD), so an
    iterative loop would otherwise hold every generation until the async
    ContextCleaner notices the dropped reference. Reaching the underlying
    ``LogicalRDD`` keeps storage bounded at one generation deterministically;
    safe because callers only release a generation after the NEXT one is
    eagerly materialized (nothing recomputes the truncated lineage).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        df.unpersist()  # best effort; ContextCleaner will finish the job


def dedup_components(edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                     max_iter: int = 25) -> DataFrame:
    """Connected components over candidate-pair edges — the final step of
    near-dup dedup (pairs from ``minhash_lsh_pairs`` / ``simhash_neardup_
    pairs`` / ``jaccard``): (doc_id, component) with component = min doc id
    reachable, so "keep one doc per component" is a trivial filter.

    Distributed min-label propagation with pointer jumping: each round every
    node takes the min label over {self} ∪ neighbors, then compresses by one
    label-of-label jump, halving the effective diameter — O(log d) rounds.
    Star-mode edges (``_bucket_edges``) bound intra-bucket diameter at 2, so
    real dup clusters converge in 2-3 rounds. Each round is two shuffles
    keyed by node / label; no component is ever materialized inside a
    single task, so 10⁷-doc boilerplate clusters are fine at 100 TB.
    Lineage is truncated per round with an eager localCheckpoint (on a
    cluster: checkpoint to the shuffle-tracking store) and the previous
    generation's blocks are released.
    """
    # persist the symmetric edge relation: every propagation round joins
    # against it (plus the initial node set), and the edges are usually
    # the EXPENSIVE end of a pipeline (LSH buckets, salted pair cosines)
    # — without the cache each round recomputes that upstream work
    # (measured: semdedup at bench scale spent ~25s of 31s recomputing
    # its pair join across the rounds).
    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionAll(
        edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    sym = sym.persist()
    lab = (sym.select(F.col("src").alias("node")).distinct()
           .select("node", F.col("node").alias("label")))
    prev_ckpt = None
    for _ in range(max_iter):
        nbr = (sym.join(lab.withColumnRenamed("node", "dst"), "dst")
               .groupBy("src").agg(F.min("label").alias("nbr_label"))
               .withColumnRenamed("src", "node"))
        stepped = (lab.join(nbr, "node", "left")
                   .select("node",
                           F.least("label", F.coalesce("nbr_label", "label"))
                           .alias("label")))
        jumped = (stepped.join(
            stepped.select(F.col("node").alias("label"),
                           F.col("label").alias("label2")),
            "label", "left")
            .select("node",
                    F.least("label", F.coalesce("label2", "label"))
                    .alias("label")))
        new = jumped.localCheckpoint(eager=True)
        changed = (new.join(lab.withColumnRenamed("label", "old"), "node")
                   .filter(F.col("label") != F.col("old")).count())
        if prev_ckpt is not None:
            _release_local_checkpoint(prev_ckpt)
        prev_ckpt, lab = new, new
        if changed == 0:
            break
    sym.unpersist()
    return lab.select(F.col("node").alias("doc_id"),
                      F.col("label").alias("component"))


def frequent_line_removal(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", sep: str = "\n",
                          min_count: int = 3) -> DataFrame:
    """C4-style corpus-wide duplicate-line removal: drop every line that
    occurs at least ``min_count`` times ACROSS the corpus (boilerplate,
    license headers, navigation chrome), reassemble the survivors in
    original order. Returns every input doc:
    (id, text_clean, n_lines_kept, n_lines_removed).

    One explode + one count keyed by the line string (map-side partial agg
    collapses heavy lines like '' to one row per partition before the
    shuffle, so boilerplate skew never concentrates), an anti-join of lines
    against the frequent set, and one per-doc reassembly agg. A doc's lines
    must fit in one task — true by the same bound that lets the doc be a
    table row at all. ``sep`` is a literal string (regex-quoted for split,
    used verbatim for the rejoin).
    """
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1))
        .alias("ln_pos", "line"))
    freq = (lines.groupBy("line").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count))
    kept = lines.join(freq.select("line"), "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("ln_pos", "line"))),
                        lambda s: s["line"]), sep).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"))
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), _re.escape(sep), -1)).cast("long")
        .alias("n_lines"))
    return (totals.join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.coalesce("n_lines_kept", F.lit(0)).cast("long")
                    .alias("n_lines_kept"),
                    (F.col("n_lines") - F.coalesce("n_lines_kept", F.lit(0)))
                    .cast("long").alias("n_lines_removed")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None,
                  mode: str = "ascii_code",
                  broadcast_bench: bool = True) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any token
    n-gram with a held-out benchmark table (the standard pre-training
    hygiene step). Returns (id, n_shared) — distinct shared shingles —
    for contaminated docs only.

    The benchmark shingle set is tiny relative to the corpus (benchmarks
    are thousands of docs), so it broadcasts and the corpus streams through
    one semi-shaped join; set ``broadcast_bench=False`` for an oversized
    benchmark and let AQE pick the strategy.
    """
    d = shingles(docs, text_col, id_col, n, mode)
    b = (shingles(benchmark, bench_text_col or text_col, id_col, n, mode)
         .select("shingle").distinct())
    if broadcast_bench:
        b = F.broadcast(b)
    return (d.join(b, "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 8,
                    mode: str = "ascii_code", min_docs: int = 2) -> DataFrame:
    """Repeated k-token windows shared across documents — the signal behind
    exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): (window_hash, n_docs,
    n_occurrences, first_doc_id) for every k-token window appearing in
    ≥ ``min_docs`` distinct documents.

    Windows are md5-hashed BEFORE the explode so the shuffle carries
    fixed-width digests, never window strings; the token array is bound
    once as a HOF lambda var (CollapseProject would otherwise inline the
    tokenizer regexp into every window slice). One explode + one
    groupBy(hash) — linear in corpus token count, skew-free (a window hash
    key's group is the duplicate cluster itself). At production scale swap
    md5 for xxhash64 (8-byte); md5 is kept for the cross-engine oracle.
    """
    from bertopic_spark.tokenizer import tokens_expr

    def wins(ts):
        cnt = F.size(ts) - (k - 1)
        seq = (F.when(cnt >= 1, F.sequence(F.lit(1), cnt))
               .otherwise(F.array().cast("array<int>")))
        return F.transform(
            seq, lambda i: F.md5(F.concat_ws(" ", F.slice(ts, i, k))))

    bound = F.get(
        F.transform(F.array(tokens_expr(F.col(text_col), mode)), wins), 0)
    w = df.select(F.col(id_col), F.explode(bound).alias("window_hash"))
    return (w.groupBy("window_hash")
            .agg(F.count_distinct(F.col(id_col)).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min(id_col).alias("first_doc_id"))
            .filter(F.col("n_docs") >= F.lit(min_docs)))


def dedup_canonical(components: DataFrame, quality: DataFrame,
                    quality_col: str, id_col: str = "doc_id",
                    keep_singletons: bool = False) -> DataFrame:
    """Canonical-document selection per duplicate cluster — the keep/drop
    decision that ends a near-dup pipeline: from (doc_id, component) and a
    per-doc quality relation, return one row per cluster
    (component, keep_id, keep_quality, n_members) where keep_id is the
    member with the HIGHEST quality (tie → lowest doc_id, so the choice is
    deterministic and stable across reruns / cluster sizes). Docs never
    entering ``components`` (no candidate edge) are implicit singletons and
    are kept by definition; ``keep_singletons`` adds them as 1-member rows
    (component = own id) when the caller wants the full keep-list.

    Plan: one equi-join components⋈quality on the doc id (co-partitioned,
    no broadcast needed — both sides can be corpus-sized), one
    groupBy(component) whose argmax rides the agg as max(struct(quality,
    −id)) — no window over the full relation, no per-cluster collect, so a
    10⁷-member boilerplate cluster costs its member count, nothing more.
    """
    q = quality.select(F.col(id_col), F.col(quality_col).alias("_q"))
    joined = components.join(q, id_col)
    out = (joined.groupBy("component")
           .agg(F.max(F.struct(F.col("_q").alias("q"),
                               (-F.col(id_col)).alias("nid"))).alias("_b"),
                F.count(F.lit(1)).alias("n_members"))
           .select("component",
                   (-F.col("_b.nid")).alias("keep_id"),
                   F.col("_b.q").alias("keep_quality"),
                   "n_members"))
    if keep_singletons:
        singles = (q.join(components.select(id_col), id_col, "left_anti")
                   .select(F.col(id_col).alias("component"),
                           F.col(id_col).alias("keep_id"),
                           F.col("_q").alias("keep_quality"),
                           F.lit(1).cast("long").alias("n_members")))
        out = out.unionByName(singles)
    return out


def semdedup(emb: DataFrame, nlist: int = 8, tau: float = 0.95,
             iters: int = 0, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding clustering — k-means-cluster the embedding
    space (``similarity.ivf_centroids``, deterministic seeds, optional
    Lloyd iterations), connect WITHIN-CLUSTER pairs whose cosine exceeds
    ``tau``, take connected components as duplicate groups, and keep one
    member per group: the paper's rule — the member with the LOWEST
    cosine to its cluster centroid (the least prototypical example; tie
    → lowest id). Returns (component, keep_id, n_members).

    Scale shape: the pairwise stage is per-cluster and the join is
    co-partitioned on list_id, so cost is Σ m_c² over cluster sizes —
    the paper's own knob: nlist ∝ N/target_cluster_size bounds m_c
    (at 100 TB that means 10⁵-10⁶ lists, each list one task, never a
    global cross join). Components via the same pointer-jumping
    ``dedup_components`` as the lexical paths.
    """
    from bertopic_spark.operators.similarity import (cosine_expr,
                                                     ivf_assign,
                                                     ivf_centroids)

    if not 0.0 < tau <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    cents = ivf_centroids(emb, nlist, iters, id_col, vec_col)
    assigned = ivf_assign(base, cents, id_col)
    from bertopic_spark.operators.similarity import dot_expr, norm_expr

    # unit-normalize ONCE: the pair stage then pays a single dot HOF per
    # pair instead of dot + two norm recomputations (3x less pair work;
    # the m² pair count, not the per-pair cost, is what nlist bounds)
    withv = base.join(assigned, id_col).withColumn(
        "v", F.transform(F.col("v"), lambda x: x / norm_expr(F.col("v"))))
    # SALTED pair join: list_id alone has only nlist distinct keys, so a
    # plain co-partitioned join caps parallelism at nlist tasks (measured
    # 8 tasks on 32 cores = 4x wall blowup at bench scale). The a-side
    # takes salt = hash(id) % S, the b-side replicates S ways (S·N rows of
    # pointers — trivial next to the m² pair work); join on (list_id,
    # salt) spreads each list's pair block over S tasks with identical
    # output.
    n_salt = 8
    a = withv.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                     "list_id",
                     F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
                     .cast("int").alias("_salt"))
    b = withv.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                     "list_id",
                     F.explode(F.array(*[F.lit(s) for s in range(n_salt)]))
                     .alias("_salt"))
    pairs = (a.join(b, ["list_id", "_salt"])
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(dot_expr(F.col("va"), F.col("vb")) > tau)
             .select("id_a", "id_b"))
    comp = dedup_components(pairs, "id_a", "id_b").withColumnRenamed(
        "doc_id", id_col)
    # paper keep-rule: LOWEST cosine-to-centroid wins -> quality = -cos
    csim = (withv.join(F.broadcast(cents), "list_id")
            .select(F.col(id_col),
                    (-cosine_expr(F.col("v"), F.col("cv"))).alias("neg_csim")))
    return (dedup_canonical(comp, csim, "neg_csim", id_col)
            .select("component", "keep_id", "n_members"))


def containment_pairs(df: DataFrame, text_col: str, id_col: str, n: int = 3,
                      threshold: float = 0.8, mode: str = "ascii_code",
                      max_df: int | str | None = "auto") -> DataFrame:
    """One-sided shingle containment C(A→B) = |S(A)∩S(B)| / |S(A)| —
    Broder's containment, the asymmetric companion of resemblance
    (Jaccard): detects quotes, excerpts and subset-duplicates that
    Jaccard misses when the container is much larger than the contained
    document. Emits DIRECTED rows (contained_id, container_id,
    containment >= threshold); a doc pair can appear in both directions.

    Same single shingle self-join as ``jaccard_pairs`` (the intersection
    is computed once per unordered pair, both directions derived from
    it), same broadcast anti-join guard on heavy shingles — and here the
    guard DEFAULTS ON ("auto"): with small n (quotes need n=2..3),
    stop-shingles put a visible fraction of any code corpus into a
    handful of keys, and an unguarded self-join is m² per heavy shingle
    — the one plan that dies at 100×. Pass ``max_df=None`` explicitly
    for the exact small-corpus/oracle path.

    .. versionchanged:: round 4
       The default flipped from ``max_df=None`` (exact) to ``"auto"``.
       Callers on corpora where some shingle's df exceeds the auto floor
       (max(256, 0.5% of docs)) now get guarded — slightly lossy —
       results by default; pass ``max_df=None`` to restore the previous
       exact behavior.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = _guard_heavy_shingles(shingles(df, text_col, id_col, n, mode),
                               id_col, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    both = (inter
            .join(sizes.select(F.col(id_col).alias("id_a"),
                               F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col(id_col).alias("id_b"),
                               F.col("sz").alias("sz_b")), "id_b"))
    fwd = both.select(F.col("id_a").alias("contained_id"),
                      F.col("id_b").alias("container_id"),
                      (F.col("inter") / F.col("sz_a")).alias("containment"))
    rev = both.select(F.col("id_b").alias("contained_id"),
                      F.col("id_a").alias("container_id"),
                      (F.col("inter") / F.col("sz_b")).alias("containment"))
    return (fwd.unionByName(rev)
            .filter(F.col("containment") >= threshold)
            .select("contained_id", "container_id",
                    F.round("containment", 6).alias("containment")))

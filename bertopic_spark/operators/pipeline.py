"""End-to-end training-data preparation: the composition a 100-TB corpus
actually runs before tokenizer training — quality filter → exact dedup →
deterministic shard packing — expressed as ONE declarative plan so Catalyst
fuses the stages (the filter's tokenize pass and the dedup digest share the
same corpus scan; nothing materializes between stages unless the caller
checkpoints).

Each stage is independently gate-checked (gopher_filter, dedup_exact,
pack_shards); this module asserts the composition semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bertopic_spark.operators.dedup import exact_dedup
from bertopic_spark.operators.textstats import gopher_filter, pack_shards


def training_shards(df: DataFrame, budget: int,
                    text_col: str = "text", id_col: str = "doc_id",
                    mode: str = "ascii_code",
                    thresholds: dict | None = None) -> DataFrame:
    """(id, n_tokens, shard_id) over the cleaned corpus.

    Stages: (1) Gopher keep verdicts drop low-quality docs; (2) exact
    dedup keeps the min-id representative per content digest — computed
    over the SURVIVORS, so a low-quality copy never shadows a kept one;
    (3) token-budget shard packing in doc-id order. Shard ids are dense
    from 0 over the survivors.

    Physical shape: stage order matters at scale — the quality filter is
    the cheapest (one scan) and runs first so the dedup shuffle sees only
    survivors; dedup shuffles one 16-byte digest per doc; packing is the
    distributed prefix sum. No stage collects anything wider than the
    per-partition offset map.
    """
    kept = (df.join(gopher_filter(df, text_col, id_col, mode, thresholds)
                    .filter(F.col("keep")).select(id_col), id_col)
            .select(id_col, text_col))
    reps = exact_dedup(kept, text_col, id_col).select(
        F.col("keep_id").alias(id_col))
    survivors = kept.join(reps, id_col)
    return pack_shards(survivors, budget, order_cols=[id_col],
                       text_col=text_col, id_col=id_col, mode=mode)


def domain_mix_plan(df: DataFrame, domain_col: str, size_col: str,
                    budget: float, temperature: float = 1.0) -> DataFrame:
    """Temperature-reweighted domain mixing plan — how much of each domain
    (language, source, crawl) a training run should keep to hit a token
    ``budget``: (domain, n_docs, n_tokens, share, p, target_tokens) with

        share_d = t_d / Σt,   p_d = share_d^T / Σ_d share_d^T,
        target_d = min(p_d · budget, t_d)

    T(=``temperature``) < 1 upweights small domains (the multilingual-mix
    trick); T = 1 keeps natural proportions; T = 0 is uniform. Targets are
    capped at the domain's own size — the plan never asks for more data
    than exists (Σ target then lands under budget; re-run on the residual
    if exact totals matter). One groupBy(domain) agg — the plan relation
    is |domains|-sized, never data-sized.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(size_col).cast("long")).alias("n_tokens"))
    tot = per.agg(F.sum("n_tokens").alias("t_all"))
    sh = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("t_all"))
    pw = sh.withColumn("pw", F.pow(F.col("share"),
                                   F.lit(float(temperature))))
    z = pw.agg(F.sum("pw").alias("z"))
    return (pw.crossJoin(F.broadcast(z))
            .withColumn("p", F.col("pw") / F.col("z"))
            .withColumn("target_tokens",
                        F.least(F.col("p") * F.lit(float(budget)),
                                F.col("n_tokens").cast("double")))
            .select("domain", "n_docs", "n_tokens", "share", "p",
                    "target_tokens"))


def domain_mix_sample(df: DataFrame, plan: DataFrame, domain_col: str,
                      size_col: str, id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Deterministic document selection realizing a ``domain_mix_plan``:
    per domain, docs are ordered by md5(seed, id) (the engine's standard
    seeded shuffle — reproducible in SQL, stable across partitionings and
    cluster sizes) and kept while the INCLUSIVE running token sum stays
    ≤ the domain's target. Returns the kept (id, domain, n_tokens) rows.

    Plan: one broadcast join of the |domains|-sized plan onto the corpus,
    one window per domain (cumsum over the md5 order). The window
    partitions by domain — a single giant domain serializes into one task,
    the same bound every per-domain top-k in the engine has; re-shard such
    a domain upstream if it dominates.
    """
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col))
    sized = (df.select(F.col(id_col), F.col(domain_col),
                       F.col(size_col).cast("long").alias("n_tokens"))
             .withColumn("_cum", F.sum("n_tokens").over(w)))
    pl = plan.select(F.col("domain").alias(domain_col), "target_tokens")
    return (sized.join(F.broadcast(pl), domain_col)
            .filter(F.col("_cum") <= F.col("target_tokens"))
            .select(id_col, domain_col, "n_tokens"))


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def hashed_ngram_buckets(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 512,
                         mode: str = "ascii_code",
                         seed: int = 13) -> DataFrame:
    """DSIR's hashed bag-of-ngrams features: unigrams + bigrams hashed
    into ``n_buckets`` md5 buckets — (id, bucket, cnt). The hash is the
    engine's standard md5-mod (cross-engine, partition-invariant), so the
    whole feature extraction replays in SQL. One tokenize pass, one
    explode, one (id, bucket) agg whose width is ≤ n_buckets per doc."""
    from bertopic_spark.tokenizer import with_tokens

    toks = with_tokens(df, text_col, mode).select(id_col, "tokens")
    grams = F.concat(
        F.col("tokens"),
        F.when(F.size("tokens") >= 2, F.zip_with(
            F.slice(F.col("tokens"), 1, F.size("tokens") - 1),
            F.slice(F.col("tokens"), 2, F.size("tokens") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b)))
        .otherwise(F.array()))
    g = toks.select(id_col, F.explode(grams).alias("gram"))
    bucket = F.pmod(F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col("gram"))), 1, 15),
        16, 10).cast("long"), F.lit(int(n_buckets)))
    return (g.select(id_col, bucket.alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def dsir_logweights(raw: DataFrame, target: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 512, alpha: float = 1.0,
                    mode: str = "ascii_code", seed: int = 13) -> DataFrame:
    """Per-document importance log-weights log(p̂_target/q̂_raw) under
    hashed-ngram bag models (DSIR, Xie et al. 2023 §3):

        log w(x) = Σ_b c_b(x) · [ ln p̂(b) − ln q̂(b) ]
        p̂(b) = (cnt_target(b) + α) / (T + α·B)     (Lidstone)

    Returns (id, n_grams, logw) for every raw doc (docs with zero grams
    get logw = 0 — the weight of an uninformative example).

    Physical shape: the two bucket models come from ONE conditional agg
    each over the hashed features (B-sized relations); the per-doc fold
    is a broadcast join of the B-sized log-ratio table onto the doc
    features, then one groupBy(id). Nothing vocabulary- or corpus-wide
    ever shuffles except the doc-feature relation itself."""
    fr = hashed_ngram_buckets(raw, text_col, id_col, n_buckets, mode, seed)
    ft = hashed_ngram_buckets(target, text_col, id_col, n_buckets, mode,
                              seed)
    B = int(n_buckets)
    qm = fr.groupBy("bucket").agg(F.sum("cnt").alias("qc"))
    pm = ft.groupBy("bucket").agg(F.sum("cnt").alias("pc"))
    qt = qm.agg(F.sum("qc").alias("qt"))
    pt = pm.agg(F.sum("pc").alias("pt"))
    ratio = (qm.join(pm, "bucket", "full_outer")
             .crossJoin(F.broadcast(qt)).crossJoin(F.broadcast(pt))
             .select("bucket",
                     (F.log((F.coalesce(F.col("pc"), F.lit(0))
                             + F.lit(float(alpha)))
                            / (F.col("pt") + F.lit(float(alpha * B))))
                      - F.log((F.coalesce(F.col("qc"), F.lit(0))
                               + F.lit(float(alpha)))
                              / (F.col("qt") + F.lit(float(alpha * B)))))
                     .alias("lr")))
    per = (fr.join(F.broadcast(ratio), "bucket")
           .groupBy(id_col)
           .agg(F.sum("cnt").cast("long").alias("n_grams"),
                F.sum(F.col("cnt") * F.col("lr")).alias("logw")))
    ids = raw.select(id_col).distinct()
    return (ids.join(per, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                    F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw")))


def dsir_sample(weights: DataFrame, n: int, id_col: str = "doc_id",
                seed: int = 29) -> DataFrame:
    """Gumbel top-n resampling — EXACTLY sampling n docs without
    replacement with probability ∝ softmax(logw) (Vieira 2014): rank by
    logw + g(id) where g = −ln(−ln u) and u is the md5 uniform nudged to
    (0,1). Deterministic, partition-invariant, SQL-replayable. The global
    top-n is sort+limit — TakeOrderedAndProject, never a one-partition
    window."""
    u = ((F.conv(F.substring(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))),
        1, 15), 16, 10).cast("double") + F.lit(0.5))
        / F.lit(float(16 ** 15)))
    key = F.col("logw") - F.log(-F.log(u))
    ranked = (weights.withColumn("key", key)
              .orderBy(F.desc("key"), F.asc(id_col)).limit(int(n)))
    w = Window.orderBy(F.desc("key"), F.asc(id_col))
    return ranked.withColumn("rank", F.row_number().over(w))


def unimax_plan(df: DataFrame, domain_col: str, budget: int,
                max_epochs: float = 1.0) -> list:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling"): distribute a doc ``budget``
    across domains as uniformly as possible, capping each domain at
    ``max_epochs`` passes over its own data — the waterfilling

        alloc_d = min(cap_d, λ),  cap_d = ⌊n_d · max_epochs⌋,
        λ such that Σ alloc = min(budget, Σ cap)

    in EXACT integer arithmetic (λ* = integer water level, the remainder
    distributed +1 to uncapped domains in (cap, domain) order), so the
    SQL oracle replays it bit-for-bit. Returns
    [(domain, n_docs, cap, alloc)] sorted by (cap, domain) — computed on
    the driver from the |domains|-sized agg (one groupBy; the plan is
    never data-sized).
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    rows = (df.groupBy(F.col(domain_col).alias("domain"))
            .agg(F.count(F.lit(1)).alias("n")).collect())
    sizes = sorted(((r["domain"], int(r["n"])) for r in rows),
                   key=lambda t: (int(t[1] * max_epochs), t[0]))
    caps = [int(n * max_epochs) for _, n in sizes]
    total_cap = sum(caps)
    if budget >= total_cap:
        return [(d, n, c, c) for (d, n), c in zip(sizes, caps)]
    m = len(sizes)
    alloc = [0] * m
    remaining, k = budget, m
    for i, c in enumerate(caps):
        share = remaining // k
        if c <= share:
            alloc[i] = c          # capped: takes everything it may
            remaining -= c
            k -= 1
        else:
            lam = remaining // k  # uncapped tail: integer water level
            leftover = remaining - lam * k
            for j in range(i, m):
                alloc[j] = lam + (1 if j - i < leftover else 0)
            break
    return [(d, n, c, a) for (d, n), c, a in zip(sizes, caps, alloc)]


def unimax_select(df: DataFrame, domain_col: str, budget: int,
                  max_epochs: float = 1.0, id_col: str = "doc_id",
                  seed: int = 42) -> DataFrame:
    """UniMax selection: materialize the ``unimax_plan`` allocation as
    (id, domain, n_copies) with Σ n_copies per domain = alloc_d — every
    domain doc repeats ⌊alloc/n⌋ times and the first alloc mod n docs by
    md5(seed‖id) rank repeat once more (md5 exists in both engines, so
    the oracle reproduces the exact pick). Docs with 0 copies are
    dropped. One groupBy for the plan + one per-domain rank window; the
    plan joins back as a broadcast literal."""
    plan = unimax_plan(df, domain_col, budget, max_epochs)
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        [(d, n, a) for d, n, _, a in plan],
        "domain string, n_docs long, alloc long")
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat_ws("_", F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col))
    ranked = df.select(F.col(id_col), F.col(domain_col)) \
        .withColumn("_r", F.row_number().over(w))
    out = (ranked.join(F.broadcast(pdf),
                       ranked[domain_col] == pdf["domain"])
           .select(F.col(id_col), F.col("domain"),
                   (F.floor(F.col("alloc") / F.col("n_docs")) +
                    F.when(F.col("_r") <= F.col("alloc") % F.col("n_docs"),
                           1).otherwise(0)).cast("long").alias("n_copies")))
    return out.filter(F.col("n_copies") > 0)


def frequent_item_pairs(df, basket_col: str, item_col: str,
                        min_support: int = 2,
                        max_basket: int | None = 256):
    """ES ``frequent_item_sets`` at size 2 (the market-basket staple,
    exact): pairs of DISTINCT items co-occurring in the same basket,
    with support = number of baskets containing both. Returns
    (item_a, item_b, support), item_a < item_b, support >= min_support.

    Scale shape: the pair join is per-basket and quadratic in basket
    size — ``max_basket`` drops baskets with more distinct items than
    the cap BEFORE pairing (a crawler session touching 10^5 pages
    contributes C(10^5, 2) candidate rows but no analytic value; ES's
    own implementation samples such baskets). The join is co-partitioned
    on the basket key; support counting is one groupBy on the pair.
    """
    from pyspark.sql import functions as F

    b = df.select(F.col(basket_col).alias("_b"),
                  F.col(item_col).alias("_i")).distinct()
    if max_basket is not None:
        big = (b.groupBy("_b").count()
               .filter(F.col("count") > int(max_basket)).select("_b"))
        b = b.join(F.broadcast(big), "_b", "left_anti")
    l = b.select("_b", F.col("_i").alias("item_a"))
    r = b.select("_b", F.col("_i").alias("item_b"))
    return (l.join(r, "_b")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .filter(F.col("support") >= int(min_support)))
